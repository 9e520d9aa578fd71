"""LLM answer-list parsing kernels.

Pure functions (no Ray, no I/O) reproducing the observable semantics of the
reference answer parser — ``AnswerMapping`` in reference ``utils.py:60-153`` —
including its quirks, because the 882-row results-CSV replay test pins them:

* numbered-list item extraction keeps a leading ``")"`` for ``1)``-style items
  (the digit-stripper only consumes digits and ``.``, ``utils.py:72-75``);
* the single-line fallback requires the character ``"1"`` somewhere in the
  output (``utils.py:114``) and uses a *substring* ``"answer"`` check, unlike
  the multi-line path's exact ``"answer:"`` comparison (``utils.py:117``);
* a 2-field item ``entity | X`` treats ``X`` as a True/False verification
  status when it lower-strips to one of {"true","false"}; otherwise ``X`` is
  the explanation and the status defaults to "true" (``utils.py:130-136``);
* only status=="true" items survive — this is PromptNER's built-in per-entity
  yes/no verification (CoT T/F filtering);
* an item with *no* separator contributes an entity but no typestring, so the
  two returned lists can have different lengths (the misalignment is handled
  downstream by the span aligner's compat mode).
"""

from __future__ import annotations

import re

_NUMBERED_ITEM_RE = re.compile(r"\d+[.)]+ *")
_NUMBER_SPLIT_RE = re.compile(r"\d+[.)]")


def numbered_list_items(output: str) -> list[str]:
    """Extract items from a numbered-list LLM response.

    Mirrors ``AnswerMapping.get_numbered_list_items`` (reference
    ``utils.py:61-87``).  Multi-line responses: keep lines matching
    ``\\d+[.)]+ *`` and strip their leading digits/dots.  Single-line
    responses: split on the number pattern.
    """
    items: list[str] = []
    if "\n" in output:
        for line in output.split("\n"):
            c = line.strip()
            if c.lower().strip() in ("", "answer:"):
                continue
            if _NUMBERED_ITEM_RE.match(c):
                # Strip the leading enumeration: digits and '.' only — a ')'
                # stops the scan and is retained (reference utils.py:72-75).
                pos = 0
                while c[pos].isnumeric() or c[pos] == ".":
                    pos += 1
                items.append(c[pos:].strip())
            # Non-matching non-empty lines are dropped (reference prints a
            # warning and ignores them).
    else:
        for part in _NUMBER_SPLIT_RE.split(output):
            c = part.strip()
            if c.lower().strip() in ("", "answer:"):
                continue
            items.append(c)
    return items


def true_or_false(output: str, default: bool = True) -> bool:
    """Map free-text to a boolean (reference ``utils.py:89-105``).

    True iff a yes-marker is present without a no-marker; False for the
    converse; ``default`` when neither or both appear.
    """
    text = output.lower()
    yes = "yes " in text or "yes." in text or "true" in text
    no = "no " in text or "no." in text or "false" in text
    if yes and not no:
        return True
    if no and not yes:
        return False
    return default


def parse_answer_list(
    output: str,
    separator: str = "|",
    true_only: bool = True,
    identify_types: bool = True,
) -> tuple[list[str], list[str]] | list[str]:
    """Parse a raw LLM response into (entities, typestrings).

    Mirrors ``AnswerMapping.exemplar_format_list`` (reference
    ``utils.py:107-153``).  Entities come back lowercased and stripped;
    typestrings are the kept explanations (free text usually ending in
    ``(TYPE)``).  With ``identify_types=False`` only the entity list is
    returned.
    """
    if "\n" in output:
        listed = numbered_list_items(output)
    else:
        listed = []
        if "1" in output:
            for part in _NUMBER_SPLIT_RE.split(output):
                item = part.strip()
                if item.lower() == "" or "answer" in item.lower():
                    continue
                listed.append(item)

    entities: list[str] = []
    typestrings: list[str] = []
    for option in listed:
        if separator not in option:
            entities.append(option.strip().lower())
            continue
        fields = option.split(separator)
        explanation: str | None = None
        if len(fields) == 1:  # unreachable given the guard; kept for parity
            continue
        if len(fields) == 2:
            entity, second = fields
            if second.strip().lower() in ("true", "false"):
                status = second
            else:
                status = "true"
                explanation = second
        elif len(fields) == 3:
            entity, status, explanation = fields
        else:
            # >3 fields: keep the first two, drop the rest (utils.py:139-141).
            entity, status = fields[0], fields[1]
        if status.strip().lower() == "true" or not true_only:
            if explanation is not None:
                typestrings.append(explanation.strip())
            entities.append(entity.strip().lower())
        # status == "false" items are dropped: per-entity verification.

    if not identify_types:
        return entities
    return entities, typestrings
