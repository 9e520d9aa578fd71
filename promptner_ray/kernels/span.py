"""BIO span alignment: map parsed (entity, typestring) lists onto tokens.

Reproduces ``Algorithm.parse_span`` + the nth-occurrence finders (reference
``algorithms.py:72-131``, ``utils.py:8-36``).  Two modes:

* ``bug_compat=True`` — byte-exact replay of the reference, including its
  failure modes, pinned by the results-CSV conformance test:
    - ``find_nth_list_subset`` returns −1 when the phrase occurs MORE times
      than the occurrence sought; the caller then writes ``span[-1]`` (the
      LAST token gets the B- tag, ``algorithms.py:121-124``);
    - when the phrase occurs FEWER times than sought, ``found[n-1]`` raises
      ``IndexError``; likewise a typestring list shorter than the answer list
      raises ``IndexError`` — the reference eval loop drops the whole row
      (``run.py:43-44``), so compat mode lets these propagate;
    - ``find_nth_list`` may raise ``ValueError`` when occurrences run out.
* ``bug_compat=False`` — engine mode: same matching semantics, but unresolvable
  answers are skipped instead of corrupting the tag sequence or raising; used
  by the KG pipeline, where dropping one bad answer must not drop the document.

FewNERD-style types (containing ``-``) are written as bare tags with no B-/I-
prefix (``algorithms.py:107-110,121-129``).
"""

from __future__ import annotations

SPLIT_TOKENS = ("'s", ":")


def find_nth_list(haystack: list[str], needle: str, n: int) -> int:
    """Index of the n-th (1-based) occurrence of ``needle`` in ``haystack``.

    Raises ``ValueError`` if there are fewer than ``n`` occurrences
    (reference ``utils.py:15-20``).
    """
    start = haystack.index(needle)
    while start >= 0 and n > 1:
        start = haystack.index(needle, start + 1)
        n -= 1
    return start


def find_nth_list_subset(haystack: list[str], needle: str, n: int) -> int:
    """Start index of the n-th occurrence of the multi-word phrase ``needle``.

    Reference ``utils.py:22-36`` semantics: collect every start index whose
    token window space-joins to ``needle``; if MORE matches than ``n`` exist,
    return −1; otherwise return ``found[n-1]`` (IndexError when fewer).
    """
    if n < 0:
        return -1
    if n == 0:
        n = 1
    width = len(needle.split(" "))
    found = [
        i
        for i in range(len(haystack))
        if " ".join(haystack[i : i + width]) == needle
    ]
    if len(found) > n:
        return -1
    return found[n - 1]


def _respace(text: str) -> str:
    """Insert a space before each of SPLIT_TOKENS (``algorithms.py:90-92``)."""
    for tok in SPLIT_TOKENS:
        text = (" " + tok).join(text.split(tok))
    return text


def _extract_type(typestring: str) -> str | None:
    """Substring between the first "(" and the first ")" — else None, and the
    answer is dropped from alignment (reference ``algorithms.py:85-89``)."""
    if "(" in typestring and ")" in typestring:
        return typestring[typestring.find("(") + 1 : typestring.find(")")]
    return None


def align_spans(
    answers: list[str],
    typestrings: list[str],
    para: str,
    true_tokens: list[str] | None = None,
    bug_compat: bool = False,
) -> list[str]:
    """Align parsed answers onto the paragraph's tokens as BIO tags.

    ``para`` is the original sentence; tokens are ``para.split(" ")`` unless
    ``true_tokens`` is given (tweet-style data where tokens contain spaces).
    Returns one tag per token: ``O`` / ``B-TYPE`` / ``I-TYPE`` / bare
    ``main-sub`` for FewNERD-style types.
    """
    para_l = para.lower()
    if true_tokens is not None:
        words = [t.lower() for t in true_tokens]
    else:
        words = para_l.split(" ")
    span = ["O" for _ in words]
    completed: list[str] = []

    for i, raw in enumerate(answers):
        answer = raw.strip().lower()
        if "(" in answer:  # stray type annotation glued onto the entity
            answer = answer[: answer.find("(")].strip()
        if bug_compat:
            typestring = typestrings[i]  # may IndexError -> row dropped
        else:
            if i >= len(typestrings):
                continue
            typestring = typestrings[i]
        etype = _extract_type(typestring)
        if etype is None:
            continue

        exists = answer in para_l or _respace(answer) in para_l
        if not exists:
            continue

        if len(answer.split(" ")) == 1:
            if answer not in words:
                continue
            if para_l.count(answer) > 1:
                nth = completed.count(answer.strip()) + 1
                try:
                    idx = find_nth_list(words, answer, nth)
                except ValueError:
                    if bug_compat:
                        raise
                    continue
            else:
                idx = words.index(answer)
            if span[idx] == "O":
                span[idx] = etype if "-" in etype else "B-" + etype
            completed.append(answer)
        else:
            for tok in SPLIT_TOKENS:
                if tok in answer:
                    answer = (" " + tok).join(answer.split(tok))
            answer_words = answer.split(" ")
            nth = completed.count(answer.strip()) + 1
            try:
                idx = find_nth_list_subset(words, answer, nth)
            except IndexError:
                if bug_compat:
                    raise
                continue
            if idx < 0 and not bug_compat:
                # ambiguous (-1: more occurrences than sought): skip the tag
                # write but still count the claim, so a later duplicate claim
                # seeks the next occurrence exactly as compat counting would.
                completed.append(answer)
                continue
            # compat mode: idx == -1 falls through and tags span[-1], exactly
            # like the reference (algorithms.py:121-124).
            end = idx + len(answer_words)
            span[idx] = etype if "-" in etype else "B-" + etype
            for j in range(idx + 1, end):
                span[j] = etype if "-" in etype else "I-" + etype
            completed.append(answer)
    return span
