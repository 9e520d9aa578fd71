"""Output cleaning + surface-form normalization kernels.

* ``clean_answers`` reproduces ``BaseAlgorithm.clean_output`` (reference
  ``algorithms.py:37-63``).  The reference has a dead-code branch: when
  typestrings are present it builds deduplicated ``new_answers`` /
  ``new_typestrings`` and then discards them, returning the originals merely
  punctuation-stripped (``algorithms.py:44-63``).  ``compat=True`` replicates
  that; ``compat=False`` implements the evident intent (order-preserving dedup
  + trivial-token removal + strip) and is what the KG pipeline uses.
* ``normalize_surface`` is the reference's ``is_eq`` equality key
  (``eval.py:20-21``) — THE canonicalization key for entity linking.
* ``surface_hash64`` gives a deterministic, process-independent 64-bit key for
  shuffle partitioning (Python's builtin ``hash`` is salted per process and
  must never be used as a shuffle key).
"""

from __future__ import annotations

import hashlib
import string

from .stopwords import STOPWORD_SET

_TRIVIAL = ("", " ", ".", "-")
_PUNCT = "".join(string.punctuation)


def _strip_answer(ans: str) -> str:
    if "(" in ans:
        ans = ans[: ans.find("(")]
    return ans.strip().strip(_PUNCT).strip()


def clean_answers(
    answers: list[str],
    typestrings: list[str] | None = None,
    compat: bool = False,
) -> list[str] | tuple[list[str], list[str]]:
    """Dedup + drop trivial/stopword answers + strip punctuation/parens."""
    if typestrings is None:
        # set() dedup is order-destroying in the reference (algorithms.py:40);
        # engine mode preserves first-seen order for determinism.
        if compat:
            answers = list(set(answers))
        else:
            answers = list(dict.fromkeys(answers))
        answers = [a for a in answers if a not in _TRIVIAL and a not in STOPWORD_SET]
        return [_strip_answer(a) for a in answers]

    if compat:
        # Reference bug: the deduplicated lists are built then discarded; the
        # ORIGINAL lists come back punctuation-stripped (algorithms.py:44-63).
        return [_strip_answer(a) for a in answers], list(typestrings)

    new_answers: list[str] = []
    new_typestrings: list[str] = []
    for ans, ts in zip(answers, typestrings):
        if ans in new_answers or ans in _TRIVIAL or ans in STOPWORD_SET:
            continue
        new_answers.append(ans)
        new_typestrings.append(ts)
    return [_strip_answer(a) for a in new_answers], new_typestrings


def split_phrase_answers(
    answers: list[str], typestrings: list[str] | None = None
) -> list[str] | tuple[list[str], list[str]]:
    """Optional M9 phrase splitter (reference ``algorithms.py:158-175``):
    each multiword answer becomes one answer per word, its typestring
    duplicated.  Off by default (reference drivers set
    ``split_phrases=False``, ``run.py:76``)."""
    new_answers: list[str] = []
    new_typestrings: list[str] = []
    for i, answer in enumerate(answers):
        parts = answer.split(" ") if " " in answer else [answer]
        for part in parts:
            new_answers.append(part)
            if typestrings is not None:
                new_typestrings.append(typestrings[i])
    if typestrings is None:
        return new_answers
    return new_answers, new_typestrings


def normalize_surface(surface: str) -> str:
    """Reference ``is_eq`` normalization (``eval.py:20-21``): lowercase, strip
    whitespace, strip punctuation, strip whitespace again."""
    return surface.lower().strip().strip(_PUNCT).strip()


def surface_hash64(surface_norm: str) -> int:
    """Stable SIGNED 64-bit hash of a normalized surface form.

    First 8 bytes of md5, big-endian, reinterpreted signed: signed so the
    id flows through Arrow/Ray native aggregates as int64 (unsigned 64-bit
    falls back to pickled-object columns in grouped aggregates), and
    md5-derived so a DuckDB oracle can recompute it exactly —
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` with two's-complement
    wraparound (see ``__ray_entry__._SQL_HASH64``)."""
    return int.from_bytes(
        hashlib.md5(surface_norm.encode("utf-8")).digest()[:8],
        "big",
        signed=True,
    )
