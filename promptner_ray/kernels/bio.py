"""BIO tag-sequence kernels: decode, entity folding, and span-level F1.

* ``decode_bio`` is the shared BIO-run decoder the reference repeats inline in
  each dataset loader (reference ``data.py:139-157``, ``202-219``, ``242-259``,
  ``285-302``): fold ``B-``/``I-`` runs into entity surface forms; FewNERD
  style ``maintype-subtype`` tags carry no B/I prefix and adjacent same-type
  tokens fold into one entity (``data.py:78``).
* ``bio_entities`` extracts (type, start, end) spans — the unit of the
  seqeval-style F1 (``seqeval`` is not available here; span extraction +
  micro/macro P/R/F1 over exact-span matches is the published algorithm).
"""

from __future__ import annotations

from collections import Counter


def decode_bio(
    tokens: list[str], tags: list[str]
) -> tuple[list[str], list[tuple[str, str]]]:
    """Fold a BIO tag sequence into entity surfaces.

    Returns ``(entities, surface_type_pairs)`` where entities are
    space-joined surface forms in sentence order.  Handles both classic
    ``B-X``/``I-X`` tags and prefix-less FewNERD ``main-sub`` tags (adjacent
    equal tags merge).
    """
    entities: list[str] = []
    pairs: list[tuple[str, str]] = []
    cur_tokens: list[str] = []
    cur_type: str | None = None

    def flush() -> None:
        nonlocal cur_tokens, cur_type
        if cur_tokens and cur_type is not None:
            surface = " ".join(cur_tokens)
            entities.append(surface)
            pairs.append((surface, cur_type))
        cur_tokens, cur_type = [], None

    for tok, tag in zip(tokens, tags):
        if tag == "O" or tag == "":
            flush()
        elif tag.startswith("B-"):
            flush()
            cur_tokens, cur_type = [tok], tag[2:]
        elif tag.startswith("I-"):
            if cur_type == tag[2:]:
                cur_tokens.append(tok)
            else:  # dangling I- starts a new entity (conventional fallback)
                flush()
                cur_tokens, cur_type = [tok], tag[2:]
        else:  # FewNERD bare "main-sub" tag: merge adjacent equal tags
            if cur_type == tag and cur_tokens:
                cur_tokens.append(tok)
            else:
                flush()
                cur_tokens, cur_type = [tok], tag
    flush()
    return entities, pairs


def bio_entities(tags: list[str]) -> list[tuple[str, int, int]]:
    """Extract (type, start, end_exclusive) spans from a BIO tag sequence."""
    spans: list[tuple[str, int, int]] = []
    start: int | None = None
    cur: str | None = None
    for i, tag in enumerate(tags):
        if tag == "O" or tag == "":
            if cur is not None:
                spans.append((cur, start, i))
                cur, start = None, None
        elif tag.startswith("B-"):
            if cur is not None:
                spans.append((cur, start, i))
            cur, start = tag[2:], i
        elif tag.startswith("I-"):
            if cur != tag[2:]:
                if cur is not None:
                    spans.append((cur, start, i))
                cur, start = tag[2:], i
        else:  # bare FewNERD tag
            if cur != tag:
                if cur is not None:
                    spans.append((cur, start, i))
                cur, start = tag, i
    if cur is not None:
        spans.append((cur, start, len(tags)))
    return spans


def span_prf_counts(
    truth: list[str], pred: list[str]
) -> dict[str, tuple[int, int, int]]:
    """Per-type (tp, n_pred, n_truth) counts for one sentence.

    Exact-span matching (type + boundaries), the seqeval convention.  These
    are the PARTIAL aggregates: sum them across batches, then derive
    micro/macro P/R/F1 — this is how the reference's sequential
    ``f1_score`` loop (``run.py:36-52``) distributes.
    """
    t_spans = Counter(bio_entities(truth))
    p_spans = Counter(bio_entities(pred))
    out: dict[str, tuple[int, int, int]] = {}
    types = {s[0] for s in t_spans} | {s[0] for s in p_spans}
    for ty in types:
        tp = sum(
            min(c, p_spans.get(s, 0)) for s, c in t_spans.items() if s[0] == ty
        )
        np_ = sum(c for s, c in p_spans.items() if s[0] == ty)
        nt = sum(c for s, c in t_spans.items() if s[0] == ty)
        out[ty] = (tp, np_, nt)
    return out


def prf_from_counts(
    counts: dict[str, tuple[int, int, int]],
) -> dict[str, float]:
    """Micro/macro P/R/F1 from summed per-type (tp, n_pred, n_truth)."""

    def prf(tp: int, np_: int, nt: int) -> tuple[float, float, float]:
        p = tp / np_ if np_ else 0.0
        r = tp / nt if nt else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return p, r, f

    tp = sum(v[0] for v in counts.values())
    np_ = sum(v[1] for v in counts.values())
    nt = sum(v[2] for v in counts.values())
    micro_p, micro_r, micro_f = prf(tp, np_, nt)
    per_type = [prf(*v) for v in counts.values()]
    macro_f = sum(f for _, _, f in per_type) / len(per_type) if per_type else 0.0
    return {
        "micro_precision": micro_p,
        "micro_recall": micro_r,
        "micro_f1": micro_f,
        "macro_f1": macro_f,
    }
