"""Triple induction + mention explode: stateless batch kernels.

Triple rule (new capability — the reference emits entity lists only, so this
rule is *defined here* and the P/R oracle runs the same rule single-process;
SURVEY.md §7.1 step 5): per sentence, mentions in span order; every
consecutive pair (a, b) yields ``(subj=a, pred, obj=b)`` where ``pred`` is
the first non-stopword alphabetic token strictly between the two spans
(lowercased), else the literal ``"co_occurs_with"``.  Deterministic, pure,
order-stable.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.stopwords import STOPWORD_SET

CO_OCCURS = "co_occurs_with"


def induce_triples_for_sentence(
    tokens: list[str], mentions: list[dict]
) -> list[tuple[str, str, str, str, str]]:
    """(subj, pred, obj, subj_type, obj_type) tuples for one sentence."""
    ms = sorted(mentions, key=lambda m: m["span_start"])
    triples = []
    for a, b in zip(ms, ms[1:]):
        pred = CO_OCCURS
        for tok in tokens[a["span_end"] : b["span_start"]]:
            low = tok.lower()
            if len(low) > 1 and low.isalpha() and low not in STOPWORD_SET:
                pred = low
                break
        triples.append((a["surface"], pred, b["surface"], a["mtype"], b["mtype"]))
    return triples


def explode_mentions_batch(batch: pa.Table) -> pa.Table:
    """sentence rows (mentions list<struct>) → flat mentions table.

    Vectorized explode: the list offsets drive an index-repeat of the
    parent columns; the struct children flatten zero-copy.
    """
    import numpy as np
    import pyarrow.compute as pc

    mcol = batch.column("mentions").combine_chunks()
    offsets = np.asarray(mcol.offsets)
    counts = offsets[1:] - offsets[:-1]
    parent_idx = pa.array(
        np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    )
    flat = mcol.flatten()  # struct array of all mentions
    return pa.table(
        {
            "url": pc.take(batch.column("url"), parent_idx),
            "sent_id": pc.take(batch.column("sent_id"), parent_idx),
            "mention": flat.field("surface"),
            "mtype": flat.field("mtype"),
            "span_start": flat.field("span_start"),
            "span_end": flat.field("span_end"),
        }
    )


def induce_triples_batch(batch: pa.Table) -> pa.Table:
    """sentence rows → flat triples table (no shuffle: grouping is the row).

    Vectorized implementation of :func:`induce_triples_for_sentence`'s
    rule (which stays the independent single-process oracle,
    ``pipelines/oracle.py``; the e2e equality test pins the two paths
    together).  No per-row Python anywhere:

    - consecutive mention pairs come from a stable ``np.lexsort`` over
      (sentence, span_start) on the flattened mention struct —
      adjacent sorted positions within one sentence ARE the pairs;
    - the predicate scan computes one boolean "eligible token" mask over
      the batch's flattened token stream (Arrow ``utf8_lower`` /
      ``utf8_is_alpha`` / ``is_in`` kernels, Unicode semantics matching
      ``str.isalpha``), then finds each pair's first eligible gap token
      with ``searchsorted`` over the eligible positions — O(1) per pair
      instead of a Python token walk.
    """
    import numpy as np
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "url": pa.array([], type=pa.string()),
            "sent_id": pa.array([], type=pa.int32()),
            "subj": pa.array([], type=pa.string()),
            "pred": pa.array([], type=pa.string()),
            "obj": pa.array([], type=pa.string()),
            "subj_type": pa.array([], type=pa.string()),
            "obj_type": pa.array([], type=pa.string()),
        }
    )
    if len(batch) == 0:
        return empty

    mcol = batch.column("mentions").combine_chunks()
    moff = np.asarray(mcol.offsets)
    mcounts = moff[1:] - moff[:-1]
    flat = mcol.flatten()
    if len(flat) == 0:
        return empty
    m_parent = np.repeat(np.arange(len(batch), dtype=np.int64), mcounts)
    span_start = flat.field("span_start").to_numpy(zero_copy_only=False)
    span_end = flat.field("span_end").to_numpy(zero_copy_only=False)

    # stable sort by (sentence, span_start): ties keep list order, like
    # the oracle's sorted(key=span_start)
    order = np.lexsort((span_start, m_parent))
    # pair (i, i+1) in sorted order iff both lie in the same sentence
    same = m_parent[order[:-1]] == m_parent[order[1:]]
    a_idx = order[:-1][same]
    b_idx = order[1:][same]
    if len(a_idx) == 0:
        return empty
    pair_parent = m_parent[a_idx]

    # one eligibility mask over the batch's flattened tokens
    tok_lists = pc.split_pattern(batch.column("text").combine_chunks(), " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    toff = np.asarray(tok_lists.offsets).astype(np.int64)
    tokens_flat = tok_lists.values
    low = pc.utf8_lower(tokens_flat)
    eligible = pc.and_(
        pc.and_(
            pc.greater(pc.utf8_length(low), 1),
            pc.utf8_is_alpha(low),
        ),
        pc.invert(pc.is_in(low, value_set=pa.array(sorted(STOPWORD_SET)))),
    ).to_numpy(zero_copy_only=False)
    elig_pos = np.flatnonzero(eligible)

    # gap token range per pair, in flat-token coordinates
    gap_lo = toff[pair_parent] + span_end[a_idx]
    gap_hi = toff[pair_parent] + span_start[b_idx]
    if len(elig_pos) == 0:
        # no eligible token anywhere in the batch
        preds = pa.array([CO_OCCURS] * len(a_idx), type=pa.string())
    else:
        first = np.searchsorted(elig_pos, gap_lo, side="left")
        clamped = np.minimum(first, len(elig_pos) - 1)
        has_pred = (first < len(elig_pos)) & (elig_pos[clamped] < gap_hi)
        pred_tok_idx = np.where(has_pred, elig_pos[clamped], 0)
        preds = pc.if_else(
            pa.array(has_pred),
            pc.take(low, pa.array(pred_tok_idx, type=pa.int64())),
            pa.scalar(CO_OCCURS),
        )

    surfaces = flat.field("surface")
    mtypes = flat.field("mtype")
    take_a = pa.array(a_idx, type=pa.int64())
    take_b = pa.array(b_idx, type=pa.int64())
    take_p = pa.array(pair_parent, type=pa.int64())
    return pa.table(
        {
            "url": pc.take(batch.column("url").combine_chunks(), take_p),
            "sent_id": pc.take(
                batch.column("sent_id").combine_chunks(), take_p
            ),
            "subj": pc.take(surfaces, take_a),
            "pred": preds,
            "obj": pc.take(surfaces, take_b),
            "subj_type": pc.take(mtypes, take_a),
            "obj_type": pc.take(mtypes, take_b),
        }
    )
