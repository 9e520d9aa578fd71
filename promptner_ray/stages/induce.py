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
    """sentence rows → flat triples table (no shuffle: grouping is the row)."""
    urls, sids, subjs, preds, objs, stypes, otypes = [], [], [], [], [], [], []
    for url, sid, text, mlist in zip(
        batch.column("url").to_pylist(),
        batch.column("sent_id").to_pylist(),
        batch.column("text").to_pylist(),
        batch.column("mentions").to_pylist(),
    ):
        tokens = text.split(" ")
        for subj, pred, obj, st, ot in induce_triples_for_sentence(tokens, mlist):
            urls.append(url)
            sids.append(sid)
            subjs.append(subj)
            preds.append(pred)
            objs.append(obj)
            stypes.append(st)
            otypes.append(ot)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "sent_id": pa.array(sids, type=pa.int32()),
            "subj": pa.array(subjs, type=pa.string()),
            "pred": pa.array(preds, type=pa.string()),
            "obj": pa.array(objs, type=pa.string()),
            "subj_type": pa.array(stypes, type=pa.string()),
            "obj_type": pa.array(otypes, type=pa.string()),
        }
    )
