"""Sequence packing layout: where every document lands in the training
token stream.

The last stage of a pretraining data pipeline concatenates all documents
(in a fixed global order) into one token stream and slices it into
fixed-length training sequences.  The layout — for each doc, its global
token ``start`` offset and the first/last sequence it touches — is a
global *exclusive prefix sum* over per-doc token counts, the textbook
two-pass distributed scan:

1. **count pass** — ``map_batches`` projects each doc to
   ``(doc_id, n_tokens)`` (the text never leaves the block; the id
   table is ~16 bytes/doc ≈ 10⁻⁴ of corpus bytes);
2. **partition totals** — docs are range-partitioned by
   ``part = doc_id // W`` (order-preserving, W sized for ~1 partition
   per CPU from the max id); a per-batch vectorized combine emits
   ``(part, partial_sum)`` rows, so the driver collects only
   O(#blocks) ints and computes the P-entry exclusive scan — constant
   driver memory at any corpus scale;
3. **layout pass** — ``groupby(part).map_groups``: each partition
   sorts its own rows by ``doc_id`` (local sort, nothing global),
   cumsums, and adds its broadcast partition offset.

Only int64 ids and counts ever cross an exchange; the only all-to-all
is the groupby on the P-valued ``part`` key.  Assumes doc_ids are
roughly dense so ``doc_id // W`` balances (web corpora assign
sequential ids at ingest; for sparse id spaces, substitute a rank from
a prior sort).  The packing order is ascending ``doc_id`` — any other
deterministic order is a pre-sort away.

The whole layout is closed-form over token counts, so the DuckDB
oracle is a window-function cumsum — bit-exact, pure int arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEQ_LEN = 256


def _count_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_tokens": pa.array(
                [len(t.split(" ")) for t in texts], type=pa.int64()
            ),
        }
    )


def _add_part(batch: pa.Table, width: int) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return batch.append_column(
        "part", pa.array((ids // width).astype(np.int64), type=pa.int64())
    )


def _part_sums_batch(batch: pa.Table) -> pa.Table:
    out = batch.group_by(["part"]).aggregate([("n_tokens", "sum")])
    return pa.table(
        {
            "part": out.column("part"),
            "tok": out.column("n_tokens_sum").cast(pa.int64()),
        }
    )


def _layout_group(group: pa.Table, offsets: dict, seq_len: int) -> pa.Table:
    part = group.column("part")[0].as_py()
    order = np.argsort(group.column("doc_id").to_numpy(zero_copy_only=False))
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)[order]
    toks = group.column("n_tokens").to_numpy(zero_copy_only=False)[order]
    start = offsets[part] + np.concatenate(
        ([0], np.cumsum(toks[:-1], dtype=np.int64))
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(toks, type=pa.int64()),
            "start": pa.array(start, type=pa.int64()),
            "seq_first": pa.array(start // seq_len, type=pa.int64()),
            "seq_last": pa.array(
                (start + toks - 1) // seq_len, type=pa.int64()
            ),
            "seq_offset": pa.array(start % seq_len, type=pa.int64()),
        }
    )


def pack_layout(docs, seq_len: int = SEQ_LEN, num_partitions: int | None = None):
    """documents → (doc_id, n_tokens, start, seq_first, seq_last,
    seq_offset): each doc's place in the packed training-token stream
    (docs concatenated in ascending doc_id order, whitespace tokens,
    sequences of ``seq_len``)."""
    from ..shuffle import default_partitions

    n_parts = num_partitions or default_partitions()
    # materialize the id table (~16 B/doc) so the three consumers below
    # (max, partition totals, layout) never re-run the count pass over
    # the full text column — the object store holds ids, not the corpus
    ids = docs.map_batches(_count_batch, batch_format="pyarrow").materialize()
    max_id = ids.max("doc_id")
    width = max(1, (int(max_id) + n_parts) // n_parts)
    parted = ids.map_batches(
        _add_part, fn_kwargs={"width": width}, batch_format="pyarrow"
    )

    # driver-side exclusive scan over the P partition totals — the only
    # data that ever reaches the driver is O(#blocks) (part, sum) rows
    partials = parted.map_batches(
        _part_sums_batch, batch_format="pyarrow"
    ).take_all()
    totals: dict[int, int] = {}
    for r in partials:
        totals[r["part"]] = totals.get(r["part"], 0) + r["tok"]
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(totals):
        offsets[p] = acc
        acc += totals[p]

    return parted.groupby("part").map_groups(
        lambda g: _layout_group(g, offsets, seq_len),
        batch_format="pyarrow",
    )
