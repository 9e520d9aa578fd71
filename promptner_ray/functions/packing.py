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


# ---------------------------------------------------------------------------
# RAG chunking: overlapping fixed-token windows with stable chunk ids
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def chunk_batch(
    batch: pa.Table,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> pa.Table:
    """documents → (doc_id, chunk_id, n_tokens, chunk_text): overlapping
    ``chunk_tokens``-token windows at stride ``chunk_tokens − overlap``
    — the retrieval-corpus preparation step (chunk, embed, index).
    Chunk identity is (doc_id, ordinal), stable under re-partitioning
    because chunking is a pure per-row function.

    Vectorized: one split, a segmented-arange token gather (chunks
    overlap, so unlike the C4 line rewrap the windows do NOT tile the
    token array — indices are materialized), one list-join kernel.
    Stateless map — at 100 TB this is a pure streaming pass."""
    import numpy as np
    import pyarrow.compute as pc

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "chunk_id": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
            "chunk_text": pa.array([], type=pa.string()),
        }
    )
    if len(batch) == 0:
        return empty
    tok_lists = pc.split_pattern(batch.column("text").combine_chunks(), " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    flat = tok_lists.values
    offsets = np.asarray(tok_lists.offsets).astype(np.int64)
    n = offsets[1:] - offsets[:-1]
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    # chunks per doc: 1 if n <= chunk, else ceil((n - chunk)/stride) + 1
    nc = np.where(
        n <= chunk_tokens,
        1,
        (n - chunk_tokens + stride - 1) // stride + 1,
    ).astype(np.int64)
    total = int(nc.sum())
    doc_of = np.repeat(np.arange(len(n), dtype=np.int64), nc)
    cid = np.arange(total) - np.repeat(np.cumsum(nc) - nc, nc)
    starts = cid * stride
    lens = np.minimum(starts + chunk_tokens, n[doc_of]) - starts
    # segmented arange gather of the (overlapping) token windows
    tot_tok = int(lens.sum())
    base = offsets[:-1][doc_of] + starts
    idx = np.arange(tot_tok) - np.repeat(
        np.cumsum(lens) - lens, lens
    ) + np.repeat(base, lens)
    gathered = pc.take(flat, pa.array(idx, type=pa.int64()))
    if isinstance(gathered, pa.ChunkedArray):
        gathered = gathered.combine_chunks()
    chunk_offsets = np.append(0, np.cumsum(lens)).astype(np.int32)
    text = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(chunk_offsets, type=pa.int32()), gathered
        ),
        " ",
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id[doc_of], type=pa.int64()),
            "chunk_id": pa.array(cid, type=pa.int64()),
            "n_tokens": pa.array(lens, type=pa.int64()),
            "chunk_text": text,
        }
    )


def sql_chunks(
    chunk_tokens: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP
) -> str:
    """DuckDB twin of :func:`chunk_batch` (1-based inclusive list
    slices)."""
    stride = chunk_tokens - overlap
    return f"""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS ts,
                 len(string_split(text, ' '))::BIGINT AS n
          FROM documents),
        k AS (
          SELECT doc_id, ts, n,
                 CASE WHEN n <= {chunk_tokens} THEN 1
                      ELSE (n - {chunk_tokens} + {stride} - 1)
                             // {stride} + 1 END AS nc
          FROM d),
        c AS (
          SELECT doc_id, ts, n,
                 unnest(generate_series(0, nc - 1))::BIGINT AS chunk_id
          FROM k)
        SELECT doc_id, chunk_id,
               (least(chunk_id * {stride} + {chunk_tokens}, n)
                - chunk_id * {stride})::BIGINT AS n_tokens,
               array_to_string(
                 ts[chunk_id * {stride} + 1
                    : least(chunk_id * {stride} + {chunk_tokens}, n)],
                 ' ') AS chunk_text
        FROM c
    """
