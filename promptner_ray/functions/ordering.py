"""Deterministic global shuffle order for training-data emission.

Pretraining dataloaders consume the corpus in a pseudo-random but
*reproducible* global order.  ``shuffle_positions`` assigns every doc
its position in the permutation induced by ``md5(doc_id:seed)`` — the
content-addressed analogue of a seeded Fisher-Yates, stable across
runs, engines and partitionings (``Dataset.random_shuffle`` is none of
those).

A global rank is an order-by over the whole corpus, but the plan never
runs a distributed sort.  The md5-hex rank's FIRST BYTE already places
every row into one of 256 ordered buckets, so global position =
(tokens before my bucket) + (my index within my bucket):

1. one map pass emits per-block bucket histograms — the driver
   collects O(#blocks · 256) ints and prefix-sums 256 counters,
   constant memory at any corpus size;
2. buckets are co-located via the hash-partitioned exchange (partition
   id a pure function of the bucket), each partition locally sorts its
   buckets by (rank, doc_id) and adds the broadcast bucket offsets.

Hex-string lexicographic order agrees with numeric first-byte order
('0'-'9' < 'a'-'f' in ASCII), so bucket-then-rank equals plain rank
order and the DuckDB twin is a single ``row_number() OVER (ORDER BY
md5 …)`` window.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rank_batch(batch: pa.Table, key: str, seed: int) -> pa.Table:
    ids = batch.column(key).to_pylist()
    ranks = [
        hashlib.md5(f"{v}:{seed}".encode("utf-8")).hexdigest() for v in ids
    ]
    buckets = np.array([int(r[:2], 16) for r in ranks], dtype=np.int64)
    return pa.table(
        {
            key: batch.column(key).cast(pa.int64()),
            "__rank": pa.array(ranks, type=pa.string()),
            "__bucket": pa.array(buckets, type=pa.int64()),
        }
    )


def _bucket_hist_batch(batch: pa.Table) -> pa.Table:
    out = batch.group_by(["__bucket"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "__bucket": out.column("__bucket"),
            "n": out.column("count_all").cast(pa.int64()),
        }
    )


def _position_part(part: pa.Table, offsets: np.ndarray, key: str) -> pa.Table:
    idx = pc.sort_indices(
        part,
        sort_keys=[
            ("__bucket", "ascending"),
            ("__rank", "ascending"),
            (key, "ascending"),
        ],
    )
    s = part.take(idx)
    b = s.column("__bucket").to_numpy(zero_copy_only=False)
    new_run = np.ones(len(b), dtype=bool)
    new_run[1:] = b[1:] != b[:-1]
    run_id = np.cumsum(new_run) - 1
    run_start = np.flatnonzero(new_run)
    within = np.arange(len(b)) - run_start[run_id]
    pos = offsets[b] + within
    return pa.table(
        {
            key: s.column(key),
            "pos": pa.array(pos, type=pa.int64()),
        }
    )


def shuffle_positions(
    ds, key: str = "doc_id", seed: int = 0, num_partitions: int | None = None
):
    """rows → (key, pos): the row's position in the deterministic global
    shuffle order ``ORDER BY md5(key:seed), key`` — zero-based, dense."""
    from ..shuffle import hash_partitioned

    ranked = ds.map_batches(
        _rank_batch, fn_kwargs={"key": key, "seed": seed},
        batch_format="pyarrow",
    ).materialize()  # id+rank table (~50 B/row); three consumers below

    hist = ranked.map_batches(
        _bucket_hist_batch, batch_format="pyarrow"
    ).take_all()
    counts = np.zeros(256, dtype=np.int64)
    for r in hist:
        counts[r["__bucket"]] += r["n"]
    offsets = np.concatenate(([0], np.cumsum(counts[:-1])))

    def finish(part: pa.Table) -> pa.Table:
        return _position_part(part, offsets, key)

    return hash_partitioned(
        ranked, ["__bucket"], finish, num_partitions=num_partitions
    )
