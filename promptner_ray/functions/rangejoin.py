"""Interval (range) join: for each left row, aggregate the right rows of
the same key whose timestamp falls in ``[left.ts - window, left.ts]`` —
a custom operator Ray Data lacks (SURVEY.md §2.4 joins family; sibling
of :mod:`.asof`, which it shares its physical plans and right-side index
with).

Emitting matched PAIRS can blow output up quadratically on hot keys, so
the operator emits per-left-row AGGREGATES of the match set — count +
min/max timestamp, all order-independent, so the DuckDB
``LEFT JOIN … BETWEEN`` oracle is value-exact.  Count/first/last is what
feature-engineering passes ("orders in the last 7 days") want anyway.

Physical plans (same trade-off as the as-of join):

- broadcast (:func:`events_range_orders`): right side grouped into
  per-key SORTED timestamp arrays once, ``ray.put``, each left batch
  resolves with two vectorized ``searchsorted`` calls per key group.
- hash-partitioned (:func:`events_range_orders_partitioned`): tagged
  union of both sides exchanged on the key; each partition builds its
  local index — no broadcast, bounded per-worker memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .asof import _tag_left_batch, _tag_right_batch, build_right_index

WINDOW_US = 7 * 86_400 * 1_000_000  # 7 days

_OUT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("n_orders", pa.int64()),
        ("first_order_ts", pa.timestamp("us")),
        ("last_order_ts", pa.timestamp("us")),
    ]
)


def _range_match(
    event_ids: np.ndarray,
    users: np.ndarray,
    ts: np.ndarray,
    index: dict[int, np.ndarray],
    window_us: int,
) -> pa.Table:
    """Left rows × per-key sorted right timestamps → one aggregate row
    per left row (LEFT-join semantics: misses keep n=0, null ts)."""
    n = len(event_ids)
    counts = np.zeros(n, dtype=np.int64)
    first = np.zeros(n, dtype=np.int64)
    last = np.zeros(n, dtype=np.int64)
    hit = np.zeros(n, dtype=bool)
    order = np.argsort(users, kind="stable")
    i = 0
    while i < len(order):
        j = i
        u = users[order[i]]
        while j < len(order) and users[order[j]] == u:
            j += 1
        arr = index.get(int(u))
        if arr is not None and len(arr):
            sel = order[i:j]
            lo = np.searchsorted(arr, ts[sel] - window_us, side="left")
            hi = np.searchsorted(arr, ts[sel], side="right")
            c = hi - lo
            counts[sel] = c
            has = c > 0
            hit[sel] = has
            first[sel[has]] = arr[lo[has]]
            last[sel[has]] = arr[hi[has] - 1]
        i = j
    ts_type = pa.timestamp("us")
    return pa.table(
        {
            "event_id": pa.array(event_ids, type=pa.int64()),
            "n_orders": pa.array(counts, type=pa.int64()),
            "first_order_ts": pa.Array.from_pandas(
                np.where(hit, first, 0), mask=~hit, type=ts_type
            ),
            "last_order_ts": pa.Array.from_pandas(
                np.where(hit, last, 0), mask=~hit, type=ts_type
            ),
        }
    )


class _RangeMatcher:
    def __init__(self, index_ref, window_us: int) -> None:
        import ray

        self.index: dict[int, np.ndarray] = ray.get(index_ref)
        self.window_us = window_us

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _range_match(
            batch.column("event_id").to_numpy(zero_copy_only=False),
            batch.column("user_id").to_numpy(zero_copy_only=False),
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
            self.index,
            self.window_us,
        )


def events_range_orders(events, orders_index_ref, window_us: int = WINDOW_US):
    """events ⟕range orders (broadcast plan) → per-event 7-day order
    count + first/last order timestamp."""
    return events.map_batches(
        _RangeMatcher,
        fn_constructor_kwargs={
            "index_ref": orders_index_ref,
            "window_us": window_us,
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def _range_partition(block: pa.Table, window_us: int) -> pa.Table:
    if len(block) == 0:
        return _OUT_SCHEMA.empty_table()
    side = block.column("side").to_numpy(zero_copy_only=False)
    users = block.column("user_id").to_numpy(zero_copy_only=False)
    ts = block.column("ts").to_numpy(zero_copy_only=False)
    right = side == 1
    index = build_right_index(users[right], ts[right])
    left = ~right
    return _range_match(
        block.column("event_id").to_numpy(zero_copy_only=False)[left],
        users[left],
        ts[left],
        index,
        window_us,
    )


def events_range_orders_partitioned(
    events, orders, window_us: int = WINDOW_US, num_partitions=None
):
    """Hash-partitioned range join: no broadcast of either side (the
    100 TB path; same tagged-union exchange as the as-of join)."""
    from ..shuffle import hash_partitioned

    tagged = events.map_batches(
        _tag_left_batch, batch_format="pyarrow"
    ).union(
        orders.select_columns(["o_custkey", "o_orderdate"]).map_batches(
            _tag_right_batch, batch_format="pyarrow"
        )
    )
    return hash_partitioned(
        tagged,
        ["user_id"],
        lambda block: _range_partition(block, window_us),
        num_partitions=num_partitions,
    )
