"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key (a custom operator the reference lacks; SURVEY.md §2.4).

Two physical plans sharing one match kernel:

- :func:`events_asof_orders` — broadcast: the right side (orders) is
  grouped per key into SORTED timestamp arrays ONCE, broadcast via
  ``ray.put``, and every left batch resolves with one vectorized
  ``np.searchsorted`` per key group — no shuffle at all when the right
  side fits the object store (dimension-table case).
- :func:`events_asof_orders_partitioned` — the scale path when it does
  not: both sides are tagged, unioned, and hash-partitioned on the key
  (``shuffle.hash_partitioned``), and each partition builds its local
  right-side index and matches its left rows with the same kernel.  Per
  worker memory is one key partition of each side, never a whole table.

Output carries the matched right-side TIMESTAMP (not an arbitrary row id):
when several right rows share (key, ts), any of them is a valid as-of
match and engines may pick different rows, but the matched timestamp is
deterministic — which keeps the DuckDB ``ASOF JOIN`` oracle value-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def build_right_index(
    keys: np.ndarray, ts: np.ndarray
) -> dict[int, np.ndarray]:
    """key → sorted int64 timestamp array (driver-side, small dimension)."""
    order = np.lexsort((ts, keys))
    keys, ts = keys[order], ts[order]
    bounds = np.searchsorted(keys, np.unique(keys), side="left").tolist() + [
        len(keys)
    ]
    uniq = np.unique(keys)
    return {
        int(k): ts[bounds[i] : bounds[i + 1]] for i, k in enumerate(uniq)
    }


def _match_rows(
    event_ids: np.ndarray,
    users: np.ndarray,
    ts: np.ndarray,
    index: dict[int, np.ndarray],
) -> pa.Table:
    """Shared as-of match kernel: left rows × per-key sorted ts arrays."""
    out_e, out_u, out_t = [], [], []
    # group the rows by key so searchsorted runs once per (key, block)
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
            pos = np.searchsorted(arr, ts[sel], side="right") - 1
            hit = pos >= 0
            out_e.extend(event_ids[sel][hit].tolist())
            out_u.extend([int(u)] * int(hit.sum()))
            out_t.extend(arr[pos[hit]].tolist())
        i = j
    return pa.table(
        {
            "event_id": pa.array(out_e, type=pa.int64()),
            "user_id": pa.array(out_u, type=pa.int64()),
            "order_ts": pa.array(out_t, type=pa.timestamp("us")),
        }
    )


class _AsofMatcher:
    def __init__(self, index_ref) -> None:
        import ray

        self.index: dict[int, np.ndarray] = ray.get(index_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _match_rows(
            batch.column("event_id").to_numpy(zero_copy_only=False),
            batch.column("user_id").to_numpy(zero_copy_only=False),
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
            self.index,
        )


def events_asof_orders(events, orders_index_ref):
    """events ⟕asof orders → (event_id, user_id, order_ts): inner as-of."""
    return events.map_batches(
        _AsofMatcher,
        fn_constructor_kwargs={"index_ref": orders_index_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def _tag_left_batch(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "event_id": batch.column("event_id").cast(pa.int64()),
            "user_id": batch.column("user_id").cast(pa.int64()),
            "ts": batch.column("ts").cast(pa.int64()),
            "side": pa.array([0] * len(batch), type=pa.int8()),
        }
    )


def _tag_right_batch(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "event_id": pa.array([-1] * len(batch), type=pa.int64()),
            "user_id": batch.column("o_custkey").cast(pa.int64()),
            "ts": batch.column("o_orderdate").cast(pa.int64()),
            "side": pa.array([1] * len(batch), type=pa.int8()),
        }
    )


def _asof_partition(block: pa.Table) -> pa.Table:
    """One key partition of the tagged union → matched as-of rows."""
    if len(block) == 0:
        return pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "order_ts": pa.array([], type=pa.timestamp("us")),
            }
        )
    side = block.column("side").to_numpy(zero_copy_only=False)
    users = block.column("user_id").to_numpy(zero_copy_only=False)
    ts = block.column("ts").to_numpy(zero_copy_only=False)
    right = side == 1
    index = build_right_index(users[right], ts[right])
    left = ~right
    return _match_rows(
        block.column("event_id").to_numpy(zero_copy_only=False)[left],
        users[left],
        ts[left],
        index,
    )


def events_asof_orders_partitioned(events, orders, num_partitions=None):
    """Hash-partitioned as-of join: no broadcast of either side.

    Both tables are tagged, unioned, hash-partitioned on the join key,
    and each partition builds its LOCAL right-side index (lexsort +
    bounds) and matches its left rows with the shared kernel — identical
    output to the broadcast plan, bounded per-worker memory.
    """
    from ..shuffle import hash_partitioned

    tagged = events.map_batches(
        _tag_left_batch, batch_format="pyarrow"
    ).union(
        orders.select_columns(["o_custkey", "o_orderdate"]).map_batches(
            _tag_right_batch, batch_format="pyarrow"
        )
    )
    return hash_partitioned(
        tagged, ["user_id"], _asof_partition, num_partitions=num_partitions
    )


def load_orders_index(sf_dir: str):
    """Driver-side build of the broadcastable right-side index."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    keys = tbl.column("o_custkey").to_numpy(zero_copy_only=False)
    ts = (
        tbl.column("o_orderdate")
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    return build_right_index(keys, ts)
