"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key (a custom operator the reference lacks; SURVEY.md §2.4).

Plan: the right side (orders) is grouped per key into SORTED timestamp
arrays ONCE, broadcast via ``ray.put``, and every left batch resolves with
one vectorized ``np.searchsorted`` per key group — no shuffle at all when
the right side fits the object store (dimension-table case).  When it does
not, the same kernel runs after hash-partitioning BOTH sides on the key
(``groupby(key).map_groups`` with per-group sort) — the partitioning
assumption is key-colocation, stated here explicitly.

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


class _AsofMatcher:
    def __init__(self, index_ref) -> None:
        import ray

        self.index: dict[int, np.ndarray] = ray.get(index_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        event_ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        out_e, out_u, out_t = [], [], []
        # group the batch by key so searchsorted runs once per (key, batch)
        order = np.argsort(users, kind="stable")
        i = 0
        while i < len(order):
            j = i
            u = users[order[i]]
            while j < len(order) and users[order[j]] == u:
                j += 1
            arr = self.index.get(int(u))
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


def events_asof_orders(events, orders_index_ref):
    """events ⟕asof orders → (event_id, user_id, order_ts): inner as-of."""
    return events.map_batches(
        _AsofMatcher,
        fn_constructor_kwargs={"index_ref": orders_index_ref},
        batch_format="pyarrow",
        concurrency=(1, 4),
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
