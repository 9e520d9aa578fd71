"""Relational demo operators over the driver's TPC-H-ish tables.

These evidence the engine's aggregation/join/window mappings from
SURVEY.md §2.5 (partial+final aggregation, G1/G3 patterns) on neutral
tables with clean SQL oracles:

- :func:`lineitem_stats` — two-phase grouped aggregate (map-side combine →
  small keyed merge), the same plan the KG linker uses.  Aggregates are
  chosen order-independent (counts, integral sums, min/max) so results are
  bit-identical to SQL regardless of block order.
- :func:`customer_nation_counts` — broadcast hash join (nation is tiny →
  ``ray.put`` once, dict lookup per batch) + grouped count.
- :func:`events_tumbling` — tumbling-window (1h) per-user event counts:
  the windowed-aggregate pattern expressed as bucket-key groupby.
- :func:`lang_counts` — distinct-value counting (G3).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# lineitem: two-phase grouped aggregate
# ---------------------------------------------------------------------------

def _lineitem_partial(batch: pa.Table) -> pa.Table:
    agg: dict[tuple[str, str], list] = {}
    rf = batch.column("l_returnflag").to_pylist()
    ls = batch.column("l_linestatus").to_pylist()
    qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
    for i in range(len(batch)):
        key = (rf[i], ls[i])
        cur = agg.get(key)
        q = qty[i]
        if cur is None:
            agg[key] = [1, q, q, q]
        else:
            cur[0] += 1
            cur[1] += q
            cur[2] = min(cur[2], q)
            cur[3] = max(cur[3], q)
    keys = list(agg.keys())
    return pa.table(
        {
            "l_returnflag": pa.array([k[0] for k in keys], type=pa.string()),
            "l_linestatus": pa.array([k[1] for k in keys], type=pa.string()),
            "grp": pa.array([f"{k[0]}|{k[1]}" for k in keys], type=pa.string()),
            "n": pa.array([v[0] for v in agg.values()], type=pa.int64()),
            "sq": pa.array([v[1] for v in agg.values()], type=pa.float64()),
            "mn": pa.array([v[2] for v in agg.values()], type=pa.float64()),
            "mx": pa.array([v[3] for v in agg.values()], type=pa.float64()),
        }
    )


def _lineitem_merge(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "l_returnflag": group.column("l_returnflag").slice(0, 1),
            "l_linestatus": group.column("l_linestatus").slice(0, 1),
            "n_rows": pa.array(
                [sum(group.column("n").to_pylist())], type=pa.int64()
            ),
            "sum_qty": pa.array(
                [sum(group.column("sq").to_pylist())], type=pa.float64()
            ),
            "min_qty": pa.array(
                [min(group.column("mn").to_pylist())], type=pa.float64()
            ),
            "max_qty": pa.array(
                [max(group.column("mx").to_pylist())], type=pa.float64()
            ),
        }
    )


def lineitem_stats(lineitem):
    """lineitem → per (returnflag, linestatus) count/sum/min/max of quantity.

    ``l_quantity`` is integral in this corpus, so the float64 sum is exact
    and order-independent (every partial is < 2^53).
    """
    partials = lineitem.map_batches(_lineitem_partial, batch_format="pyarrow")
    return (
        partials.groupby("grp")
        .map_groups(_lineitem_merge, batch_format="pyarrow")
        .select_columns(
            ["l_returnflag", "l_linestatus", "n_rows", "sum_qty", "min_qty", "max_qty"]
        )
    )


# ---------------------------------------------------------------------------
# customer ⋈ nation: broadcast join + grouped count
# ---------------------------------------------------------------------------

class _NationJoiner:
    def __init__(self, nation_ref) -> None:
        import ray

        self.names: dict[int, str] = ray.get(nation_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: Counter[str] = Counter()
        for nk in batch.column("c_nationkey").to_pylist():
            counts[self.names.get(nk, "UNKNOWN")] += 1
        return pa.table(
            {
                "n_name": pa.array(list(counts.keys()), type=pa.string()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )


def _count_merge(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "n_name": group.column("n_name").slice(0, 1),
            "n_customers": pa.array(
                [sum(group.column("n").to_pylist())], type=pa.int64()
            ),
        }
    )


def customer_nation_counts(customer, nation_ref):
    """customer ⋈ nation (broadcast) → customers per nation name."""
    partials = customer.map_batches(
        _NationJoiner,
        fn_constructor_kwargs={"nation_ref": nation_ref},
        batch_format="pyarrow",
        concurrency=2,
    )
    return partials.groupby("n_name").map_groups(
        _count_merge, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# events: tumbling-window per-user aggregate
# ---------------------------------------------------------------------------

def _window_partial(batch: pa.Table) -> pa.Table:
    ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    hour_start = (ts // 3_600_000_000) * 3_600_000_000
    users = batch.column("user_id").to_numpy(zero_copy_only=False)
    agg: Counter[tuple[int, int]] = Counter()
    for u, w in zip(users, hour_start):
        agg[(int(u), int(w))] += 1
    keys = list(agg.keys())
    return pa.table(
        {
            "user_id": pa.array([k[0] for k in keys], type=pa.int64()),
            "window_start": pa.array(
                [k[1] for k in keys], type=pa.timestamp("us")
            ),
            "wk": pa.array([f"{k[0]}|{k[1]}" for k in keys], type=pa.string()),
            "n": pa.array(list(agg.values()), type=pa.int64()),
        }
    )


def _window_merge(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "user_id": group.column("user_id").slice(0, 1),
            "window_start": group.column("window_start").slice(0, 1),
            "n_events": pa.array(
                [sum(group.column("n").to_pylist())], type=pa.int64()
            ),
        }
    )


def events_tumbling(events):
    """events → per (user_id, 1-hour tumbling window) event counts."""
    partials = events.map_batches(_window_partial, batch_format="pyarrow")
    return (
        partials.groupby("wk")
        .map_groups(_window_merge, batch_format="pyarrow")
        .select_columns(["user_id", "window_start", "n_events"])
    )


# ---------------------------------------------------------------------------
# events: gap-based sessionization (stateful streaming-window pattern)
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _sessionize_group(group: pa.Table) -> pa.Table:
    """One user's events → session rows (sorted in-group; the shuffle key
    colocates each user's full history, which is the stated partitioning
    assumption of this operator)."""
    ts = np.sort(
        group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    )
    user = group.column("user_id")[0].as_py()
    gaps = np.diff(ts) > SESSION_GAP_US
    session_of = np.concatenate(([0], np.cumsum(gaps)))
    n_sessions = int(session_of[-1]) + 1 if len(ts) else 0
    starts, counts = [], []
    for s in range(n_sessions):
        sel = ts[session_of == s]
        starts.append(int(sel[0]))
        counts.append(len(sel))
    return pa.table(
        {
            "user_id": pa.array([user] * n_sessions, type=pa.int64()),
            "session_start": pa.array(starts, type=pa.timestamp("us")),
            "n_events": pa.array(counts, type=pa.int64()),
        }
    )


def events_sessions(events):
    """events → per-user sessions split on >30 min inactivity gaps.

    Hash-shuffle on user_id then per-group sort + gap scan — the classic
    sessionization plan; per-user history must fit one group (holds for
    any realistic per-user event volume; salt by time-range if not).
    """
    return events.groupby("user_id").map_groups(
        _sessionize_group, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# documents: distinct-value counts (G3)
# ---------------------------------------------------------------------------

def _lang_partial(batch: pa.Table) -> pa.Table:
    counts = Counter(batch.column("lang").to_pylist())
    return pa.table(
        {
            "lang": pa.array(list(counts.keys()), type=pa.string()),
            "n": pa.array(list(counts.values()), type=pa.int64()),
        }
    )


def _lang_merge(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "lang": group.column("lang").slice(0, 1),
            "n_docs": pa.array(
                [sum(group.column("n").to_pylist())], type=pa.int64()
            ),
        }
    )


def lang_counts(docs):
    """documents → (lang, n_docs): two-phase distinct-value count."""
    partials = docs.map_batches(_lang_partial, batch_format="pyarrow")
    return partials.groupby("lang").map_groups(
        _lang_merge, batch_format="pyarrow"
    )
