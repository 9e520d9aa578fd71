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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# lineitem: two-phase grouped aggregate
# ---------------------------------------------------------------------------

_LINEITEM_PARTIAL_SCHEMA = pa.schema(
    [
        ("l_returnflag", pa.string()),
        ("l_linestatus", pa.string()),
        ("n", pa.int64()),
        ("sq", pa.float64()),
        ("mn", pa.float64()),
        ("mx", pa.float64()),
    ]
)


def _lineitem_partial(batch: pa.Table) -> pa.Table:
    """Map-side combine via Arrow's native ``Table.group_by`` (C++ hash
    aggregation, no Python loop over rows)."""
    if len(batch) == 0:
        return _LINEITEM_PARTIAL_SCHEMA.empty_table()
    qty = batch.column("l_quantity").cast(pa.float64())
    tbl = pa.table(
        {
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "q": qty,
        }
    )
    out = tbl.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [("q", "count"), ("q", "sum"), ("q", "min"), ("q", "max")]
    )
    return pa.table(
        {
            "l_returnflag": out.column("l_returnflag"),
            "l_linestatus": out.column("l_linestatus"),
            "n": out.column("q_count").cast(pa.int64()),
            "sq": out.column("q_sum"),
            "mn": out.column("q_min"),
            "mx": out.column("q_max"),
        }
    )


def lineitem_stats(lineitem):
    """lineitem → per (returnflag, linestatus) count/sum/min/max of quantity.

    Two-phase grouped aggregate, fully native: Arrow ``group_by`` map-side,
    Ray's Sum/Min/Max kernels on the (tiny) keyed merge.  ``l_quantity`` is
    integral in this corpus, so the float64 sum is exact and
    order-independent (every partial is < 2^53).
    """
    from ray.data.aggregate import Max, Min, Sum

    partials = lineitem.map_batches(_lineitem_partial, batch_format="pyarrow")
    merged = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("n"), Sum("sq"), Min("mn"), Max("mx")
    )
    return merged.rename_columns(
        {
            "sum(n)": "n_rows",
            "sum(sq)": "sum_qty",
            "min(mn)": "min_qty",
            "max(mx)": "max_qty",
        }
    ).select_columns(
        ["l_returnflag", "l_linestatus", "n_rows", "sum_qty", "min_qty", "max_qty"]
    )


# ---------------------------------------------------------------------------
# customer ⋈ nation: broadcast join + grouped count
# ---------------------------------------------------------------------------

class _NationJoiner:
    """Broadcast dict resolved once per actor; per batch the key counts are
    an Arrow ``value_counts`` (C++), and only the DISTINCT keys are mapped
    through the dict — cost scales with nations seen, not rows."""

    def __init__(self, nation_ref) -> None:
        import ray

        self.names: dict[int, str] = ray.get(nation_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "n_name": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        vc = pc.value_counts(batch.column("c_nationkey").combine_chunks())
        keys = vc.field("values").to_pylist()
        return pa.table(
            {
                "n_name": pa.array(
                    [self.names.get(k, "UNKNOWN") for k in keys],
                    type=pa.string(),
                ),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )


def customer_nation_counts(customer, nation_ref):
    """customer ⋈ nation (broadcast) → customers per nation name.

    The merge side is ≤ nations × blocks rows, so it collapses through
    the single-partition :func:`shuffle.hash_grouped` fast path (one
    clean block, one vectorized Arrow group_by) instead of Ray's native
    sort-based ``groupby().aggregate(Sum)`` — the same swap that took
    kg_links 14× faster (shuffle.py docstring)."""
    from ..shuffle import hash_grouped

    partials = customer.map_batches(
        _NationJoiner,
        fn_constructor_kwargs={"nation_ref": nation_ref},
        batch_format="pyarrow",
        concurrency=2,
    )
    return hash_grouped(
        partials,
        ["n_name"],
        [("n", "sum")],
        rename={"n_sum": "n_customers"},
        num_partitions=1,
    )


# ---------------------------------------------------------------------------
# events: tumbling-window per-user aggregate
# ---------------------------------------------------------------------------

_WINDOW_PARTIAL_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("window_start", pa.timestamp("us")),
        ("n", pa.int64()),
    ]
)


def _window_partial(batch: pa.Table) -> pa.Table:
    """Bucket timestamps to the hour (vectorized numpy), then a native
    Arrow grouped count per (user, window) — no Python loop over rows."""
    if len(batch) == 0:
        return _WINDOW_PARTIAL_SCHEMA.empty_table()
    ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    hour_start = (ts // 3_600_000_000) * 3_600_000_000
    tbl = pa.table(
        {
            "user_id": batch.column("user_id").cast(pa.int64()),
            "window_start": pa.array(hour_start, type=pa.timestamp("us")),
        }
    )
    out = tbl.group_by(["user_id", "window_start"]).aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {
            "user_id": out.column("user_id"),
            "window_start": out.column("window_start"),
            "n": out.column("count_all").cast(pa.int64()),
        }
    )


def _window_out(t):
    """Pin the window column to timestamp[us] on the way out: Ray's
    native aggregate can hand back a coarser temporal resolution, and
    the oracle comparison hashes dtypes as seen by pandas — emit exactly
    what the SQL twin (date_trunc → timestamp[us]) produces."""
    return pa.table(
        {
            "user_id": t.column("user_id").cast(pa.int64()),
            "window_start": t.column("window_start").cast(
                pa.timestamp("us")
            ),
            "n_events": t.column("n_events").cast(pa.int64()),
        }
    )


def events_tumbling(events):
    """events → per (user_id, 1-hour tumbling window) event counts.

    Map-side combine per block, then one :func:`shuffle.hash_grouped`
    exchange partitioned on user_id (window_start is a function of the
    row, but every (user, window) group shares its user_id, so the
    user partition wholly contains each group).  Partition count sizes
    to the data — the native sort-based ``groupby().aggregate(Sum)``
    this replaces cost a fixed multi-second exchange regardless of
    input size (r3 driver: 8.6 s for 100k events)."""
    from ..shuffle import hash_grouped, sized_partitions

    parts = sized_partitions(events.count(), None)
    partials = events.map_batches(_window_partial, batch_format="pyarrow")
    merged = hash_grouped(
        partials,
        ["user_id", "window_start"],
        [("n", "sum")],
        rename={"n_sum": "n_events"},
        hash_cols=["user_id"],
        num_partitions=parts,
    )
    return merged.map_batches(_window_out, batch_format="pyarrow")


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
    if len(batch) == 0:
        return pa.table(
            {
                "lang": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    vc = pc.value_counts(batch.column("lang").combine_chunks())
    return pa.table(
        {
            "lang": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        }
    )


def lang_counts(docs):
    """documents → (lang, n_docs): two-phase distinct-value count
    (Arrow ``value_counts`` per block, native Sum on the keyed merge)."""
    from ray.data.aggregate import Sum

    partials = docs.map_batches(_lang_partial, batch_format="pyarrow")
    return partials.groupby("lang").aggregate(Sum("n")).rename_columns(
        {"sum(n)": "n_docs"}
    )


# ---------------------------------------------------------------------------
# events: hopping-window (overlapping) per-user aggregate
# ---------------------------------------------------------------------------

HOP_SIZE_US = 60 * 60 * 1_000_000       # 1-hour windows
HOP_EVERY_US = 15 * 60 * 1_000_000      # hopping every 15 minutes


def _hopping_partial(
    batch: pa.Table,
    size_us: int = HOP_SIZE_US,
    hop_us: int = HOP_EVERY_US,
) -> pa.Table:
    """Each event lands in size/hop overlapping windows: vectorized
    repeat-assign (numpy), then a native Arrow grouped count per block."""
    if len(batch) == 0:
        return _WINDOW_PARTIAL_SCHEMA.empty_table()
    k = size_us // hop_us  # windows covering each event
    ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    users = batch.column("user_id").cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    last_start = (ts // hop_us) * hop_us
    offsets = (np.arange(k, dtype=np.int64) * hop_us)[None, :]
    starts = (last_start[:, None] - offsets).reshape(-1)
    keep = starts + size_us > np.repeat(ts, k)  # event inside the window
    tbl = pa.table(
        {
            "user_id": pa.array(np.repeat(users, k)[keep], type=pa.int64()),
            "window_start": pa.array(
                starts[keep], type=pa.timestamp("us")
            ),
        }
    )
    out = tbl.group_by(["user_id", "window_start"]).aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {
            "user_id": out.column("user_id"),
            "window_start": out.column("window_start"),
            "n": out.column("count_all").cast(pa.int64()),
        }
    )


def events_hopping(events):
    """events → per (user_id, hopping 1h/15min window) event counts.

    The overlapping-window aggregate: each event is assigned to its
    size/hop covering windows map-side (bounded 4× row expansion, already
    block-combined), then the same native grouped Sum as the tumbling
    plan.  No state, no sort — overlap is handled by multi-assignment,
    which is the scalable encoding of hopping windows.  Merge plan is
    :func:`events_tumbling`'s user-partitioned hash_grouped exchange.
    """
    from ..shuffle import hash_grouped, sized_partitions

    parts = sized_partitions(events.count() * 4, None)  # ≤4 windows/event
    partials = events.map_batches(_hopping_partial, batch_format="pyarrow")
    merged = hash_grouped(
        partials,
        ["user_id", "window_start"],
        [("n", "sum")],
        rename={"n_sum": "n_events"},
        hash_cols=["user_id"],
        num_partitions=parts,
    )
    return merged.map_batches(_window_out, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# grouped top-k: per-key ranking with map-side pruning
# ---------------------------------------------------------------------------


def _topk_kernel(batch: pa.Table, k: int) -> pa.Table:
    """(user_id, event_id, value) rows → per-user top-k by value (desc),
    ties broken by event_id (asc) so ranking is total and deterministic.

    One lexsort + one vectorized rank-within-group scan — no Python per
    group.  Used both map-side (per-batch prune: a batch's global top-k
    contribution is a subset of its local top-k) and as the exact
    per-partition finalizer after the key exchange.
    """
    if len(batch) == 0:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "event_id": pa.array([], type=pa.int64()),
                "value": pa.array([], type=pa.float64()),
                "rk": pa.array([], type=pa.int64()),
            }
        )
    u = batch.column("user_id").to_numpy(zero_copy_only=False)
    e = batch.column("event_id").to_numpy(zero_copy_only=False)
    v = batch.column("value").to_numpy(zero_copy_only=False)
    order = np.lexsort((e, -v, u))
    us = u[order]
    idx = np.arange(len(us))
    new_grp = np.concatenate(([True], us[1:] != us[:-1]))
    grp_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
    pos = idx - grp_start
    keep = pos < k
    sel = order[keep]
    return pa.table(
        {
            "user_id": pa.array(u[sel], type=pa.int64()),
            "event_id": pa.array(e[sel], type=pa.int64()),
            "value": pa.array(v[sel], type=pa.float64()),
            "rk": pa.array(pos[keep] + 1, type=pa.int64()),
        }
    )


def grouped_topk(events, k: int = 3, num_partitions: int | None = None):
    """events → per-user top-``k`` rows by value (``rk`` = 1-based rank).

    Classic per-key ranking Ray Data has no native operator for.  Plan:
    per-batch prune to local top-k (so at most k rows per (key, block)
    cross the exchange), hash-partition on the key, one exact vectorized
    finalizer per partition.  Equivalent to SQL
    ``row_number() OVER (PARTITION BY user_id ORDER BY value DESC,
    event_id) <= k`` — the DuckDB oracle.
    """
    from ..shuffle import hash_partitioned

    pruned = events.select_columns(
        ["user_id", "event_id", "value"]
    ).map_batches(
        lambda t: _topk_kernel(t, k).drop_columns(["rk"]),
        batch_format="pyarrow",
    )
    return hash_partitioned(
        pruned,
        ["user_id"],
        lambda block: _topk_kernel(block, k),
        num_partitions=num_partitions,
    )


# ---------------------------------------------------------------------------
# grouped exact quantiles (quantile_disc semantics)
# ---------------------------------------------------------------------------

QUANTILES = (0.25, 0.5, 0.75)


def _etype_hash_batch(batch: pa.Table) -> pa.Table:
    """Append an int64 md5 digest of the string key (the numeric column
    `shuffle.hash_partitioned` mixes); hashed once per DISTINCT value."""
    import hashlib

    vals = batch.column("event_type").to_pylist()
    cache: dict[str, int] = {}
    for s in set(vals):
        cache[s] = int.from_bytes(
            hashlib.md5(s.encode("utf-8")).digest()[:8], "big", signed=True
        )
    return batch.append_column(
        "etype_hash",
        pa.array([cache[s] for s in vals], type=pa.int64()),
    )


def _quantile_partition(block: pa.Table, qs: tuple) -> pa.Table:
    """One key partition → (event_type, n, q…) exact quantiles.

    ``quantile_disc`` convention (index ``ceil(q·n)−1``, validated
    against DuckDB): picks an EXISTING value — no interpolation
    arithmetic, so doubles compare bit-exactly with the SQL oracle.
    """
    if len(block) == 0:
        cols = {
            "event_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
        for q in qs:
            cols[f"p{int(q * 100)}"] = pa.array([], type=pa.float64())
        return pa.table(cols)
    et = np.asarray(block.column("event_type").to_pylist(), dtype=object)
    v = block.column("value").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, et))
    et_s, v_s = et[order], v[order]
    new_grp = np.concatenate(([True], et_s[1:] != et_s[:-1]))
    starts = np.flatnonzero(new_grp)
    ends = np.concatenate((starts[1:], [len(et_s)]))
    names = et_s[starts]
    ns = (ends - starts).astype(np.int64)
    cols = {
        "event_type": pa.array(names.tolist(), type=pa.string()),
        "n": pa.array(ns, type=pa.int64()),
    }
    for q in qs:
        idx = np.maximum(np.ceil(q * ns).astype(np.int64) - 1, 0)
        cols[f"p{int(q * 100)}"] = pa.array(v_s[starts + idx], type=pa.float64())
    return pa.table(cols)


def grouped_quantiles(
    events, qs: tuple = QUANTILES, num_partitions: int | None = None
):
    """events → per-event_type exact discrete quantiles of ``value``.

    Exact grouped quantiles require each key's full value set on one
    worker: the value column is exchanged per key (fine for
    moderate-per-key volumes; at extreme per-key cardinality switch to a
    mergeable sketch or pre-sample — documented contract, mirroring the
    sessionization operator's per-key-fits-one-partition assumption).
    Map-side the exchange carries only (key-hash, value): 12 bytes/row.
    """
    from ..shuffle import hash_partitioned

    keyed = events.select_columns(["event_type", "value"]).map_batches(
        _etype_hash_batch, batch_format="pyarrow"
    )
    return hash_partitioned(
        keyed,
        ["etype_hash"],
        lambda block: _quantile_partition(
            block.drop_columns(["etype_hash"]), qs
        ),
        num_partitions=num_partitions,
    )


# ---------------------------------------------------------------------------
# Q5-style multi-join: revenue by nation (lineitem ⋈ orders ⋈ customer ⋈ nation)
# ---------------------------------------------------------------------------

def _li_rev_partial(batch: pa.Table) -> pa.Table:
    """lineitem → (l_orderkey, fp, n) map-side combine.  Revenue is
    fixed-point int64 — cents × (100 − discount%), both factors exact
    after rounding the cents-granular doubles — so the distributed sum
    commutes bit-exactly and the final ``/ 10⁴`` division happens once,
    identically in both engines."""
    if len(batch) == 0:
        return pa.table(
            {
                "l_orderkey": pa.array([], type=pa.int64()),
                "fp": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
    disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
    fp = np.round(price * 100).astype(np.int64) * (
        100 - np.round(disc * 100).astype(np.int64)
    )
    t = pa.table(
        {
            "l_orderkey": batch.column("l_orderkey"),
            "fp": pa.array(fp, type=pa.int64()),
        }
    )
    out = t.group_by(["l_orderkey"]).aggregate(
        [("fp", "sum"), ([], "count_all")]
    )
    return pa.table(
        {
            "l_orderkey": out.column("l_orderkey"),
            "fp": out.column("fp_sum"),
            "n": out.column("count_all").cast(pa.int64()),
        }
    )


# Below this many orders+customer rows the Q5 dimension sides broadcast
# (one ray.put, read per actor) and lineitem is touched in a SINGLE
# streaming pass; above it the partitioned join chain takes over.  Same
# switch pattern as the kg edge-naming broadcast/join threshold.
REVENUE_BROADCAST_MAX_DIM_ROWS = 5_000_000


def revenue_by_nation(lineitem, orders, customer, nation_ref):
    """TPC-H Q5-shaped rollup: (nation, revenue, n_items) — revenue =
    Σ l_extendedprice·(1−l_discount) over lineitem ⋈ orders ⋈ customer
    ⋈ nation.

    Two plans behind a size switch (both bit-exact — fixed-point int64
    revenue sums commute):

    * **broadcast** (dimension sides ≤ ``REVENUE_BROADCAST_MAX_DIM_ROWS``
      rows): orders→custkey and customer→nationkey ship once as sorted
      int64 arrays via ``ray.put``; ONE streaming ``map_batches`` pass
      over lineitem resolves nationkey per row (two searchsorted probes)
      and emits ≤ nations rows per block — zero join exchanges.  At
      driver/bench scale the measured wall is exchange-latency-bound,
      so removing both exchanges is the whole win (r3's 18.5 s vs 9.9 s
      discrepancy was this plan's two sort exchanges under bench-session
      load).
    * **partitioned** (above threshold — real TPC-H orders don't fit a
      broadcast): three exchanges total, every aggregation folded INTO
      the join hops; lineitem combines per order in-block, the join
      output re-combines per customer in-block before the custkey join,
      and the (≤ nations × blocks) nation partials collapse through one
      grouped pass.  The big side is never re-shuffled wider than
      (key, fp, n).
    """
    n_dim = orders.count() + customer.count()
    if n_dim <= REVENUE_BROADCAST_MAX_DIM_ROWS:
        return _revenue_broadcast(lineitem, orders, customer, nation_ref)
    return _revenue_partitioned(lineitem, orders, customer, nation_ref)


def _lookup_sorted(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray):
    """FK resolve against a sorted key array: (values, found-mask)."""
    idx = np.searchsorted(keys, probe)
    idx_c = np.minimum(idx, len(keys) - 1) if len(keys) else idx
    found = (
        (idx < len(keys)) & (keys[idx_c] == probe)
        if len(keys)
        else np.zeros(len(probe), dtype=bool)
    )
    return vals[idx_c] if len(keys) else probe, found


class _NameResolver:
    """(c_nationkey, fp, n) → (nation, revenue, n_items): resolve names
    from the broadcast nation dict, divide the fixed-point sum once."""

    def __init__(self, nation_ref) -> None:
        import ray

        self.names: dict[int, str] = ray.get(nation_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0 or "c_nationkey" not in t.column_names:
            return pa.table(
                {
                    "nation": pa.array([], type=pa.string()),
                    "revenue": pa.array([], type=pa.float64()),
                    "n_items": pa.array([], type=pa.int64()),
                }
            )
        keys = t.column("c_nationkey").to_pylist()
        fp = t.column("fp").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nation": pa.array(
                    [self.names.get(k, "UNKNOWN") for k in keys],
                    type=pa.string(),
                ),
                "revenue": pa.array(
                    fp.astype(np.float64) / 10000.0, type=pa.float64()
                ),
                "n_items": t.column("n"),
            }
        )


class _RevBroadcast:
    """Stateful lineitem pass: fixed-point revenue per row, FK-resolve
    orderkey→custkey→nationkey via broadcast sorted arrays, in-block
    int64 group to ≤ nations rows.  Rows whose FK chain breaks are
    dropped — inner-join semantics, identical to the partitioned plan."""

    def __init__(self, dim_ref) -> None:
        import ray

        self.ok, self.oc, self.ck, self.cn = ray.get(dim_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "c_nationkey": pa.array([], type=pa.int64()),
                    "fp": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        fp = np.round(price * 100).astype(np.int64) * (
            100 - np.round(disc * 100).astype(np.int64)
        )
        okeys = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        cust, ok_found = _lookup_sorted(self.ok, self.oc, okeys)
        nat, ck_found = _lookup_sorted(self.ck, self.cn, cust)
        keep = ok_found & ck_found
        nat, fp = nat[keep], fp[keep]
        uniq, inv = np.unique(nat, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(acc, inv, fp)  # exact int64 accumulation
        return pa.table(
            {
                "c_nationkey": pa.array(uniq, type=pa.int64()),
                "fp": pa.array(acc, type=pa.int64()),
                "n": pa.array(
                    np.bincount(inv).astype(np.int64), type=pa.int64()
                ),
            }
        )


def _revenue_broadcast(lineitem, orders, customer, nation_ref):
    import ray

    from ..shuffle import hash_grouped

    ot = orders.select_columns(["o_orderkey", "o_custkey"]).to_pandas()
    ok = ot["o_orderkey"].to_numpy(dtype=np.int64)
    oc = ot["o_custkey"].to_numpy(dtype=np.int64)
    o = np.argsort(ok, kind="stable")
    ct = customer.select_columns(["c_custkey", "c_nationkey"]).to_pandas()
    ck = ct["c_custkey"].to_numpy(dtype=np.int64)
    cn = ct["c_nationkey"].to_numpy(dtype=np.int64)
    c = np.argsort(ck, kind="stable")
    dim_ref = ray.put((ok[o], oc[o], ck[c], cn[c]))
    partials = lineitem.map_batches(
        _RevBroadcast,
        fn_constructor_kwargs={"dim_ref": dim_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    per_nation = hash_grouped(
        partials,
        ["c_nationkey"],
        [("fp", "sum"), ("n", "sum")],
        rename={"fp_sum": "fp", "n_sum": "n"},
        num_partitions=1,
    )
    return per_nation.map_batches(
        _NameResolver,
        fn_constructor_kwargs={"nation_ref": nation_ref},
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


def _revenue_partitioned(lineitem, orders, customer, nation_ref):
    import ray

    from ..shuffle import hash_grouped, local_hash_join, sized_partitions

    # the joins move one (key, fp, n) partial row per block×key;
    # lineitem.count() on a parquet read is metadata-only, so sizing
    # the plan to the fact table is free
    parts = sized_partitions(lineitem.count(), None)
    li = lineitem.map_batches(_li_rev_partial, batch_format="pyarrow")
    ord_keys = orders.select_columns(["o_orderkey", "o_custkey"]).rename_columns(
        {"o_orderkey": "l_orderkey"}
    )
    li_cust = local_hash_join(
        li,
        ord_keys,
        on=["l_orderkey"],
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("fp", pa.int64()),
             ("n", pa.int64())]
        ),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("o_custkey", pa.int64())]
        ),
        how="inner",
        num_partitions=parts,
    )

    def _cust_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "o_custkey" not in t.column_names:
            return pa.table(
                {
                    "o_custkey": pa.array([], type=pa.int64()),
                    "fp": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        out = t.group_by(["o_custkey"]).aggregate(
            [("fp", "sum"), ("n", "sum")]
        )
        return pa.table(
            {
                "o_custkey": out.column("o_custkey"),
                "fp": out.column("fp_sum"),
                "n": out.column("n_sum"),
            }
        )

    cust_keys = customer.select_columns(
        ["c_custkey", "c_nationkey"]
    ).rename_columns({"c_custkey": "o_custkey"})
    per_nationkey = local_hash_join(
        li_cust.map_batches(_cust_partial, batch_format="pyarrow"),
        cust_keys,
        on=["o_custkey"],
        left_schema=pa.schema(
            [("o_custkey", pa.int64()), ("fp", pa.int64()),
             ("n", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_custkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
        how="inner",
        num_partitions=parts,
    )

    def _nat_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "c_nationkey" not in t.column_names:
            return pa.table(
                {
                    "c_nationkey": pa.array([], type=pa.int64()),
                    "fp": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        out = t.group_by(["c_nationkey"]).aggregate(
            [("fp", "sum"), ("n", "sum")]
        )
        return pa.table(
            {
                "c_nationkey": out.column("c_nationkey"),
                "fp": out.column("fp_sum"),
                "n": out.column("n_sum"),
            }
        )

    # ≤ nations × blocks partial rows — one tiny grouped pass
    per_nation = hash_grouped(
        per_nationkey.map_batches(_nat_partial, batch_format="pyarrow"),
        ["c_nationkey"],
        [("fp", "sum"), ("n", "sum")],
        rename={"fp_sum": "fp", "n_sum": "n"},
        num_partitions=1,
    )

    return per_nation.map_batches(
        _NameResolver,
        fn_constructor_kwargs={"nation_ref": nation_ref},
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


# ---------------------------------------------------------------------------
# events: funnel conversion and cohort retention (behavioral analytics)
# ---------------------------------------------------------------------------

FUNNEL_FROM = "signup"
FUNNEL_TO = "purchase"
FUNNEL_WINDOW_US = 7 * 86_400 * 1_000_000  # 7 days
RETENTION_MAX_DAY = 7
_DAY_US = 86_400 * 1_000_000


def events_funnel(events):
    """events → one row per CONVERTED user of the signup→purchase
    funnel: (user_id, signup_us, purchase_us, lag_us) where signup_us is
    the user's first signup, purchase_us the first purchase at-or-after
    it, and the lag is within ``FUNNEL_WINDOW_US``.  All arithmetic is
    int64 epoch-µs, so the SQL twin matches exactly.

    Plan: per-block (user, min signup) combine → one user-keyed Min
    exchange (the funnel anchor table, ≤ one row per user) → padded
    int64 join of the anchors onto the purchase stream → at-or-after
    filter → second user-keyed Min exchange → stateless lag filter.
    Events stream through twice (two pruned scans); nothing is
    broadcast and no per-user history is ever collected in one place —
    unlike sessionization, the funnel needs only two scalars per user.
    """
    import pyarrow.compute as pc

    from ..shuffle import hash_grouped, local_hash_join, sized_partitions

    parts = sized_partitions(events.count(), None)

    def min_ts_partial(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            sel = t.filter(pc.equal(t.column("event_type"), kind))
            out = (
                pa.table(
                    {
                        "user_id": sel.column("user_id"),
                        "us": sel.column("ts").cast(pa.int64()),
                    }
                )
                .group_by(["user_id"])
                .aggregate([("us", "min")])
            )
            return pa.table(
                {
                    "user_id": out.column("user_id"),
                    "us": out.column("us_min"),
                }
            )

        return fn

    signup = hash_grouped(
        events.map_batches(
            min_ts_partial(FUNNEL_FROM), batch_format="pyarrow"
        ),
        ["user_id"],
        [("us", "min")],
        rename={"us_min": "signup_us"},
        num_partitions=parts,
    )
    # purchases must stay UN-combined until the at-or-after filter: a
    # block-level min could keep only a pre-signup purchase and drop the
    # user's valid later one.  Project to two int64 columns only.
    def purch_rows(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("event_type"), FUNNEL_TO))
        return pa.table(
            {
                "user_id": sel.column("user_id"),
                "us": sel.column("ts").cast(pa.int64()),
            }
        )

    purch = events.map_batches(purch_rows, batch_format="pyarrow")
    joined = local_hash_join(
        purch,
        signup,
        on=["user_id"],
        left_schema=pa.schema([("user_id", pa.int64()), ("us", pa.int64())]),
        right_schema=pa.schema(
            [("user_id", pa.int64()), ("signup_us", pa.int64())]
        ),
        how="inner",
        num_partitions=parts,
    )

    def after_filter(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "us" not in t.column_names:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "signup_us": pa.array([], type=pa.int64()),
                    "us": pa.array([], type=pa.int64()),
                }
            )
        kept = t.filter(
            pc.greater_equal(t.column("us"), t.column("signup_us"))
        )
        # block-level combine is safe AFTER the at-or-after filter
        out = kept.group_by(["user_id", "signup_us"]).aggregate(
            [("us", "min")]
        )
        return pa.table(
            {
                "user_id": out.column("user_id"),
                "signup_us": out.column("signup_us"),
                "us": out.column("us_min"),
            }
        )

    first_purch = hash_grouped(
        joined.map_batches(after_filter, batch_format="pyarrow"),
        ["user_id", "signup_us"],
        [("us", "min")],
        rename={"us_min": "purchase_us"},
        num_partitions=parts,
    )

    def lag_out(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "purchase_us" not in t.column_names:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "signup_us": pa.array([], type=pa.int64()),
                    "purchase_us": pa.array([], type=pa.int64()),
                    "lag_us": pa.array([], type=pa.int64()),
                }
            )
        lag = pc.subtract(t.column("purchase_us"), t.column("signup_us"))
        out = pa.table(
            {
                "user_id": t.column("user_id"),
                "signup_us": t.column("signup_us"),
                "purchase_us": t.column("purchase_us"),
                "lag_us": lag,
            }
        )
        return out.filter(
            pc.less_equal(out.column("lag_us"), FUNNEL_WINDOW_US)
        )

    return first_purch.map_batches(lag_out, batch_format="pyarrow")


def sql_events_funnel() -> str:
    """DuckDB twin of :func:`events_funnel`."""
    return f"""
        WITH s AS (
          SELECT user_id, min(epoch_us(ts))::BIGINT AS signup_us
          FROM events WHERE event_type = '{FUNNEL_FROM}'
          GROUP BY user_id),
        p AS (
          SELECT e.user_id, s.signup_us,
                 min(epoch_us(e.ts))::BIGINT AS purchase_us
          FROM events e JOIN s ON s.user_id = e.user_id
          WHERE e.event_type = '{FUNNEL_TO}'
            AND epoch_us(e.ts) >= s.signup_us
          GROUP BY e.user_id, s.signup_us)
        SELECT user_id, signup_us, purchase_us,
               (purchase_us - signup_us)::BIGINT AS lag_us
        FROM p
        WHERE purchase_us - signup_us <= {FUNNEL_WINDOW_US}
    """


def events_retention(events):
    """events → (cohort_day, k, n_users) cohort retention triangle:
    users cohorted by their first-seen day (any event type), counted
    once per later activity day offset ``k`` ∈ [0, RETENTION_MAX_DAY].
    Day arithmetic is integer (epoch-µs // day), so the twin is exact.

    Plan: per-block (user, min day) combine → user-keyed Min exchange
    (cohort anchor per user) → padded join of anchors onto the event
    stream (user-keyed, at scale the anchor table co-partitions with
    events rather than broadcasting) → distinct (cohort, k, user) rows
    via one grouped exchange → per-(cohort, k) count.
    """
    import pyarrow.compute as pc

    from ..shuffle import hash_grouped, local_hash_join, sized_partitions

    parts = sized_partitions(events.count(), None)

    def day_partial(t: pa.Table) -> pa.Table:
        days = pc.divide(
            t.column("ts").cast(pa.int64()), pa.scalar(_DAY_US, pa.int64())
        )
        out = (
            pa.table({"user_id": t.column("user_id"), "day": days})
            .group_by(["user_id"])
            .aggregate([("day", "min")])
        )
        return pa.table(
            {
                "user_id": out.column("user_id"),
                "day": out.column("day_min"),
            }
        )

    cohort = hash_grouped(
        events.map_batches(day_partial, batch_format="pyarrow"),
        ["user_id"],
        [("day", "min")],
        rename={"day_min": "cohort_day"},
        num_partitions=parts,
    )

    def day_rows(t: pa.Table) -> pa.Table:
        days = pc.divide(
            t.column("ts").cast(pa.int64()), pa.scalar(_DAY_US, pa.int64())
        )
        return (
            pa.table({"user_id": t.column("user_id"), "day": days})
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    joined = local_hash_join(
        events.map_batches(day_rows, batch_format="pyarrow"),
        cohort,
        on=["user_id"],
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("day", pa.int64())]
        ),
        right_schema=pa.schema(
            [("user_id", pa.int64()), ("cohort_day", pa.int64())]
        ),
        how="inner",
        num_partitions=parts,
    )

    def k_rows(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_day": pa.array([], type=pa.int64()),
                "k": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0 or "day" not in t.column_names:
            return empty
        k = pc.subtract(t.column("day"), t.column("cohort_day"))
        out = pa.table(
            {
                "cohort_day": t.column("cohort_day"),
                "k": k,
                "user_id": t.column("user_id"),
            }
        ).filter(pc.less_equal(k, RETENTION_MAX_DAY))
        return out.group_by(["cohort_day", "k", "user_id"]).aggregate([])

    distinct = hash_grouped(
        joined.map_batches(k_rows, batch_format="pyarrow"),
        ["cohort_day", "k", "user_id"],
        [],
        hash_cols=["user_id"],
        num_partitions=parts,
    )

    def count_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "cohort_day" not in t.column_names:
            return pa.table(
                {
                    "cohort_day": pa.array([], type=pa.int64()),
                    "k": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        out = t.group_by(["cohort_day", "k"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "cohort_day": out.column("cohort_day"),
                "k": out.column("k"),
                "n": out.column("count_all").cast(pa.int64()),
            }
        )

    return hash_grouped(
        distinct.map_batches(count_partial, batch_format="pyarrow"),
        ["cohort_day", "k"],
        [("n", "sum")],
        rename={"n_sum": "n_users"},
        hash_cols=["cohort_day"],
        num_partitions=parts,
    )


def sql_events_retention() -> str:
    """DuckDB twin of :func:`events_retention`."""
    return f"""
        WITH d AS (
          SELECT user_id,
                 (epoch_us(ts) // {_DAY_US})::BIGINT AS day
          FROM events),
        c AS (SELECT user_id, min(day)::BIGINT AS cohort_day
              FROM d GROUP BY user_id),
        act AS (
          SELECT DISTINCT c.cohort_day, (d.day - c.cohort_day)::BIGINT AS k,
                 d.user_id
          FROM d JOIN c ON c.user_id = d.user_id
          WHERE d.day - c.cohort_day <= {RETENTION_MAX_DAY})
        SELECT cohort_day, k, count(*)::BIGINT AS n_users
        FROM act GROUP BY cohort_day, k
    """


ZSCORE_OUTLIER = 2.0


def events_zscores(events):
    """events → (event_id, event_type, z, is_outlier): per-type
    standard-score outlier detection over the ``value`` column — the
    data-quality pass that flags anomalous purchases/errors before a
    metric rollup trusts them.

    Exactness: values carry 2 decimals, so ``round(value·100)`` recovers
    exact integer cents on both engines; per-type moments (n, Σc, Σc²)
    are commutative int64 sums; mean/variance/σ/z are then ONE fixed
    float expression of those integers (σ via libm sqrt = DuckDB sqrt)
    — the float columns hash-match the oracle.

    Plan: per-block moment combine → one tiny grouped Sum (≤ one row
    per event type) → the constant-size stats table broadcast via
    ``ray.put`` → stateless scoring map over the stream.  The classic
    small-side-broadcast shape: the corpus is never re-shuffled."""
    import math

    import ray

    from ..shuffle import hash_grouped

    def moment_partial(t: pa.Table) -> pa.Table:
        cents = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        tb = pa.table(
            {
                "event_type": t.column("event_type"),
                "one": pa.array(np.ones(len(t), dtype=np.int64)),
                "c": pa.array(cents, type=pa.int64()),
                "c2": pa.array(cents * cents, type=pa.int64()),
            }
        )
        out = tb.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("c", "sum"), ("c2", "sum")]
        )
        return pa.table(
            {
                "event_type": out.column("event_type"),
                "n": out.column("one_sum"),
                "c": out.column("c_sum"),
                "c2": out.column("c2_sum"),
            }
        )

    stats = hash_grouped(
        events.map_batches(moment_partial, batch_format="pyarrow"),
        ["event_type"],
        [("n", "sum"), ("c", "sum"), ("c2", "sum")],
        rename={"n_sum": "n", "c_sum": "c", "c2_sum": "c2"},
        hash_cols=[],
        num_partitions=1,
    ).take_all()  # ≤ one row per event type: constant-size driver state
    lut = {}
    for r in stats:
        n, c, c2 = int(r["n"]), int(r["c"]), int(r["c2"])
        mean = float(c) / float(n)
        var = float(c2) / float(n) - mean * mean
        lut[r["event_type"]] = (mean, math.sqrt(var) if var > 0 else 0.0)
    lut_ref = ray.put(lut)

    class Scorer:
        def __init__(self, ref) -> None:
            self.lut = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            cents = np.rint(
                t.column("value").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            types = t.column("event_type").to_pylist()
            z = np.empty(len(t), dtype=np.float64)
            for i, (ty, c) in enumerate(zip(types, cents)):
                mean, std = self.lut[ty]
                z[i] = (float(c) - mean) / std if std > 0.0 else 0.0
            return pa.table(
                {
                    "event_id": t.column("event_id"),
                    "event_type": t.column("event_type"),
                    "z": pa.array(z, type=pa.float64()),
                    "is_outlier": pa.array(
                        np.abs(z) > ZSCORE_OUTLIER, type=pa.bool_()
                    ),
                }
            )

    return events.select_columns(
        ["event_id", "event_type", "value"]
    ).map_batches(
        Scorer, fn_constructor_kwargs={"ref": lut_ref},
        batch_format="pyarrow", concurrency=(1, 4),
    )


def sql_events_zscores() -> str:
    """DuckDB twin of :func:`events_zscores` (identical integer moments
    and float op order)."""
    return f"""
        WITH c AS (
          SELECT event_id, event_type,
                 round(value * 100)::BIGINT AS cents
          FROM events),
        m AS (
          SELECT event_type, count(*)::BIGINT AS n,
                 sum(cents)::BIGINT AS sc,
                 sum(cents * cents)::BIGINT AS sc2
          FROM c GROUP BY event_type),
        s AS (
          SELECT event_type,
                 sc::DOUBLE / n::DOUBLE AS mean,
                 CASE WHEN (sc2::DOUBLE / n::DOUBLE
                            - (sc::DOUBLE / n::DOUBLE)
                              * (sc::DOUBLE / n::DOUBLE)) > 0
                      THEN sqrt(sc2::DOUBLE / n::DOUBLE
                                - (sc::DOUBLE / n::DOUBLE)
                                  * (sc::DOUBLE / n::DOUBLE))
                      ELSE 0.0 END AS std
          FROM m)
        SELECT c.event_id, c.event_type,
               CASE WHEN s.std > 0.0
                    THEN (c.cents::DOUBLE - s.mean) / s.std
                    ELSE 0.0 END AS z,
               (abs(CASE WHEN s.std > 0.0
                         THEN (c.cents::DOUBLE - s.mean) / s.std
                         ELSE 0.0 END) > {ZSCORE_OUTLIER!r}) AS is_outlier
        FROM c JOIN s ON s.event_type = c.event_type
    """
