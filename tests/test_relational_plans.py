"""Plan-switch equality for the relational operators: the broadcast and
partitioned revenue plans must be bit-identical (fixed-point sums
commute), and the hash_grouped window merges must match a pandas
reference regardless of partition count."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from promptner_ray.functions import relational


def _tpch_mini(seed: int = 3):
    rng = np.random.RandomState(seed)
    n_li, n_ord, n_cust, n_nat = 3000, 800, 120, 7
    orders = pa.table(
        {
            "o_orderkey": pa.array(
                np.arange(1, n_ord + 1, dtype=np.int64)
            ),
            "o_custkey": pa.array(
                rng.randint(1, n_cust + 1, n_ord).astype(np.int64)
            ),
        }
    )
    customer = pa.table(
        {
            "c_custkey": pa.array(
                np.arange(1, n_cust + 1, dtype=np.int64)
            ),
            "c_nationkey": pa.array(
                rng.randint(0, n_nat, n_cust).astype(np.int64)
            ),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(
                rng.randint(1, n_ord + 1, n_li).astype(np.int64)
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(10, 9000, n_li), 2)
            ),
            "l_discount": pa.array(
                np.round(rng.uniform(0, 0.1, n_li), 2)
            ),
        }
    )
    names = {k: f"NATION_{k}" for k in range(n_nat)}
    return lineitem, orders, customer, names


def _run_revenue(lineitem, orders, customer, names) -> pd.DataFrame:
    return (
        relational.revenue_by_nation(
            ray.data.from_arrow(lineitem),
            ray.data.from_arrow(orders),
            ray.data.from_arrow(customer),
            ray.put(names),
        )
        .to_pandas()
        .sort_values("nation", ignore_index=True)
    )


def test_revenue_broadcast_and_partitioned_plans_identical(
    ray_session, monkeypatch
):
    lineitem, orders, customer, names = _tpch_mini()
    broadcast = _run_revenue(lineitem, orders, customer, names)
    monkeypatch.setattr(relational, "REVENUE_BROADCAST_MAX_DIM_ROWS", 0)
    partitioned = _run_revenue(lineitem, orders, customer, names)
    assert broadcast.equals(partitioned)
    # sanity vs a pandas replay of the same fixed-point chain
    li = lineitem.to_pandas()
    fp = np.round(li.l_extendedprice * 100).astype(np.int64) * (
        100 - np.round(li.l_discount * 100).astype(np.int64)
    )
    li = li.assign(fp=fp).merge(
        orders.to_pandas(), left_on="l_orderkey", right_on="o_orderkey"
    ).merge(
        customer.to_pandas(), left_on="o_custkey", right_on="c_custkey"
    )
    want = (
        li.groupby("c_nationkey")
        .agg(fp=("fp", "sum"), n_items=("fp", "size"))
        .reset_index()
    )
    want["nation"] = want.c_nationkey.map(names)
    want["revenue"] = want.fp.astype(np.float64) / 10000.0
    want = want[["nation", "revenue", "n_items"]].sort_values(
        "nation", ignore_index=True
    )
    assert broadcast.equals(want)


def test_revenue_broadcast_drops_broken_fk_rows(ray_session):
    """Inner-join semantics: a lineitem row whose orderkey has no order,
    or whose order has no customer, contributes nothing (both plans)."""
    lineitem, orders, customer, names = _tpch_mini()
    ghost = pa.table(
        {
            "l_orderkey": pa.array([999_999], type=pa.int64()),
            "l_extendedprice": pa.array([100.0]),
            "l_discount": pa.array([0.0]),
        }
    )
    with_ghost = _run_revenue(
        pa.concat_tables([lineitem, ghost]), orders, customer, names
    )
    clean = _run_revenue(lineitem, orders, customer, names)
    assert with_ghost.equals(clean)


def test_events_tumbling_matches_pandas(ray_session):
    rng = np.random.RandomState(11)
    n = 5000
    ts = pd.Timestamp("2024-05-01").value // 1000 + rng.randint(
        0, 72 * 3600 * 1_000_000, n
    )
    events = pa.table(
        {
            "user_id": pa.array(
                rng.randint(1, 50, n).astype(np.int64)
            ),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    got = (
        relational.events_tumbling(ray.data.from_arrow(events))
        .to_pandas()
        .sort_values(["user_id", "window_start"], ignore_index=True)
    )
    df = events.to_pandas()
    df["window_start"] = df.ts.dt.floor("h")
    want = (
        df.groupby(["user_id", "window_start"])
        .size()
        .rename("n_events")
        .reset_index()
        .sort_values(["user_id", "window_start"], ignore_index=True)
    )
    assert got.user_id.tolist() == want.user_id.tolist()
    assert got.n_events.tolist() == want.n_events.tolist()
    assert (
        got.window_start.astype("datetime64[us]")
        == want.window_start.astype("datetime64[us]")
    ).all()


def _events_tbl(rows):
    """rows: (user_id, event_type, ts_us)."""
    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array(
                [r[2] for r in rows], type=pa.timestamp("us")
            ),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([0.0] * len(rows), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )


def test_events_funnel_pre_signup_purchase_not_lost(ray_session):
    DAY = 86_400 * 1_000_000
    rows = [
        # user 1: purchase BEFORE signup, then a valid one after — the
        # pre-signup row must not shadow the later conversion (this is
        # the trap a block-level pre-filter min would fall into)
        (1, "purchase", 1 * DAY),
        (1, "signup", 2 * DAY),
        (1, "purchase", 3 * DAY),
        # user 2: purchase only before signup → no conversion
        (2, "purchase", 1 * DAY),
        (2, "signup", 5 * DAY),
        # user 3: converts outside the 7-day window → excluded
        (3, "signup", 1 * DAY),
        (3, "purchase", 10 * DAY),
        # user 4: same-microsecond signup and purchase → lag 0 converts
        (4, "signup", 4 * DAY),
        (4, "purchase", 4 * DAY),
    ]
    # one row per block to force the worst-case blocking
    ds = ray.data.from_arrow(_events_tbl(rows)).repartition(len(rows))
    out = (
        relational.events_funnel(ds)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(out.index) == [1, 4]
    assert out.loc[1, "lag_us"] == DAY
    assert out.loc[4, "lag_us"] == 0


def test_events_retention_cohorts(ray_session):
    DAY = 86_400 * 1_000_000
    rows = [
        # two users cohorted on day 0; one returns day 1, both day 2
        (1, "click", 0),
        (2, "click", 10),
        (1, "click", 1 * DAY + 5),
        (1, "click", 2 * DAY),
        (2, "click", 2 * DAY + 7),
        # day-9 activity falls outside RETENTION_MAX_DAY
        (1, "click", 9 * DAY),
        # a second cohort on day 3
        (3, "click", 3 * DAY),
    ]
    ds = ray.data.from_arrow(_events_tbl(rows)).repartition(4)
    out = relational.events_retention(ds).to_pandas()
    d = {
        (int(r.cohort_day), int(r.k)): int(r.n_users)
        for r in out.itertuples()
    }
    assert d == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (3, 0): 1}
