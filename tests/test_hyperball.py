"""HyperBall neighborhood-function estimation: DuckDB-twin equality
(bit-exact, float column included), accuracy vs exact ball sizes, and
the isolated-node / sink edge cases."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray

from promptner_ray.functions.hyperball import hyperball, sql_hyperball


def _edges(pairs):
    return pa.table(
        {
            "subj_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "obj_id": pa.array([p[1] for p in pairs], type=pa.int64()),
        }
    )


def _run(tbl, iters):
    return (
        hyperball(ray.data.from_arrow(tbl), iters=iters)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )


def test_hyperball_matches_duckdb_bit_exact(ray_session) -> None:
    rng = np.random.default_rng(3)
    pairs = sorted(
        {(int(s), int(t)) for s, t in rng.integers(0, 100, size=(400, 2))}
    )
    tbl = _edges(pairs)
    got = _run(tbl, iters=3)
    con = duckdb.connect()
    con.register("edges_in", tbl)
    want = (
        con.execute(
            sql_hyperball(
                "e2 AS (SELECT subj_id, obj_id FROM edges_in)", iters=3
            )
            + " ORDER BY entity_id"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got.equals(want)  # including the DOUBLE column, bitwise


def test_hyperball_accuracy_vs_exact_balls(ray_session) -> None:
    """p = 4 promises ~26% standard error; gate the mean relative error
    well inside the disclosed envelope on a 100-node random digraph."""
    rng = np.random.default_rng(3)
    pairs = sorted(
        {(int(s), int(t)) for s, t in rng.integers(0, 100, size=(400, 2))}
    )
    got = _run(_edges(pairs), iters=3)
    adj: dict[int, set] = {}
    for s, t in pairs:
        adj.setdefault(s, set()).add(t)

    def ball(v: int, h: int) -> int:
        cur = {v}
        for _ in range(h):
            cur = cur | {w for u in cur for w in adj.get(u, ())}
        return len(cur)

    rel = [
        abs(r.ball_est - ball(r.entity_id, 3)) / ball(r.entity_id, 3)
        for r in got.itertuples()
    ]
    assert float(np.mean(rel)) < 0.25
    assert float(np.max(rel)) < 0.8


def test_hyperball_sink_estimates_one(ray_session) -> None:
    """A sink's ball is exactly {itself}: one nonzero register, V = 15,
    linear counting → 16·ln(16/15) ≈ 1.03 for EVERY such node."""
    import math

    got = _run(_edges([(1, 2), (3, 2)]), iters=4)
    sink = got[got.entity_id == 2].iloc[0]
    assert sink["ball_est"] == 16.0 * math.log(16.0 / 15)
    # the two sources see {self, 2}: their estimates can't drop below
    # the sink's (>=, not >: ids 1 and 2 happen to share a register, a
    # legitimate HLL collision that keeps V at 15)
    assert (got[got.entity_id != 2]["ball_est"] >= sink["ball_est"]).all()
    assert got[got.entity_id == 3].iloc[0]["ball_est"] > sink["ball_est"]


def test_harmonic_matches_duckdb_bit_exact(ray_session) -> None:
    from promptner_ray.functions.hyperball import (
        harmonic_centrality,
        sql_harmonic,
    )

    rng = np.random.default_rng(5)
    pairs = sorted(
        {(int(s), int(t)) for s, t in rng.integers(0, 90, size=(350, 2))}
    )
    tbl = _edges(pairs)
    got = (
        harmonic_centrality(ray.data.from_arrow(tbl), iters=3)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("edges_in", tbl)
    want = (
        con.execute(
            sql_harmonic(
                "e2 AS (SELECT subj_id, obj_id FROM edges_in)", iters=3
            )
            + " ORDER BY entity_id"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got.equals(want)  # DOUBLE column bitwise


def test_harmonic_accuracy_and_directionality(ray_session) -> None:
    """A chain 0→3→4 (ids chosen to land in three DISTINCT registers —
    colliding ids would legitimately leave a sketch unchanged): node 4
    is reached by 0 (dist 2) and 3 (dist 1), node 3 by 0 only, node 0
    by nobody → H must be exactly 0 there (e0 == e_h telescopes away),
    and strictly ordered 4 > 3 > 0."""
    from promptner_ray.functions.hyperball import harmonic_centrality

    got = {
        r.entity_id: r.harmonic
        for r in harmonic_centrality(
            ray.data.from_arrow(_edges([(0, 3), (3, 4)])), iters=4
        )
        .to_pandas()
        .itertuples()
    }
    assert got[0] == 0.0
    assert got[4] > got[3] > got[0]


def test_effective_diameter_chain(ray_session) -> None:
    import ray

    from promptner_ray.functions.hyperball import effective_diameter

    # directed chain 0→1→2→3: NF(0)=4, NF(1)=7, NF(2)=9, NF(3)=10
    # (exact; HLL linear counting is exact at these ball sizes unless
    # register collisions — the assertions below are structural).
    edges = pa.table(
        {
            "subj_id": pa.array([0, 1, 2], type=pa.int64()),
            "pred": pa.array(["p"] * 3),
            "obj_id": pa.array([1, 2, 3], type=pa.int64()),
            "weight": pa.array([1, 1, 1], type=pa.int64()),
        }
    )
    out = (
        effective_diameter(ray.data.from_arrow(edges), iters=3)
        .to_pandas()
        .sort_values("h", ignore_index=True)
    )
    assert list(out["h"]) == [0, 1, 2, 3]
    nf = list(out["nf"])
    assert all(b >= a for a, b in zip(nf, nf[1:]))  # NF is monotone
    d = out["d_eff"].iloc[0]
    assert (out["d_eff"] == d).all()
    assert 0.0 <= d <= 3.0
    # 90% of NF(3) falls strictly inside the growth range → interpolated
    assert d > 0.0


def _exact_balls(pairs, iters: int):
    adj: dict[int, set] = {}
    nodes = set()
    for s, t in pairs:
        adj.setdefault(s, set()).add(t)
        nodes.add(s)
        nodes.add(t)

    def ball(v: int) -> int:
        cur = {v}
        for _ in range(iters):
            cur = cur | {w for u in cur for w in adj.get(u, ())}
        return len(cur)

    return {v: ball(v) for v in nodes}


def test_hyperball_accuracy_gate_at_p6_and_p8(ray_session) -> None:
    """The precision knob's contract: standard error 1.04/√m.  Gate the
    mean relative error at p=6 (m=64, ±13%) and p=8 (m=256, ±6.5%)
    INSIDE those envelopes on a 150-node random digraph, and require
    each step up in p to shrink the error (the whole point of the
    knob).  Everything is hash-deterministic — no flakiness."""
    from promptner_ray.functions.hyperball import hyperball

    rng = np.random.default_rng(7)
    pairs = sorted(
        {(int(s), int(t)) for s, t in rng.integers(0, 150, size=(700, 2))}
    )
    exact = _exact_balls(pairs, 3)
    tbl = _edges(pairs)
    errs = {}
    for p in (4, 6, 8):
        got = (
            hyperball(ray.data.from_arrow(tbl), iters=3, p=p)
            .to_pandas()
            .set_index("entity_id")["ball_est"]
        )
        rel = [
            abs(got[v] - exact[v]) / exact[v] for v in exact if exact[v] > 0
        ]
        errs[p] = float(np.mean(rel))
    assert errs[6] < 0.13, errs
    assert errs[8] < 0.065, errs
    assert errs[8] < errs[6] < errs[4], errs


def test_hyperball_p6_matches_duckdb_bit_exact(ray_session) -> None:
    """The SQL twin parameterizes with p: engine and DuckDB replay the
    identical register split, max rounds, and estimate expression at
    p=6, bit for bit (DOUBLE column included)."""
    rng = np.random.default_rng(11)
    pairs = sorted(
        {(int(s), int(t)) for s, t in rng.integers(0, 80, size=(300, 2))}
    )
    tbl = _edges(pairs)
    got = (
        hyperball(ray.data.from_arrow(tbl), iters=3, p=6)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("edges_in", tbl)
    want = (
        con.execute(
            sql_hyperball(
                "e2 AS (SELECT subj_id, obj_id FROM edges_in)",
                iters=3,
                p=6,
            )
            + " ORDER BY entity_id"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_hyperball_bsp_p6_matches_dataflow(ray_session) -> None:
    """The BSP message format parameterizes with p: at p=6 the systolic
    plan must be bit-identical to the dataflow twin (register max
    commutes at any width)."""
    from promptner_ray.functions.graphbsp import hyperball_bsp

    rng = np.random.default_rng(13)
    pairs = sorted(
        {(int(s), int(t)) for s, t in rng.integers(0, 70, size=(260, 2))}
    )
    tbl = _edges(pairs)
    want = (
        hyperball(ray.data.from_arrow(tbl), iters=3, p=6)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    got = (
        hyperball_bsp(ray.data.from_arrow(tbl), iters=3, p=6)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    assert want.equals(got)


def test_hyperball_p6_distributed_rounds_match_local(
    ray_session, monkeypatch
) -> None:
    """The tail-local gate hides the distributed rounds at test scale;
    force them (gate → 0) and require bit-equality with the local path
    at p=6 — the same both-paths discipline as the p=4 suite."""
    import promptner_ray.functions.hyperball as hb

    rng = np.random.default_rng(17)
    pairs = sorted(
        {(int(s), int(t)) for s, t in rng.integers(0, 60, size=(200, 2))}
    )
    tbl = _edges(pairs)
    local = (
        hb.hyperball(ray.data.from_arrow(tbl), iters=3, p=6)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(hb, "HB_LOCAL_EDGES", 0)
    dist = (
        hb.hyperball(ray.data.from_arrow(tbl), iters=3, p=6)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    assert local.equals(dist)
