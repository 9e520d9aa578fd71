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
