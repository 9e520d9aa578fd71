"""Distributed PageRank vs the single-process numpy reference (the
connected-components operator is pinned by its DuckDB recursive-CTE
oracle in test_oracle_parity)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from promptner_ray.functions.graphops import pagerank


def _numpy_pagerank(edges, iters=8, d=0.85):
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    wout = np.zeros(n)
    for s, _, w in edges:
        wout[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[wout == 0].sum()
        c = np.zeros(n)
        for s, t, w in edges:
            c[idx[t]] += r[idx[s]] * w / wout[idx[s]]
        r = (1 - d) / n + d * (c + dang / n)
    return dict(zip(nodes, r))


def _edge_table(edges):
    return pa.table(
        {
            "subj_id": pa.array([e[0] for e in edges], type=pa.int64()),
            "pred": pa.array(["p"] * len(edges)),
            "obj_id": pa.array([e[1] for e in edges], type=pa.int64()),
            "weight": pa.array([e[2] for e in edges], type=pa.int64()),
        }
    )


def test_pagerank_matches_numpy_reference(ray_session) -> None:
    rng = np.random.default_rng(3)
    edges = []
    for _ in range(60):
        s, t = rng.integers(0, 15, 2)
        if s != t:
            edges.append((int(s), int(t), int(rng.integers(1, 5))))
    edges.append((3, 20, 2))  # node 20 is dangling (no out-edges)
    got = (
        pagerank(ray.data.from_arrow(_edge_table(edges)))
        .to_pandas()
        .set_index("entity_id")["rank"]
        .to_dict()
    )
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)
    # rank is a probability distribution: dangling mass is conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_weight_bias(ray_session) -> None:
    # 0 -> 1 (weight 9) and 0 -> 2 (weight 1): node 1 must outrank node 2
    edges = [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    got = (
        pagerank(ray.data.from_arrow(_edge_table(edges)), iters=12)
        .to_pandas()
        .set_index("entity_id")["rank"]
    )
    assert got[1] > got[2]
