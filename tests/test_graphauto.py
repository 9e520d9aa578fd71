"""Size-thresholded dataflow↔BSP auto-switch (`functions/graphauto.py`).

The twins are bit-identical (pinned in test_graphbsp.py), so the only
new surface is the ROUTING: the pure rule, and that each wrapper plumbs
its arguments through to whichever twin it picks — verified by forcing
both sides of the threshold on the same input and requiring equality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from promptner_ray.functions import graphauto


def _edges_table(seed: int = 11, n_nodes: int = 60, n_draws: int = 240):
    rng = np.random.default_rng(seed)
    rows, seen = [], set()
    for _ in range(n_draws):
        s, t = rng.integers(0, n_nodes, 2)
        if s != t and (int(s), int(t)) not in seen:
            seen.add((int(s), int(t)))
            rows.append((int(s), int(t), int(rng.integers(1, 9))))
    return pa.table(
        {
            "subj_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "pred": pa.array(["p"] * len(rows)),
            "obj_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "weight": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def _canon(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_routing_rule() -> None:
    assert not graphauto.use_bsp(0)
    assert not graphauto.use_bsp(graphauto.BSP_EDGE_THRESHOLD - 1)
    assert graphauto.use_bsp(graphauto.BSP_EDGE_THRESHOLD)
    assert graphauto.use_bsp(10**12)
    # per-call override
    assert graphauto.use_bsp(10, threshold=10)
    assert not graphauto.use_bsp(9, threshold=10)


def test_pagerank_auto_both_routes_equal(ray_session) -> None:
    tbl = _edges_table()
    lo = _canon(
        graphauto.pagerank_auto(
            ray.data.from_arrow(tbl), iters=3, threshold=10**9
        )
    )  # forced dataflow
    hi = _canon(
        graphauto.pagerank_auto(ray.data.from_arrow(tbl), iters=3, threshold=0)
    )  # forced BSP
    assert lo.equals(hi)


def test_hits_auto_both_routes_equal(ray_session) -> None:
    tbl = _edges_table(seed=23)
    lo = _canon(
        graphauto.hits_auto(ray.data.from_arrow(tbl), iters=3, threshold=10**9)
    )
    hi = _canon(
        graphauto.hits_auto(ray.data.from_arrow(tbl), iters=3, threshold=0)
    )
    assert lo.equals(hi)


def test_components_auto_both_routes_equal(ray_session) -> None:
    tbl = pa.table(
        {
            "doc_a": pa.array([1, 2, 5, 9, 10], type=pa.int64()),
            "doc_b": pa.array([2, 3, 6, 10, 11], type=pa.int64()),
        }
    )
    lo = _canon(
        graphauto.connected_components_auto(
            ray.data.from_arrow(tbl), threshold=10**9
        )
    )
    hi = _canon(
        graphauto.connected_components_auto(
            ray.data.from_arrow(tbl), threshold=0
        )
    )
    assert lo.equals(hi)


def test_hyperball_auto_both_routes_equal(ray_session) -> None:
    tbl = _edges_table(seed=31, n_nodes=40, n_draws=150)
    lo = _canon(
        graphauto.hyperball_auto(
            ray.data.from_arrow(tbl), iters=3, threshold=10**9
        )
    )
    hi = _canon(
        graphauto.hyperball_auto(ray.data.from_arrow(tbl), iters=3, threshold=0)
    )
    assert lo.equals(hi)
