"""BSP actor-pool PageRank == the Ray-Data operator, bit-for-bit.

The fixed-point arithmetic makes both formulations exactly reproducible,
so the contract here is `==` (no tolerance) across partition counts —
the property that lets one DuckDB oracle (`kg_pagerank`) cover both the
dataflow and the BSP execution plans.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from promptner_ray.functions.graphbsp import pagerank_bsp
from promptner_ray.functions.graphops import pagerank


def _random_edges(seed: int, n_nodes: int, n_draws: int):
    rng = np.random.default_rng(seed)
    edges, seen = [], set()
    for _ in range(n_draws):
        s, t = rng.integers(0, n_nodes, 2)
        if s != t and (int(s), int(t)) not in seen:
            seen.add((int(s), int(t)))
            edges.append((int(s), int(t), int(rng.integers(1, 9))))
    return edges


def _edge_table(edges):
    return pa.table(
        {
            "subj_id": pa.array([e[0] for e in edges], type=pa.int64()),
            "pred": pa.array(["p"] * len(edges)),
            "obj_id": pa.array([e[1] for e in edges], type=pa.int64()),
            "weight": pa.array([e[2] for e in edges], type=pa.int64()),
        }
    )


def _ranks(ds):
    return (
        ds.to_pandas().sort_values("entity_id").reset_index(drop=True)
    )


def test_bsp_bit_equal_across_partition_counts(ray_session) -> None:
    edges = _random_edges(17, 300, 1200)
    edges.append((3, 2000, 2))  # dangling sink: no out-edges
    # multi-edge: same (src, dst) twice — contributions must add
    edges.append(edges[0])
    tbl = _edge_table(edges)
    want = _ranks(pagerank(ray.data.from_arrow(tbl), iters=3))
    for n_parts in (1, 2, 5):
        got = _ranks(
            pagerank_bsp(
                ray.data.from_arrow(tbl),
                iters=3,
                num_partitions=n_parts,
            )
        )
        assert want.equals(got), f"mismatch at num_partitions={n_parts}"


def test_bsp_rank_is_probability_mass(ray_session) -> None:
    edges = _random_edges(5, 40, 200)
    out = _ranks(
        pagerank_bsp(
            ray.data.from_arrow(_edge_table(edges)),
            iters=8,
            num_partitions=3,
        )
    )
    # mass conservation up to the documented fixed-point floor losses
    assert abs(out["rank"].sum() - 1.0) < 1e-8
    assert (out["rank"] > 0).all()
