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


def test_handle_reuse_matches_oneshot(ray_session) -> None:
    """One sharded handle, many runs: each run() must equal the
    corresponding fresh dataflow PageRank (reset really resets, and
    a prior run leaves no state behind)."""
    from promptner_ray.functions.graphbsp import PageRankBSP

    edges = _random_edges(7, 120, 500)
    ds = ray.data.from_arrow(_edge_table(edges))
    with PageRankBSP(ds, num_partitions=3) as h:
        got3 = _ranks(h.run(iters=3))
        got5 = _ranks(h.run(iters=5, damping=0.7))
        got3_again = _ranks(h.run(iters=3))
    assert got3.equals(_ranks(pagerank(ds, iters=3)))
    assert got5.equals(_ranks(pagerank(ds, iters=5, damping=0.7)))
    assert got3.equals(got3_again)


def test_replicate_edges_disjoint_and_deterministic(ray_session) -> None:
    from promptner_ray.functions.graphbsp import replicate_edges

    edges = _random_edges(11, 60, 300)
    ds = ray.data.from_arrow(_edge_table(edges))
    k = 3
    rep = replicate_edges(ds, k).materialize()
    assert rep.count() == k * len(edges)
    t = pa.concat_tables(ray.get(rep.to_arrow_refs()))
    # replica id spaces are disjoint: k distinct salted copies per node
    base_nodes = {e[0] for e in edges} | {e[1] for e in edges}
    got_nodes = set(t.column("subj_id").to_pylist()) | set(
        t.column("obj_id").to_pylist()
    )
    assert len(got_nodes) == k * len(base_nodes)
    # replica 0 is the base graph verbatim
    assert set(
        zip(*[t.column(c).to_pylist() for c in ("subj_id", "obj_id")])
    ) >= {(e[0], e[1]) for e in edges}
    # deterministic: a second build yields the identical multiset
    rep2 = pa.concat_tables(
        ray.get(replicate_edges(ds, k).materialize().to_arrow_refs())
    )
    key = ["subj_id", "obj_id", "weight"]
    assert (
        t.select(key).sort_by([(c, "ascending") for c in key])
        == rep2.select(key).sort_by([(c, "ascending") for c in key])
    )


def _hops(ds):
    return (
        ds.to_pandas()
        .sort_values(["entity_id"])
        .reset_index(drop=True)[["entity_id", "hop"]]
    )


def test_bfs_matches_dataflow(ray_session) -> None:
    """BSP BFS == graphops.bfs_hops exactly, across partition counts
    and seeds (including a hub and a leaf)."""
    from promptner_ray.functions.graphbsp import bfs_bsp
    from promptner_ray.functions.graphops import bfs_hops

    edges = _random_edges(3, 80, 400)
    ds = ray.data.from_arrow(_edge_table(edges))
    out_deg = {}
    for s, t, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    hub = max(out_deg, key=lambda k: (out_deg[k], -k))
    leaf = min(out_deg, key=lambda k: (out_deg[k], k))
    for seed in (hub, leaf):
        for n_parts in (1, 3):
            got = _hops(bfs_bsp(ds, seed, num_partitions=n_parts))
            want = _hops(bfs_hops(ds, seed))
            assert got.equals(want), (seed, n_parts)


def test_bfs_handle_multi_seed_and_absent_source(ray_session) -> None:
    """One handle, several seeds; a source absent from the edge set
    still yields its (source, 0) row — bfs_hops' convention.  PageRank
    and BFS interleave on the same handle without corrupting state."""
    from promptner_ray.functions.graphbsp import PageRankBSP
    from promptner_ray.functions.graphops import bfs_hops, pagerank

    edges = _random_edges(5, 60, 250)
    ds = ray.data.from_arrow(_edge_table(edges))
    nodes = {e[0] for e in edges} | {e[1] for e in edges}
    seeds = sorted(nodes)[:2]
    absent = max(nodes) + 1000
    with PageRankBSP(ds, num_partitions=3) as h:
        a = _hops(h.bfs(seeds[0]))
        pr = _ranks(h.run(iters=3))
        b = _hops(h.bfs(seeds[1]))
        ghost = _hops(h.bfs(absent))
    assert a.equals(_hops(bfs_hops(ds, seeds[0])))
    assert b.equals(_hops(bfs_hops(ds, seeds[1])))
    assert pr.equals(_ranks(pagerank(ds, iters=3)))
    assert len(ghost) == 1
    assert ghost.iloc[0].tolist() == [absent, 0]


def test_bfs_max_hops_caps_depth(ray_session) -> None:
    """A 1-hop cap returns exactly the seed + its direct successors."""
    from promptner_ray.functions.graphbsp import bfs_bsp

    edges = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 5, 1)]
    ds = ray.data.from_arrow(_edge_table(edges))
    got = _hops(bfs_bsp(ds, 1, max_hops=1, num_partitions=2))
    assert got.values.tolist() == [[1, 0], [2, 1], [5, 1]]


def _labels(ds, id_col, lab_col):
    return (
        ds.to_pandas()
        .sort_values(id_col)
        .reset_index(drop=True)[[id_col, lab_col]]
    )


def test_components_match_dataflow(ray_session) -> None:
    """BSP connected components == graphops.connected_components
    exactly, across partition counts, on a multi-component pair graph
    with duplicate pairs and a self-loop."""
    from promptner_ray.functions.graphbsp import components_bsp
    from promptner_ray.functions.graphops import connected_components

    rng = np.random.default_rng(23)
    pairs = []
    for comp in range(5):
        base = comp * 10_000
        n = int(rng.integers(4, 50))
        for _ in range(2 * n):
            x, y = rng.integers(0, n, 2)
            pairs.append((base + int(x), base + int(y)))
    pairs.append(pairs[0])  # duplicate pair
    pairs.append((777_777, 777_777))  # self-loop singleton
    pt = pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(pt)
    want = _labels(connected_components(ds), "doc_id", "component")
    for n_parts in (1, 4):
        got = _labels(
            components_bsp(ds, num_partitions=n_parts),
            "doc_id",
            "component",
        )
        assert want.equals(got), f"mismatch at num_partitions={n_parts}"


def test_components_max_iters_cap_matches(ray_session) -> None:
    """When max_iters caps before convergence (a long path needs ~L
    rounds), the per-round label states must still match — the BSP
    delta-frontier update and the dataflow min-join update are the same
    function round for round."""
    from promptner_ray.functions.graphbsp import components_bsp
    from promptner_ray.functions.graphops import connected_components

    path = [(i, i + 1) for i in range(40)]  # diameter 40 > 3 rounds
    pt = pa.table(
        {
            "doc_a": pa.array([p[0] for p in path], pa.int64()),
            "doc_b": pa.array([p[1] for p in path], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(pt)
    for iters in (3, 10):
        want = _labels(
            connected_components(ds, max_iters=iters),
            "doc_id",
            "component",
        )
        got = _labels(
            components_bsp(ds, max_iters=iters, num_partitions=3),
            "doc_id",
            "component",
        )
        assert want.equals(got), f"mismatch at max_iters={iters}"


def test_label_prop_matches_dataflow(ray_session) -> None:
    """BSP label propagation == graphops.label_propagation exactly —
    duplicate edges must NOT multiply votes (the distinct undirected
    adjacency is rebuilt the same way), ties break to the smallest
    label, and an even cycle (oscillation under synchronous update)
    still matches because the per-round vote fold is identical."""
    from promptner_ray.functions.graphbsp import label_propagation_bsp
    from promptner_ray.functions.graphops import label_propagation

    edges = _random_edges(29, 90, 500)
    edges += edges[:40]  # duplicate edges: votes must stay distinct
    edges += [(500 + i, 500 + (i + 1) % 6, 1) for i in range(6)]  # 6-cycle
    ds = ray.data.from_arrow(_edge_table(edges))
    want = _labels(label_propagation(ds), "entity_id", "community")
    for n_parts in (1, 4):
        got = _labels(
            label_propagation_bsp(ds, num_partitions=n_parts),
            "entity_id",
            "community",
        )
        assert want.equals(got), f"mismatch at num_partitions={n_parts}"


def test_empty_shards_more_partitions_than_nodes(ray_session) -> None:
    """A tiny graph over many shards leaves most shards with ZERO home
    nodes — every BSP kernel must survive that and still match its
    dataflow twin (regression: lp_gather indexed an empty self-vote
    array when a 70-node KG graph ran at a 32-CPU session's default
    partition count)."""
    from promptner_ray.functions import graphbsp as B
    from promptner_ray.functions import graphops as G

    edges = [(1, 2, 1), (2, 3, 1), (3, 1, 2), (3, 4, 1), (5, 1, 1)]
    ds = ray.data.from_arrow(_edge_table(edges))
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([e[0] for e in edges], pa.int64()),
                "doc_b": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    P = 16  # ≫ 5 nodes: most shards empty

    def df(d, *cols):
        p = d.to_pandas()
        cols = list(cols) if cols else list(p.columns)
        return p.sort_values(cols).reset_index(drop=True)[cols]

    assert df(B.pagerank_bsp(ds, iters=3, num_partitions=P)).equals(
        df(G.pagerank(ds, iters=3))
    )
    assert df(B.bfs_bsp(ds, 1, num_partitions=P)).equals(
        df(G.bfs_hops(ds, 1))
    )
    assert df(B.components_bsp(pairs, num_partitions=P)).equals(
        df(G.connected_components(pairs))
    )
    assert df(B.label_propagation_bsp(ds, num_partitions=P)).equals(
        df(G.label_propagation(ds))
    )
    assert df(B.k_core_bsp(ds, k=2, num_partitions=P)).equals(
        df(G.k_core(ds, k=2))
    )
    cols = ["start_node", "walk_no", "step", "entity_id"]
    assert df(B.random_walks_bsp(ds, num_partitions=P), *cols).equals(
        df(G.random_walks(ds), *cols)
    )


def test_k_core_matches_dataflow(ray_session) -> None:
    """BSP k-core == graphops.k_core exactly across k values and
    partition counts (self-loops dropped, duplicate edges collapse to
    one undirected edge), INCLUDING capped runs — a pendant chain that
    peels one node per round forces max_iters to bite, and the final
    degree vector must still count the last round's removals (the
    dataflow op's post-loop degrees pass)."""
    from promptner_ray.functions.graphbsp import k_core_bsp
    from promptner_ray.functions.graphops import k_core

    edges = []
    for i in range(6):  # 6-clique: the 5-core
        for j in range(i + 1, 6):
            edges.append((i, j, 1))
    edges += _random_edges(13, 80, 300)
    edges.append((5, 5, 1))  # self-loop: dropped
    edges.append(edges[0])  # duplicate edge
    ds = ray.data.from_arrow(_edge_table(edges))

    def core(d):
        p = d.to_pandas()
        if len(p) == 0:
            return p
        return p.sort_values("entity_id").reset_index(drop=True)[
            ["entity_id", "degree"]
        ]

    for k in (2, 3, 5):
        want = core(k_core(ds, k=k))
        for n_parts in (1, 4):
            got = core(k_core_bsp(ds, k=k, num_partitions=n_parts))
            assert want.equals(got), (k, n_parts)
    # empty core: both plans yield 0 rows
    assert len(core(k_core_bsp(ds, k=50))) == 0
    assert len(core(k_core(ds, k=50))) == 0
    # capped peeling: 50-cycle (a 2-core) + 21-node pendant chain that
    # peels one node per round
    chain = [(i, (i + 1) % 50, 1) for i in range(50)]
    chain += [(1000 + i, 1000 + i + 1, 1) for i in range(20)]
    chain.append((1020, 0, 1))
    ds2 = ray.data.from_arrow(_edge_table(chain))
    for max_iters in (2, 3, 30):
        want = core(k_core(ds2, k=2, max_iters=max_iters))
        got = core(
            k_core_bsp(ds2, k=2, max_iters=max_iters, num_partitions=3)
        )
        assert want.equals(got), f"capped mismatch at {max_iters}"


def test_random_walks_match_dataflow(ray_session) -> None:
    """BSP walks == graphops.random_walks exactly, across partition
    counts — same wrapping-int64 neighbor mix, same ascending-id
    ranking over the DISTINCT adjacency (a duplicate edge must not
    shift ranks), same emit-then-die semantics at a sink."""
    from promptner_ray.functions.graphbsp import random_walks_bsp
    from promptner_ray.functions.graphops import random_walks

    edges = _random_edges(41, 120, 500)
    edges.append((9000, 9001, 1))  # 9001: sink — dies after step 0
    edges.append(edges[0])  # duplicate edge
    ds = ray.data.from_arrow(_edge_table(edges))
    cols = ["start_node", "walk_no", "step", "entity_id"]

    def walks(d):
        return (
            d.to_pandas().sort_values(cols).reset_index(drop=True)[cols]
        )

    want = walks(random_walks(ds))
    for n_parts in (1, 3):
        got = walks(random_walks_bsp(ds, num_partitions=n_parts))
        assert want.equals(got), f"mismatch at num_partitions={n_parts}"
    # parameter sweep on one handle must equal fresh dataflow runs
    from promptner_ray.functions.graphbsp import PageRankBSP

    with PageRankBSP(ds, num_partitions=3) as h:
        short = walks(h.walks(walk_len=3, seed=7))
        again = walks(h.walks())
    assert short.equals(walks(random_walks(ds, walk_len=3, seed=7)))
    assert again.equals(want)


def test_labels_and_pagerank_share_one_handle(ray_session) -> None:
    """components / label_prop / run interleave on one handle without
    corrupting each other's state.  (Both label kernels are exercised
    on the direction-doubled edge table the label ops require; PageRank
    on that doubled graph is simply the undirected PageRank, compared
    against the dataflow op on the same input.)"""
    from promptner_ray.functions.graphbsp import PageRankBSP
    from promptner_ray.functions.graphops import (
        connected_components,
        pagerank,
    )

    edges = _random_edges(31, 70, 300)
    tbl = _edge_table(edges)
    both = pa.table(
        {
            "subj_id": pa.concat_arrays(
                [
                    tbl.column("subj_id").combine_chunks(),
                    tbl.column("obj_id").combine_chunks(),
                ]
            ),
            "obj_id": pa.concat_arrays(
                [
                    tbl.column("obj_id").combine_chunks(),
                    tbl.column("subj_id").combine_chunks(),
                ]
            ),
            "weight": pa.array([1] * (2 * len(edges)), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(both)
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": tbl.column("subj_id"),
                "doc_b": tbl.column("obj_id"),
            }
        )
    )
    with PageRankBSP(ds, num_partitions=3) as h:
        cc1 = _labels(h.components(), "doc_id", "component")
        pr = _ranks(h.run(iters=3))
        cc2 = _labels(h.components(), "doc_id", "component")
    assert cc1.equals(
        _labels(connected_components(pairs), "doc_id", "component")
    )
    assert cc1.equals(cc2)
    assert pr.equals(_ranks(pagerank(ds, iters=3)))


def test_hits_bsp_bit_equal_across_partition_counts(ray_session) -> None:
    """HITS on the BSP pool == graphops.hits, bit-for-bit, at every
    partition count — including a dangling sink (no out-edges), a pure
    source (no in-edges, auth must be exactly 0), and a multi-edge
    whose contributions must add."""
    from promptner_ray.functions.graphbsp import hits_bsp
    from promptner_ray.functions.graphops import hits

    edges = _random_edges(23, 300, 1200)
    edges.append((3, 2000, 2))  # sink: no out-edges
    edges.append((3000, 7, 4))  # pure source: no in-edges
    edges.append(edges[0])  # multi-edge: contributions must add
    tbl = _edge_table(edges)

    def scores(ds):
        df = ds.to_pandas()[["entity_id", "auth", "hub"]]
        return df.sort_values("entity_id").reset_index(drop=True)

    want = scores(hits(ray.data.from_arrow(tbl), iters=3))
    assert (want["auth"] == 0).any()  # the pure source
    for n_parts in (1, 2, 5):
        got = scores(
            hits_bsp(
                ray.data.from_arrow(tbl), iters=3, num_partitions=n_parts
            )
        )
        assert want.equals(got), f"mismatch at num_partitions={n_parts}"


def test_hits_bsp_handle_reuse(ray_session) -> None:
    """One sharded handle, many run() calls with different iteration
    counts — each must equal its one-shot twin."""
    from promptner_ray.functions.graphbsp import HITSBSP, hits_bsp
    from promptner_ray.functions.graphops import hits

    edges = _random_edges(29, 80, 350)
    ds = ray.data.from_arrow(_edge_table(edges))

    def scores(d):
        df = d.to_pandas()[["entity_id", "auth", "hub"]]
        return df.sort_values("entity_id").reset_index(drop=True)

    with HITSBSP(ds, num_partitions=3) as h:
        one = scores(h.run(iters=1))
        five = scores(h.run(iters=5))
    assert one.equals(scores(hits(ds, iters=1)))
    assert five.equals(scores(hits(ds, iters=5)))


def test_bowtie_bsp_matches_dataflow(ray_session) -> None:
    from promptner_ray.functions.graphbsp import bowtie_bsp
    from promptner_ray.functions.graphops import bowtie

    edges = _random_edges(41, 120, 400)
    edges += [(500, 0, 1), (1, 600, 1)]  # guaranteed in/out around 0
    ds = ray.data.from_arrow(_edge_table(edges))

    def hist(d):
        return (
            d.to_pandas()
            .sort_values("region")
            .reset_index(drop=True)
        )

    want = hist(bowtie(ds, source=0, max_hops=6))
    got = hist(bowtie_bsp(ds, source=0, max_hops=6))
    assert want.equals(got)


def test_hyperball_bsp_bit_equal_across_partition_counts(ray_session) -> None:
    """HyperBall on the BSP pool == the dataflow op, bit-for-bit
    (element-wise register max commutes; the estimate expression is
    shared) — including a sink, a source, and a duplicate edge."""
    from promptner_ray.functions.graphbsp import hyperball_bsp
    from promptner_ray.functions.hyperball import hyperball

    edges = _random_edges(53, 200, 800)
    edges.append((3, 4000, 1))  # sink
    edges.append((5000, 7, 1))  # source
    edges.append(edges[0])  # duplicate edge (deduped by both plans)
    tbl = _edge_table(edges)

    def balls(d):
        return (
            d.to_pandas()[["entity_id", "ball_est"]]
            .sort_values("entity_id")
            .reset_index(drop=True)
        )

    want = balls(hyperball(ray.data.from_arrow(tbl), iters=3))
    for n_parts in (1, 2, 5):
        got = balls(
            hyperball_bsp(
                ray.data.from_arrow(tbl), iters=3, num_partitions=n_parts
            )
        )
        assert want.equals(got), f"mismatch at num_partitions={n_parts}"


def test_harmonic_bsp_bit_equal(ray_session) -> None:
    """harmonic_bsp == the dataflow harmonic_centrality, bit-for-bit —
    including its DOUBLE column (shared estimate kernel, same fixed
    accumulation order, max-merge commutes)."""
    from promptner_ray.functions.graphbsp import harmonic_bsp
    from promptner_ray.functions.hyperball import harmonic_centrality

    edges = _random_edges(61, 150, 600)
    edges.append((3, 4000, 1))  # sink
    ds = ray.data.from_arrow(_edge_table(edges))

    def harm(d):
        return (
            d.to_pandas()[["entity_id", "harmonic"]]
            .sort_values("entity_id")
            .reset_index(drop=True)
        )

    want = harm(harmonic_centrality(ds, iters=3))
    for n_parts in (1, 3):
        got = harm(harmonic_bsp(ds, iters=3, num_partitions=n_parts))
        assert want.equals(got), f"mismatch at num_partitions={n_parts}"


def test_betweenness_bsp_bit_equal_across_partition_counts(
    ray_session,
) -> None:
    """BSP k-source Brandes == the dataflow twin, bit for bit (bc_fp
    int64 AND the bc double), at several partition counts — incl. a
    duplicate pair (deduped like the twin) and a self-loop."""
    from promptner_ray.functions.graphbsp import betweenness_bsp
    from promptner_ray.functions.graphops import betweenness

    edges = _random_edges(19, 120, 900)
    edges.append(edges[0])
    edges.append((5, 5, 1))
    tbl = _edge_table(edges)
    sources = [0, 7, 33, 90]
    want = (
        betweenness(ray.data.from_arrow(tbl), sources)
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    assert len(want) > 0
    for n_parts in (1, 3, 5):
        got = (
            betweenness_bsp(
                ray.data.from_arrow(tbl), sources, num_partitions=n_parts
            )
            .to_pandas()
            .sort_values("entity_id")
            .reset_index(drop=True)
        )
        assert want.equals(got), f"mismatch at num_partitions={n_parts}"


def test_betweenness_auto_both_routes_equal(ray_session) -> None:
    from promptner_ray.functions import graphauto

    edges = _random_edges(23, 60, 300)
    tbl = _edge_table(edges)
    sources = [0, 3]
    lo = (
        graphauto.betweenness_auto(
            ray.data.from_arrow(tbl), sources, threshold=10**9
        )
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    hi = (
        graphauto.betweenness_auto(
            ray.data.from_arrow(tbl), sources, threshold=0
        )
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )
    assert lo.equals(hi)
