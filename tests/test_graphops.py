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
    # the distributed op carries mass in 2**-42 fixed-point units
    # (bit-reproducible across cluster sizes, SQL-oracle-checkable);
    # each floor op loses < 2.3e-13 of mass, so vs the float reference
    # the tolerance is the accumulated quantization, not float noise
    assert all(abs(got[k] - want[k]) < 1e-8 for k in want)
    # rank is a probability distribution: dangling mass is conserved
    # (up to the same quantization losses)
    assert abs(sum(got.values()) - 1.0) < 1e-8


def _fixed_point_pagerank(edges, iters, d=0.85):
    """Single-process integer replay of the distributed op's exact
    arithmetic — == comparison, no tolerance (the bit-reproducibility
    claim the float formulation cannot make)."""
    from promptner_ray.functions.graphops import PR_SCALE

    dnum = round(d * 1000)
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    n = len(nodes)
    wout = {v: 0 for v in nodes}
    for s, _, w in edges:
        wout[s] += w
    r = {v: PR_SCALE // n for v in nodes}
    base = (1000 - dnum) * PR_SCALE // (1000 * n)
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if wout[v] == 0)
        ds = dang // n
        c = {v: 0 for v in nodes}
        for s, t, w in edges:
            c[t] += (r[s] * w) // wout[s]
        r = {v: base + (dnum * (c[v] + ds)) // 1000 for v in nodes}
    return {v: fp / PR_SCALE for v, fp in r.items()}


def test_pagerank_bit_exact_on_random_graph(ray_session) -> None:
    """Distributed fixed-point PageRank == the integer reference
    EXACTLY on a graph large enough that float summation order would
    visibly diverge — the reproducibility contract under any block
    arrival order."""
    rng = np.random.default_rng(17)
    edges = []
    seen = set()
    for _ in range(1200):
        s, t = rng.integers(0, 300, 2)
        if s != t and (int(s), int(t)) not in seen:
            seen.add((int(s), int(t)))
            edges.append((int(s), int(t), int(rng.integers(1, 9))))
    got = (
        pagerank(ray.data.from_arrow(_edge_table(edges)), iters=3)
        .to_pandas()
        .set_index("entity_id")["rank"]
        .to_dict()
    )
    want = _fixed_point_pagerank(edges, iters=3)
    assert got == want  # exact, not isclose


def test_edge_pmi_hand_computed(ray_session) -> None:
    import math

    from promptner_ray.functions.graphops import edge_pmi

    # W = 12; degrees: w_out(0)=8, w_out(2)=4, w_in(1)=10, w_in(0)=2
    tbl = _edge_table([(0, 1, 8), (2, 1, 2), (2, 0, 2)])
    got = (
        edge_pmi(ray.data.from_arrow(tbl))
        .to_pandas()
        .set_index(["subj_id", "obj_id"])["pmi"]
        .to_dict()
    )
    W = 12
    assert got[(0, 1)] == math.log(float(8 * W) / float(8 * 10))
    assert got[(2, 1)] == math.log(float(2 * W) / float(4 * 10))
    assert got[(2, 0)] == math.log(float(2 * W) / float(4 * 2))


def test_edge_times_span(ray_session) -> None:
    from promptner_ray.pipelines.kg import edge_times

    # two pages assert A->B at t=100 and t=300 (twice); one page asserts
    # C->A at t=200 only
    triples = pa.table(
        {
            "url": pa.array(["u1", "u3", "u3", "u2"]),
            "sent_id": pa.array([0, 0, 1, 0], type=pa.int64()),
            "subj": pa.array(["A", "A", "A", "C"]),
            "pred": pa.array(["p", "p", "p", "q"]),
            "obj": pa.array(["B", "B", "B", "A"]),
        }
    )
    pages = pa.table(
        {
            "url": pa.array(["u1", "u2", "u3"]),
            "warc_ts": pa.array([100, 200, 300], type=pa.timestamp("us")),
        }
    )
    got = (
        edge_times(
            ray.data.from_arrow(triples), ray.data.from_arrow(pages)
        )
        .to_pandas()
        .set_index("pred")
    )
    assert got.loc["p", "first_seen"] == 100
    assert got.loc["p", "last_seen"] == 300
    assert got.loc["p", "weight"] == 3
    assert got.loc["q", "first_seen"] == got.loc["q", "last_seen"] == 200
    assert got.loc["q", "weight"] == 1


def test_triangle_counts_hand_computed(ray_session) -> None:
    from promptner_ray.functions.graphops import triangle_counts

    # K4 on {0,1,2,3} (4 triangles, 3 per node) plus a pendant 3->9 and a
    # directed 2-cycle 5<->6 (no triangle); edge direction and duplicate
    # assertions must not matter
    edges = [
        (0, 1, 1), (1, 0, 3),  # duplicate undirected edge, both ways
        (0, 2, 1), (0, 3, 1), (1, 2, 1), (3, 1, 1), (2, 3, 1),
        (3, 9, 2), (5, 6, 1), (6, 5, 1), (7, 7, 1),  # self-loop ignored
    ]
    got = (
        triangle_counts(ray.data.from_arrow(_edge_table(edges)))
        .to_pandas()
        .set_index("entity_id")["n_triangles"]
        .to_dict()
    )
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_pagerank_weight_bias(ray_session) -> None:
    # 0 -> 1 (weight 9) and 0 -> 2 (weight 1): node 1 must outrank node 2
    edges = [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    got = (
        pagerank(ray.data.from_arrow(_edge_table(edges)), iters=12)
        .to_pandas()
        .set_index("entity_id")["rank"]
    )
    assert got[1] > got[2]


def test_bfs_hops_hand_computed(ray_session) -> None:
    from promptner_ray.functions.graphops import bfs_hops

    # 0→1→2→3 chain with shortcut 0→2, a back-edge 3→0 (cycle must not
    # loop), an unreachable pair 8→9, and an in-edge-only node 7→0
    # (direction matters: 7 is NOT reachable from 0)
    edges = [
        (0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 2, 5),
        (3, 0, 1), (8, 9, 1), (7, 0, 2),
    ]
    got = (
        bfs_hops(ray.data.from_arrow(_edge_table(edges)), source=0)
        .to_pandas()
        .set_index("entity_id")["hop"]
        .to_dict()
    )
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_hops_depth_cap(ray_session) -> None:
    from promptner_ray.functions.graphops import bfs_hops

    chain = [(i, i + 1, 1) for i in range(6)]
    got = (
        bfs_hops(
            ray.data.from_arrow(_edge_table(chain)), source=0, max_hops=3
        )
        .to_pandas()
        .set_index("entity_id")["hop"]
        .to_dict()
    )
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_adamic_adar_hand_computed(ray_session) -> None:
    import math

    from promptner_ray.functions.graphops import AA_SCALE, adamic_adar

    # und graph: 10-{1,2,3}, 11-{1,2}; duplicate/reversed assertions must
    # collapse.  deg: 10→3, 11→2, 1→2, 2→2, 3→1 (3 can't pivot: deg 1)
    edges = [
        (10, 1, 1), (1, 10, 2), (10, 2, 1), (10, 3, 1),
        (11, 1, 1), (2, 11, 1),
    ]
    got = {
        (r["a"], r["b"]): r
        for r in adamic_adar(
            ray.data.from_arrow(_edge_table(edges))
        ).take_all()
    }
    w2 = int(math.floor(AA_SCALE / math.log(2)))
    w3 = int(math.floor(AA_SCALE / math.log(3)))
    # (1,2) share pivots 10 (deg 3) and 11 (deg 2); (10,11) share pivots
    # 1 and 2 (deg 2 each); all other pairs have common=1 → filtered
    assert set(got) == {(1, 2), (10, 11)}
    assert got[(1, 2)]["common"] == 2
    assert got[(1, 2)]["aa_fp"] == w3 + w2
    assert got[(1, 2)]["adamic_adar"] == (w3 + w2) / AA_SCALE
    assert got[(10, 11)]["aa_fp"] == 2 * w2


def _walks_reference(edges, walk_len, k_walks, seed):
    """Single-process replay of the deterministic walk semantics."""
    import numpy as np

    from promptner_ray.functions.graphops import RW_M1, RW_M2, RW_M3

    adj = {}
    for s, t, _ in edges:
        adj.setdefault(s, set()).add(t)
    adj = {s: sorted(ds) for s, ds in adj.items()}
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    rows = set()
    for n in nodes:
        for w in range(k_walks):
            cur = n
            rows.add((n, w, 0, cur))
            for step in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                with np.errstate(over="ignore"):
                    uw = np.int64(n) * np.int64(k_walks) + np.int64(w)
                    h = (
                        np.int64(cur) * np.int64(RW_M1)
                        + np.int64(step) * np.int64(RW_M2)
                        + uw * np.int64(RW_M3)
                        + np.int64(seed)
                    )
                cur = nbrs[int(h.view(np.uint64)) % len(nbrs)]
                rows.add((n, w, step, cur))
    return rows


def test_random_walks_match_reference(ray_session) -> None:
    from promptner_ray.functions.graphops import random_walks

    rng = np.random.default_rng(11)
    edges = []
    for _ in range(50):
        s, t = rng.integers(0, 12, 2)
        if s != t:
            edges.append((int(s), int(t), 1))
    edges.append((5, 30, 1))  # 30 is a sink: walks through it must stop
    got = {
        (r["start_node"], r["walk_no"], r["step"], r["entity_id"])
        for r in random_walks(
            ray.data.from_arrow(_edge_table(edges)),
            walk_len=5,
            walks_per_node=2,
            seed=7,
        ).take_all()
    }
    assert got == _walks_reference(edges, 5, 2, 7)


def test_walk_pairs_window_semantics(ray_session) -> None:
    import pyarrow as pa

    from promptner_ray.functions.graphops import walk_pairs

    # one walk 0→1→2→3, one truncated walk 9→8 (sink): offset-3 pairs
    # (0,3) must NOT appear at window=2; the truncated walk only pairs
    # its two rows; counts aggregate across walks
    walks = pa.table(
        {
            "start_node": pa.array([0, 0, 0, 0, 9, 9], type=pa.int64()),
            "walk_no": pa.array([0] * 6, type=pa.int64()),
            "step": pa.array([0, 1, 2, 3, 0, 1], type=pa.int64()),
            "entity_id": pa.array([0, 1, 2, 3, 9, 8], type=pa.int64()),
        }
    )
    got = {
        (r["center"], r["context"]): r["n"]
        for r in walk_pairs(ray.data.from_arrow(walks)).take_all()
    }
    want = {}
    seq = [0, 1, 2, 3]
    for i in range(len(seq)):
        for j in range(len(seq)):
            if 1 <= abs(i - j) <= 2:
                want[(seq[i], seq[j])] = want.get((seq[i], seq[j]), 0) + 1
    want[(9, 8)] = 1
    want[(8, 9)] = 1
    assert got == want


def _peel_reference(edges, k):
    """Single-process k-core peel: the value gate for the distributed op."""
    und = {tuple(sorted((s, t))) for s, t, _ in edges if s != t}
    while True:
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        und = {e for e in und if drop.isdisjoint(e)}
        if not und:
            return {}


def test_k_core_matches_peel_reference(ray_session) -> None:
    import numpy as np

    from promptner_ray.functions.graphops import k_core

    rng = np.random.default_rng(7)
    edges = []
    # K5 core on {0..4} + a long tail of pendant/low-degree nodes
    for i in range(5):
        for j in range(i + 1, 5):
            edges.append((i, j, 1))
    for x in range(5, 40):
        edges.append((x, int(rng.integers(0, x)), 1))
    got = (
        k_core(ray.data.from_arrow(_edge_table(edges)), k=3)
        .to_pandas()
        .set_index("entity_id")["degree"]
        .to_dict()
    )
    want = _peel_reference(edges, 3)
    assert got == want
    assert set(got) >= {0, 1, 2, 3, 4}


def test_k_core_empty_when_over_threshold(ray_session) -> None:
    from promptner_ray.functions.graphops import k_core

    edges = [(0, 1, 1), (1, 2, 1), (2, 0, 1)]  # triangle: max core is 2
    got = k_core(ray.data.from_arrow(_edge_table(edges)), k=3)
    assert got.count() == 0


def test_neighbor_jaccard_hand_computed(ray_session) -> None:
    from promptner_ray.functions.graphops import neighbor_jaccard

    # K4 on {0,1,2,3} plus pendant 3-9: N(0)={1,2,3} N(1)={0,2,3}
    # N(2)={0,1,3} N(3)={0,1,2,9} N(9)={3}.  Within the clique every
    # pair shares the other two members; pairs involving 9 share at most
    # one neighbor and fall below min_common=2.
    edges = [
        (0, 1, 1), (1, 0, 3),  # duplicate undirected edge, both ways
        (0, 2, 1), (0, 3, 1), (1, 2, 1), (3, 1, 1), (2, 3, 1),
        (3, 9, 2), (7, 7, 1),  # self-loop ignored
    ]
    got = (
        neighbor_jaccard(ray.data.from_arrow(_edge_table(edges)))
        .to_pandas()
        .set_index(["a", "b"])
    )
    expect = {
        (0, 1): 2 / 4, (0, 2): 2 / 4, (1, 2): 2 / 4,
        (0, 3): 2 / 5, (1, 3): 2 / 5, (2, 3): 2 / 5,
    }
    assert {
        k: v for k, v in got["jaccard"].to_dict().items()
    } == expect
    assert (got["common"] == 2).all()


def test_neighbor_jaccard_pivot_cap(ray_session) -> None:
    from promptner_ray.functions.graphops import neighbor_jaccard

    # Same graph, cap=3: node 3 (degree 4) no longer pivots, so clique
    # pairs NOT containing 3 lose one shared witness (common drops to 1,
    # below min_common) while pairs containing 3 keep both low-degree
    # witnesses; d_a/d_b stay FULL degrees.
    edges = [
        (0, 1, 1), (0, 2, 1), (0, 3, 1), (1, 2, 1), (1, 3, 1),
        (2, 3, 1), (3, 9, 2),
    ]
    got = (
        neighbor_jaccard(
            ray.data.from_arrow(_edge_table(edges)), max_pivot_degree=3
        )
        .to_pandas()
        .set_index(["a", "b"])
    )
    assert got["jaccard"].to_dict() == {
        (0, 3): 2 / 5, (1, 3): 2 / 5, (2, 3): 2 / 5,
    }
    assert got.loc[(0, 3), "d_b"] == 4


def test_clustering_coefficient_hand_computed(ray_session) -> None:
    from promptner_ray.functions.graphops import clustering_coefficient

    # K4 {0,1,2,3} + pendant 3-9 + isolated 2-path 5-6: clique members
    # 0,1,2 close every wedge (coefficient 1), node 3's pendant opens
    # wedges (3 triangles over d=4 → 0.5), degree-1 nodes are excluded.
    edges = [
        (0, 1, 1), (0, 2, 1), (0, 3, 1), (1, 2, 1), (1, 3, 1),
        (2, 3, 1), (3, 9, 2), (5, 6, 1),
    ]
    got = (
        clustering_coefficient(ray.data.from_arrow(_edge_table(edges)))
        .to_pandas()
        .set_index("entity_id")
    )
    assert got["coefficient"].to_dict() == {0: 1.0, 1: 1.0, 2: 1.0, 3: 0.5}
    assert got.loc[3, "n_triangles"] == 3 and got.loc[3, "d"] == 4


def test_label_propagation_two_cliques(ray_session) -> None:
    from promptner_ray.functions.graphops import (
        connected_components,
        label_propagation,
    )

    # Two K4 cliques bridged by a single edge 3-10: ONE component but
    # TWO communities — each clique converges to its minimum id.
    edges = []
    for clique in ((0, 1, 2, 3), (10, 11, 12, 13)):
        for i, x in enumerate(clique):
            for y in clique[i + 1:]:
                edges.append((x, y, 1))
    edges.append((3, 10, 1))
    ds = ray.data.from_arrow(_edge_table(edges))
    comm = (
        label_propagation(ds)
        .to_pandas()
        .set_index("entity_id")["community"]
        .to_dict()
    )
    assert comm == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10, 13: 10}
    # sanity: CC sees a single component over the same pairs
    und = {(min(a, b), max(a, b)) for a, b, _ in edges}
    pairs = ray.data.from_items(
        [{"doc_a": a, "doc_b": b} for a, b in sorted(und)]
    )
    cc = connected_components(pairs).to_pandas()["component"].unique()
    assert list(cc) == [0]


def test_personalized_pagerank_concentrates_on_seed_side(ray_session) -> None:
    """seeds= gates initial mass, teleport, and dangling share to the
    seed set: nodes unreachable from the seeds get rank ~0, and the
    seed component carries (almost) all the mass — while seeds=None
    remains the uniform op."""
    # two disconnected 3-cycles: {1,2,3} and {10,11,12}
    edges = [
        (1, 2, 1), (2, 3, 1), (3, 1, 1),
        (10, 11, 1), (11, 12, 1), (12, 10, 1),
    ]
    ds = ray.data.from_arrow(_edge_table(edges))
    ppr = {
        r["entity_id"]: r["rank"]
        for r in pagerank(ds, seeds=[1]).take_all()
    }
    assert sum(ppr.values()) > 0.99  # fixed-point floor loses < 1e-12
    assert ppr[10] == 0.0 and ppr[11] == 0.0 and ppr[12] == 0.0
    assert ppr[1] > ppr[2] > 0 and ppr[3] > 0
    uni = {
        r["entity_id"]: r["rank"]
        for r in pagerank(ds).take_all()
    }
    # uniform op: the two symmetric components split the mass evenly
    assert abs(sum(uni[n] for n in (10, 11, 12)) - 0.5) < 1e-9


def test_personalized_pagerank_ignores_absent_seeds(ray_session) -> None:
    """A seed id absent from the graph must not shrink total rank mass:
    normalization uses seeds PRESENT in the node set (the SQL twin's
    seeds CTE only ever selects existing nodes).  An all-absent seed
    list is a loud error, not a silent zero-mass run."""
    import pytest

    edges = [(1, 2, 1), (2, 3, 1), (3, 1, 1)]
    ds = ray.data.from_arrow(_edge_table(edges))
    with_ghost = {
        r["entity_id"]: r["rank"]
        for r in pagerank(ds, seeds=[1, 999_999]).take_all()
    }
    clean = {
        r["entity_id"]: r["rank"]
        for r in pagerank(ds, seeds=[1]).take_all()
    }
    assert with_ghost == clean
    assert sum(with_ghost.values()) > 0.99
    with pytest.raises(ValueError, match="no seed id"):
        pagerank(ds, seeds=[999_999]).take_all()


def test_personalized_pagerank_bsp_ignores_absent_seeds(ray_session) -> None:
    """BSP twin of the absent-seed normalization check."""
    import pytest

    from promptner_ray.functions.graphbsp import PageRankBSP

    edges = [(1, 2, 1), (2, 3, 1), (3, 1, 1)]
    ds = ray.data.from_arrow(_edge_table(edges))
    h = PageRankBSP(ds, num_partitions=2)
    try:
        with_ghost = {
            r["entity_id"]: r["rank"]
            for r in h.run(seeds=[1, 999_999]).take_all()
        }
        clean = {
            r["entity_id"]: r["rank"]
            for r in h.run(seeds=[1]).take_all()
        }
        assert with_ghost == clean
        with pytest.raises(ValueError, match="no seed id"):
            h.run(seeds=[999_999])
    finally:
        h.close()


def _numpy_hits(edges, iters=5):
    """Float L1-normalized HITS — the textbook semantics graphops.hits
    quantizes.  Compared on per-node SHARES (value/Σ) because the
    fixed-point rescale ``raw // max(total // S, 1)`` normalizes the
    total only up to a per-round uniform factor in [1, 2)."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = np.zeros(n)
        for s, t, w in edges:
            auth[idx[t]] += hub[idx[s]] * w
        auth /= auth.sum()
        hub = np.zeros(n)
        for s, t, w in edges:
            hub[idx[s]] += auth[idx[t]] * w
        hub /= hub.sum()
    return (
        dict(zip(nodes, auth / auth.sum())),
        dict(zip(nodes, hub / hub.sum())),
    )


def test_hits_matches_numpy_reference(ray_session) -> None:
    from promptner_ray.functions.graphops import hits

    rng = np.random.default_rng(7)
    edges = []
    seen = set()
    for _ in range(80):
        s, t = rng.integers(0, 18, 2)
        if s != t and (int(s), int(t)) not in seen:
            seen.add((int(s), int(t)))
            edges.append((int(s), int(t), int(rng.integers(1, 5))))
    edges.append((4, 30, 2))  # node 30: authority only (no out-edges)
    df = hits(ray.data.from_arrow(_edge_table(edges))).to_pandas()
    got_auth = df.set_index("entity_id")["auth"].to_dict()
    got_hub = df.set_index("entity_id")["hub"].to_dict()
    want_auth, want_hub = _numpy_hits(edges)
    assert set(got_auth) == set(want_auth)
    ta = sum(got_auth.values())
    th = sum(got_hub.values())
    # 2^-30 fixed-point quantization accumulated over 5 rounds
    assert all(
        abs(got_auth[k] / ta - want_auth[k]) < 1e-5 for k in want_auth
    )
    assert all(
        abs(got_hub[k] / th - want_hub[k]) < 1e-5 for k in want_hub
    )


def test_hits_star_graph_roles(ray_session) -> None:
    """Sources of a star are pure hubs, the center a pure authority."""
    from promptner_ray.functions.graphops import hits

    edges = [(i, 99, 1) for i in range(5)] + [(99, 100, 1)]
    df = hits(ray.data.from_arrow(_edge_table(edges))).to_pandas()
    byid = df.set_index("entity_id")
    assert byid["auth"].idxmax() == 99
    # every spoke is an equally-top hub; the center's hub score is the
    # (weaker) 99->100 path
    hubs = byid["hub"]
    assert all(hubs[i] == hubs[0] for i in range(5))
    assert hubs[0] > hubs[99] >= 0
    # the pure-sink node 100 has zero hub mass, nonzero authority
    assert hubs[100] == 0.0 and byid["auth"][100] > 0


def test_reciprocity_brute_force(ray_session) -> None:
    """reciprocity == exhaustive mirror lookup over the distinct
    non-loop edge set, including a self-loop (ignored), a mutual pair,
    and a duplicate edge (deduped before counting)."""
    from promptner_ray.functions.graphops import reciprocity

    rng = np.random.default_rng(11)
    edges = sorted(
        {
            (int(s), int(t))
            for s, t in rng.integers(0, 60, size=(400, 2))
        }
    )
    edges += [(5, 5), edges[0]]  # self-loop + duplicate
    tbl = _edge_table([(s, t, 1) for s, t in edges])
    dedges = {(s, t) for s, t in edges if s != t}
    n_recip = sum(1 for (s, t) in dedges if (t, s) in dedges)
    row = reciprocity(ray.data.from_arrow(tbl)).to_pandas().iloc[0]
    assert row["edges"] == len(dedges)
    assert row["reciprocal_edges"] == n_recip
    assert row["reciprocity"] == n_recip / len(dedges)


def test_assortativity_brute_force(ray_session) -> None:
    """assortativity == the Pearson correlation of (out_deg(src),
    in_deg(dst)) over the distinct directed edges, computed exactly."""
    import math

    from promptner_ray.functions.graphops import assortativity

    rng = np.random.default_rng(13)
    dedges = sorted(
        {
            (int(s), int(t))
            for s, t in rng.integers(0, 50, size=(300, 2))
        }
    )
    tbl = _edge_table([(s, t, 1) for s, t in dedges])
    outd: dict[int, int] = {}
    ind: dict[int, int] = {}
    for s, t in dedges:
        outd[s] = outd.get(s, 0) + 1
        ind[t] = ind.get(t, 0) + 1
    xs = [outd[s] for s, t in dedges]
    ys = [ind[t] for s, t in dedges]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    want = float(n * sxy - sx * sy) / (
        math.sqrt(float(n * sxx - sx * sx))
        * math.sqrt(float(n * syy - sy * sy))
    )
    row = assortativity(ray.data.from_arrow(tbl)).to_pandas().iloc[0]
    assert row["edges"] == n
    assert row["assortativity"] == want  # bit-exact, not approx


def test_assortativity_degenerate_is_zero(ray_session) -> None:
    """A k-regular graph has zero degree variance on both ends — the
    correlation is undefined and pinned to 0.0 (the SQL CASE twin)."""
    from promptner_ray.functions.graphops import assortativity

    ring = [(i, (i + 1) % 6, 1) for i in range(6)]
    row = (
        assortativity(ray.data.from_arrow(_edge_table(ring)))
        .to_pandas()
        .iloc[0]
    )
    assert row["assortativity"] == 0.0


def test_bowtie_hand_computed(ray_session) -> None:
    """Hand-built bow-tie: a 3-cycle core {0,1,2}, an IN node 10 → 0,
    an OUT node 2 → 20, and a disconnected pair 30 → 31."""
    from promptner_ray.functions.graphops import bowtie

    edges = [
        (0, 1, 1), (1, 2, 1), (2, 0, 1),  # core cycle
        (10, 0, 1),  # IN: reaches the seed, unreachable from it
        (2, 20, 1),  # OUT
        (30, 31, 1),  # neither direction
    ]
    got = {
        r["region"]: r["n_nodes"]
        for _, r in bowtie(
            ray.data.from_arrow(_edge_table(edges)), source=0
        )
        .to_pandas()
        .iterrows()
    }
    assert got == {"core": 3, "in": 1, "out": 1, "other": 2}


def test_bowtie_depth_cap(ray_session) -> None:
    """max_hops caps both BFS passes: a chain longer than the cap
    pushes the far tail into `other`."""
    from promptner_ray.functions.graphops import bowtie

    chain = [(i, i + 1, 1) for i in range(6)]  # 0 → 1 → … → 6
    got = {
        r["region"]: r["n_nodes"]
        for _, r in bowtie(
            ray.data.from_arrow(_edge_table(chain)), source=0, max_hops=3
        )
        .to_pandas()
        .iterrows()
    }
    # seed itself is `core` (hop 0 in both passes); 1..3 are OUT within
    # the cap; 4..6 are beyond it
    assert got == {"core": 1, "out": 3, "other": 3}


def test_k_truss_keeps_k4_drops_pendant_triangle(ray_session) -> None:
    """K4 on {1,2,3,4} is a 4-truss (every edge in 2 triangles); a
    triangle {3,4,9} hanging off one K4 edge contributes two support-1
    edges that peel away without disturbing the K4."""
    from promptner_ray.functions.graphops import k_truss

    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (3, 9), (4, 9)]
    got = (
        k_truss(ray.data.from_arrow(_edge_table([(a, b, 1) for a, b in und])))
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert list(map(tuple, got[["a", "b"]].values)) == k4
    assert got["support"].tolist() == [2] * 6


def test_k_truss_cascade_to_empty(ray_session) -> None:
    """A triangle strip (1-2-3, 2-3-4, 3-4-5) has no 4-truss: the
    support-1 border edges peel first, then the spine loses its
    triangles — the cascade must run to the empty fixpoint."""
    from promptner_ray.functions.graphops import k_truss

    und = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)]
    got = k_truss(
        ray.data.from_arrow(_edge_table([(a, b, 1) for a, b in und]))
    ).to_pandas()
    assert len(got) == 0


def _brute_scc(edges, nodes):
    """Floyd-Warshall mutual reachability on a tiny graph."""
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    reach = [[i == j for j in range(n)] for i in range(n)]
    for s, t in edges:
        reach[idx[s]][idx[t]] = True
    for k in range(n):
        for i in range(n):
            if reach[i][k]:
                row_k = reach[k]
                reach[i] = [a or b for a, b in zip(reach[i], row_k)]
    out = {}
    for v in nodes:
        out[v] = min(
            u for u in nodes
            if reach[idx[u]][idx[v]] and reach[idx[v]][idx[u]]
        )
    return out


def test_scc_matches_brute_force(ray_session) -> None:
    """2-cycle, 3-cycle, a chain between them, a self-loop singleton,
    and a dangling tail — components must be the mutual-reachability
    classes with min-id labels."""
    from promptner_ray.functions.graphops import scc

    edges = [
        (1, 2), (2, 1),              # SCC {1, 2}
        (3, 4), (4, 5), (5, 3),      # SCC {3, 4, 5}
        (2, 3),                      # one-way bridge
        (6, 6),                      # self-loop singleton
        (5, 7), (7, 8),              # dangling chain
    ]
    nodes = sorted({x for e in edges for x in e})
    got = (
        scc(
            ray.data.from_arrow(
                _edge_table([(a, b, 1) for a, b in edges])
            ).repartition(3)
        )
        .to_pandas()
        .set_index("entity_id")["scc_id"]
        .to_dict()
    )
    assert got == _brute_scc(edges, nodes)


def test_scc_random_graph_matches_brute_force(ray_session) -> None:
    import numpy as np

    from promptner_ray.functions.graphops import scc

    rng = np.random.default_rng(13)
    edges = sorted(
        {
            (int(s), int(t))
            for s, t in rng.integers(0, 14, size=(60, 2))
            if s != t
        }
    )
    nodes = sorted({x for e in edges for x in e})
    got = (
        scc(ray.data.from_arrow(_edge_table([(a, b, 1) for a, b in edges])))
        .to_pandas()
        .set_index("entity_id")["scc_id"]
        .to_dict()
    )
    assert got == _brute_scc(edges, nodes)


def test_modularity_two_triangles_bridge(ray_session) -> None:
    from promptner_ray.functions.graphops import modularity

    # Two triangles {1,2,3} and {4,5,6} bridged by 3-4: LPA finds the
    # two triangles; hand-computed Q per community = 3/7 - (7/14)^2.
    edges = [(1, 2, 1), (1, 3, 1), (2, 3, 1),
             (4, 5, 1), (4, 6, 1), (5, 6, 1), (3, 4, 1)]
    out = (
        modularity(ray.data.from_arrow(_edge_table(edges)))
        .to_pandas()
        .set_index("community")
        .sort_index()
    )
    assert list(out.index) == [1, 4]
    assert list(out["n_nodes"]) == [3, 3]
    assert list(out["inner_edges"]) == [3, 3]
    assert list(out["degree_sum"]) == [7, 7]
    expect = 3.0 / 7.0 - (7.0 / 14.0) ** 2
    assert all(abs(q - expect) < 1e-12 for q in out["q_contrib"])
    # total Q of the partition is comfortably positive
    assert out["q_contrib"].sum() > 0.35


def test_modularity_single_community_is_zero(ray_session) -> None:
    from promptner_ray.functions.graphops import modularity

    # One triangle: everything in one community → inner = m and
    # degree_sum = 2m, so Q = 1 - 1 = 0 exactly.
    edges = [(1, 2, 1), (1, 3, 1), (2, 3, 1)]
    out = modularity(ray.data.from_arrow(_edge_table(edges))).to_pandas()
    assert len(out) == 1
    assert float(out["q_contrib"].iloc[0]) == 0.0


def test_mis_coloring_proper_and_deterministic(ray_session) -> None:
    from promptner_ray.functions.graphops import mis_coloring

    rng = np.random.default_rng(11)
    n = 40
    edges = set()
    while len(edges) < 80:
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    rows = [(a, b, 1) for a, b in sorted(edges)]
    ds = ray.data.from_arrow(_edge_table(rows))
    out = mis_coloring(ds).to_pandas()
    color = dict(zip(out["entity_id"], out["color"]))
    # every endpoint colored exactly once
    nodes = {x for e in edges for x in e}
    assert set(color) == nodes and len(out) == len(nodes)
    # proper: no edge joins two same-colored nodes
    assert all(color[a] != color[b] for a, b in edges)
    # round-0 winners are exactly the local priority minima
    from promptner_ray.functions.graphops import _mis_prio

    prio = dict(zip(sorted(nodes), _mis_prio(sorted(nodes))))
    nbrs: dict = {v: set() for v in nodes}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    minima = {
        v
        for v in nodes
        if all(
            (prio[v], v) < (prio[u], u) for u in nbrs[v]
        )
    }
    assert {v for v, c in color.items() if c == 0} == minima
    # deterministic under different partitioning
    out2 = mis_coloring(ds.repartition(7)).to_pandas()
    assert dict(zip(out2["entity_id"], out2["color"])) == color
    # the DISTRIBUTED rounds (tail-local gate forced off) produce the
    # exact same colors — the two execution paths share one rule
    out3 = mis_coloring(ds, local_nodes=0).to_pandas()
    assert dict(zip(out3["entity_id"], out3["color"])) == color


def test_betweenness_diamond_exact(ray_session) -> None:
    from promptner_ray.functions.graphops import BC_SCALE, betweenness

    # diamond 1→2, 1→3, 2→4, 3→4: from source 1, σ(4)=2 and the two
    # middles each carry δ = (1/2)·(1+0) → bc exactly 0.5; the sink
    # carries 0.  Fixed-point: SCALE // 2.
    edges = [(1, 2, 1), (1, 3, 1), (2, 4, 1), (3, 4, 1)]
    ds = ray.data.from_arrow(_edge_table(edges))
    out = (
        betweenness(ds, sources=[1])
        .to_pandas()
        .set_index("entity_id")
        .sort_index()
    )
    assert list(out.index) == [2, 3, 4]
    assert out.loc[2, "bc_fp"] == BC_SCALE // 2
    assert out.loc[3, "bc_fp"] == BC_SCALE // 2
    assert out.loc[4, "bc_fp"] == 0
    assert out.loc[2, "bc"] == 0.5
    # chain through the middles: source 1 AND source 2 accumulate on 4's
    # predecessors; partition count must not change a single bit
    out2 = betweenness(
        ds.repartition(5), sources=[1, 2]
    ).to_pandas().set_index("entity_id").sort_index()
    out3 = betweenness(
        ds, sources=[1, 2]
    ).to_pandas().set_index("entity_id").sort_index()
    assert out2.equals(out3)
    # source 2's path 2→4 adds nothing to the middles (4 is its level 1)
    assert out2.loc[2, "bc_fp"] == BC_SCALE // 2
