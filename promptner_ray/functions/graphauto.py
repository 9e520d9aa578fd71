"""Size-thresholded plan selection for iterative graph analytics.

Every iterative op in this package ships as a twin pair: a DATAFLOW
plan (`graphops` / `hyperball` — pure Ray Data exchanges, fully
SQL-oracle-checkable, but each round re-pays ~2-3 edge-sized exchange
latencies, which ANTI-scales with parallelism: measured 2→8 CPUs
efficiency 0.17 at bench scale) and a BSP plan (`graphbsp` — static CSR
shards on an actor pool, one scatter/gather wave per round; 2.3-6.5×
faster on the real 5.05M-edge web graph and the designated 100 TB scale
path, see SCALE.md).  The twins are BIT-IDENTICAL by construction
(integer fixed-point folds commute; pinned by tests/test_graphbsp.py),
so plan choice is purely physical.

This module applies the same size-thresholded auto-switch idiom the
broadcast joins use (`relational.py` / `pipelines/kg.py`): below
``BSP_EDGE_THRESHOLD`` edges the per-job actor-pool spin-up + shard
build outweighs the per-round exchange savings and the dataflow plan
wins (a 903-edge KG toy: sub-second either way, dataflow avoids ~1-2 s
of setup); above it the per-round exchange tax dominates and the BSP
plan wins by multiples.  The threshold is deliberately conservative —
routing a mid-size graph to BSP costs a couple of setup seconds;
routing a huge graph to dataflow costs a multiple of the whole job.

The input edge Dataset is materialized once here (`count()` would
otherwise re-execute the upstream pipeline, and BOTH downstream plans
materialize their edge input anyway — this just hoists that pin one
level up, adding no extra copy).

The per-op ``queries()`` entries keep calling the explicit twins so the
driver's correctness gate continues to hash-check BOTH execution paths;
these ``*_auto`` wrappers are the user-facing entry points.
"""

from __future__ import annotations

BSP_EDGE_THRESHOLD = 250_000


def _prep(edges, threshold: int):
    """Materialize the edge input once and decide the plan."""
    edges = edges.materialize()
    return edges, use_bsp(edges.count(), threshold)


def use_bsp(n_edges: int, threshold: int = BSP_EDGE_THRESHOLD) -> bool:
    """The routing rule, exposed pure for tests: BSP at or above the
    edge threshold, dataflow below."""
    return n_edges >= threshold


def pagerank_auto(
    edges,
    iters: int = 8,
    damping: float = 0.85,
    num_partitions: int | None = None,
    seeds=None,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """PageRank / personalized PageRank (``seeds=``) with automatic
    plan selection.  Twins: :func:`graphops.pagerank` /
    :func:`graphbsp.pagerank_bsp` (shared oracle: ``kg_pagerank``)."""
    from . import graphbsp, graphops

    edges, big = _prep(edges, threshold)
    fn = graphbsp.pagerank_bsp if big else graphops.pagerank
    return fn(
        edges,
        iters=iters,
        damping=damping,
        num_partitions=num_partitions,
        seeds=seeds,
    )


def bfs_hops_auto(
    edges,
    source: int,
    max_hops: int = 15,
    num_partitions: int | None = None,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """Single-source BFS reachability.  Twins: :func:`graphops.bfs_hops`
    / :func:`graphbsp.bfs_bsp` (shared oracle: ``kg_reachability``)."""
    from . import graphbsp, graphops

    edges, big = _prep(edges, threshold)
    fn = graphbsp.bfs_bsp if big else graphops.bfs_hops
    return fn(edges, source, max_hops=max_hops, num_partitions=num_partitions)


def connected_components_auto(
    pairs,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 10,
    num_partitions: int | None = None,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """Connected components over a pair table.  Twins:
    :func:`graphops.connected_components` / :func:`graphbsp.components_bsp`
    (shared oracles: ``dedup_components`` / ``kg_alias_clusters``)."""
    from . import graphbsp, graphops

    pairs, big = _prep(pairs, threshold)
    fn = graphbsp.components_bsp if big else graphops.connected_components
    return fn(pairs, a=a, b=b, max_iters=max_iters, num_partitions=num_partitions)


def k_core_auto(
    edges,
    k: int = 3,
    max_iters: int = 30,
    num_partitions: int | None = None,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """k-core peeling.  Twins: :func:`graphops.k_core` /
    :func:`graphbsp.k_core_bsp` (shared oracle: ``kg_kcore``)."""
    from . import graphbsp, graphops

    edges, big = _prep(edges, threshold)
    fn = graphbsp.k_core_bsp if big else graphops.k_core
    return fn(edges, k=k, max_iters=max_iters, num_partitions=num_partitions)


def label_propagation_auto(
    edges,
    max_iters: int = 10,
    num_partitions: int | None = None,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """Label-propagation communities.  Twins:
    :func:`graphops.label_propagation` /
    :func:`graphbsp.label_propagation_bsp` (shared oracle:
    ``kg_communities``)."""
    from . import graphbsp, graphops

    edges, big = _prep(edges, threshold)
    fn = graphbsp.label_propagation_bsp if big else graphops.label_propagation
    return fn(edges, max_iters=max_iters, num_partitions=num_partitions)


def random_walks_auto(
    edges,
    walk_len: int = 8,
    walks_per_node: int = 2,
    seed: int = 42,
    num_partitions: int | None = None,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """DeepWalk corpus generation.  Twins: :func:`graphops.random_walks`
    / :func:`graphbsp.random_walks_bsp` (shared oracle:
    ``kg_random_walks``)."""
    from . import graphbsp, graphops

    edges, big = _prep(edges, threshold)
    fn = graphbsp.random_walks_bsp if big else graphops.random_walks
    return fn(
        edges,
        walk_len=walk_len,
        walks_per_node=walks_per_node,
        seed=seed,
        num_partitions=num_partitions,
    )


def hits_auto(
    edges,
    iters: int = 5,
    num_partitions: int | None = None,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """HITS hubs/authorities.  Twins: :func:`graphops.hits` /
    :func:`graphbsp.hits_bsp` (shared oracle: ``kg_hits``)."""
    from . import graphbsp, graphops

    edges, big = _prep(edges, threshold)
    fn = graphbsp.hits_bsp if big else graphops.hits
    return fn(edges, iters=iters, num_partitions=num_partitions)


def bowtie_auto(
    edges,
    source: int,
    max_hops: int = 15,
    num_partitions: int | None = None,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """Broder bow-tie decomposition.  Twins: :func:`graphops.bowtie` /
    :func:`graphbsp.bowtie_bsp` (shared oracle: ``kg_bowtie``)."""
    from . import graphbsp, graphops

    edges, big = _prep(edges, threshold)
    fn = graphbsp.bowtie_bsp if big else graphops.bowtie
    return fn(edges, source, max_hops=max_hops, num_partitions=num_partitions)


def betweenness_auto(
    edges,
    sources,
    max_depth: int = 6,
    num_partitions: int | None = None,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """k-source Brandes betweenness.  Twins: :func:`graphops.betweenness`
    / :func:`graphbsp.betweenness_bsp` (shared oracle:
    ``kg_betweenness``)."""
    from . import graphbsp, graphops

    edges, big = _prep(edges, threshold)
    fn = graphbsp.betweenness_bsp if big else graphops.betweenness
    return fn(
        edges,
        sources,
        max_depth=max_depth,
        num_partitions=num_partitions,
    )


def hyperball_auto(
    edges,
    iters: int = 4,
    num_partitions: int | None = None,
    p: int = 4,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """HyperBall neighbourhood-function sketches at precision ``p``.
    Twins: :func:`hyperball.hyperball` / :func:`graphbsp.hyperball_bsp`
    (shared oracle: ``kg_hyperball``)."""
    from . import graphbsp, hyperball

    edges, big = _prep(edges, threshold)
    fn = graphbsp.hyperball_bsp if big else hyperball.hyperball
    return fn(edges, iters=iters, num_partitions=num_partitions, p=p)


def harmonic_auto(
    edges,
    iters: int = 4,
    num_partitions: int | None = None,
    p: int = 4,
    threshold: int = BSP_EDGE_THRESHOLD,
):
    """Harmonic centrality (HyperBall "in" direction) at precision
    ``p``.  Twins: :func:`hyperball.harmonic_centrality` /
    :func:`graphbsp.harmonic_bsp` (shared oracle: ``kg_harmonic``)."""
    from . import graphbsp, hyperball

    edges, big = _prep(edges, threshold)
    fn = graphbsp.harmonic_bsp if big else hyperball.harmonic_centrality
    return fn(edges, iters=iters, num_partitions=num_partitions, p=p)
