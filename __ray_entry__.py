"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on a deterministic synthetic
pages corpus derived from sf0.001.  ``queries()`` exposes every
implemented operator (SURVEY.md §2 + the training-data suite) as a
callable over ``sf_dir``; ``oracle_sql()`` gives the DuckDB-equivalent
SQL for every SQL-expressible one (same column names, so the driver's
order-insensitive value-hash matches).  KG-pipeline queries operate on a
synthesized Common-Crawl-style ``pages`` table (BASELINE.json
input_hint); their oracles are DuckDB SQL over the corpus parquet and the
exported stage tables (``promptner_ray/pipelines/export.py``) — each
downstream stage (sentence split, triple induction, canonicalization,
edge naming, simhash, winnowing) is re-implemented in pure SQL over its
upstream table.  Rows-only queries remaining: the approximate-NN pair
(recall-gated in tests/test_similarity_recall.py), the scalar eval
summaries (gated by the in-repo single-process oracle), and the
model-dependent typed-mentions pass.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import pathlib
from collections.abc import Callable
from typing import Any

# Synthetic KG corpus sizing per scale-factor directory (deterministic,
# cached under /tmp/promptner_corpus/<sf-name>).
_CORPUS_DOCS = {"sf0.001": 96, "sf0.01": 192, "sf0.1": 768}
_DEFAULT_DOCS = 192
KNN_QUERIES = 10
KNN_K = 10
COSINE_THRESHOLD = 0.4
JACCARD_THRESHOLD = 0.6
ENTITY_MERGE_JACCARD = 0.5


def _read(sf_dir: str, table: str):
    import ray

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet")


def _corpus_root(sf_dir: str) -> pathlib.Path:
    from promptner_ray.sources.corpus import ensure_corpus

    name = pathlib.Path(sf_dir).name
    n_docs = _CORPUS_DOCS.get(name, _DEFAULT_DOCS)
    return ensure_corpus(
        pathlib.Path("/tmp/promptner_corpus") / name,
        n_docs=n_docs,
        seed=42,
        sf_dir=sf_dir,
    )


def _pages(sf_dir: str):
    from promptner_ray.sources.corpus import read_pages

    return read_pages(_corpus_root(sf_dir))


def _kg_cfg():
    from promptner_ray.pipelines.kg import KGConfig

    return KGConfig(detect_concurrency=(1, 8))


def _kg_stage(sf_dir: str, stage: str):
    """Read one cached KG stage table for ``sf_dir``.

    The checkpointed pipeline (``pipelines/kg.py::run_kg`` via
    ``pipelines/export.py::ensure_kg_export``) runs ONCE per scale factor
    and leaves every stage as partitioned parquet; each ``kg_*`` query
    then reads its stage table instead of recomputing the whole
    pages→…→triples chain per query — the same export the SQL oracles
    read their UPSTREAM from (the oracle for stage N re-derives it in SQL
    from stage N−1's export, so the comparison stays independent).  The
    hive partition key (``part``/``bucket``) is an output-layout detail,
    not part of the logical schema, and is dropped on read.
    """
    import ray

    from promptner_ray.pipelines.export import ensure_kg_export

    root = ensure_kg_export(sf_dir)
    ds = ray.data.read_parquet(str(root / stage))
    drop = [c for c in ("part", "bucket") if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds


def _kg_docs_text(sf_dir: str):
    from promptner_ray.pipelines import kg

    return kg.docs_text(_pages(sf_dir), _kg_cfg())


def _kg_sentences(sf_dir: str):
    from promptner_ray.pipelines import kg

    return kg.sentences(_kg_docs_text(sf_dir), _kg_cfg())


def _kg_detected(sf_dir: str):
    return _kg_stage(sf_dir, "detected")


def _kg_mentions(sf_dir: str):
    return _kg_stage(sf_dir, "mentions")


def _kg_triples(sf_dir: str):
    return _kg_stage(sf_dir, "triples")


def _kg_links(sf_dir: str):
    return _kg_stage(sf_dir, "links")


def _kg_nodes(sf_dir: str):
    return _kg_stage(sf_dir, "nodes")


def _kg_edges(sf_dir: str):
    # Named edges as materialized by ``run_graph`` — which applies the
    # size-thresholded broadcast-vs-join naming switch
    # (pipelines/kg.py::run_graph); the query path shares that one
    # implementation instead of hardcoding a driver-side broadcast.
    return _kg_stage(sf_dir, "edges")


def _kg_edges_raw(sf_dir: str):
    """Unnamed weighted edge table (subj_id, pred, obj_id, weight) — the
    input of every graph-analytics operator below."""
    return _kg_stage(sf_dir, "edges_raw")


def _kg_degrees(sf_dir: str):
    from promptner_ray.functions.graphops import node_degrees

    return node_degrees(_kg_edges(sf_dir))


def _kg_pagerank(sf_dir: str):
    from promptner_ray.functions.graphops import pagerank

    return pagerank(_kg_edges(sf_dir))


def _kg_pagerank_bsp(sf_dir: str):
    """Same ranks, BSP actor-pool execution plan (static edge shards in
    actor state, per-round value-vector messages only — see
    functions/graphbsp.py).  Bit-identical fixed-point arithmetic, so
    the oracle SQL is literally `_pagerank_sql()` again."""
    from promptner_ray.functions.graphbsp import pagerank_bsp

    return pagerank_bsp(_kg_edges(sf_dir))


def _top_hub(edges) -> int:
    """Seed for the reachability queries: the entity with max out-weight
    (min-id tie-break).  A per-block argmax partial + constant-size
    driver reduce — the graph itself never leaves the object store."""
    import numpy as np
    import pyarrow as pa

    from promptner_ray.functions.graphops import node_degrees

    def best_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "entity_id": pa.array([], type=pa.int64()),
                    "w_out": pa.array([], type=pa.int64()),
                }
            )
        e = t.column("entity_id").to_numpy(zero_copy_only=False)
        w = t.column("w_out").to_numpy(zero_copy_only=False)
        i = np.lexsort((e, -w))[0]
        return pa.table(
            {
                "entity_id": pa.array([e[i]], type=pa.int64()),
                "w_out": pa.array([w[i]], type=pa.int64()),
            }
        )

    partials = (
        node_degrees(edges)
        .map_batches(best_block, batch_format="pyarrow")
        .take_all()  # one candidate row per block — constant-size
    )
    best = min(partials, key=lambda r: (-r["w_out"], r["entity_id"]))
    return int(best["entity_id"])


def _top_hubs(edges, k: int) -> list[int]:
    """Top-k hubs by (out-weight DESC, entity_id ASC) — the same
    per-block partial-top-k + constant-size driver merge as
    :func:`_top_hub`, generalized for the personalized-PageRank seed
    set (SQL twin: ``ORDER BY w_out DESC, entity_id ASC LIMIT k``)."""
    import numpy as np
    import pyarrow as pa

    from promptner_ray.functions.graphops import node_degrees

    def topk_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "entity_id": pa.array([], type=pa.int64()),
                    "w_out": pa.array([], type=pa.int64()),
                }
            )
        e = t.column("entity_id").to_numpy(zero_copy_only=False)
        w = t.column("w_out").to_numpy(zero_copy_only=False)
        idx = np.lexsort((e, -w))[:k]
        return pa.table(
            {
                "entity_id": pa.array(e[idx], type=pa.int64()),
                "w_out": pa.array(w[idx], type=pa.int64()),
            }
        )

    partials = (
        node_degrees(edges)
        .map_batches(topk_block, batch_format="pyarrow")
        .take_all()  # ≤ k rows per block — constant-size
    )
    best = sorted(partials, key=lambda r: (-r["w_out"], r["entity_id"]))[:k]
    return [int(r["entity_id"]) for r in best]


def _kg_ppr(sf_dir: str):
    """Personalized PageRank from the top-2 hubs: importance relative
    to the seed entities (related-entity expansion / neighborhood
    curation).  Same fixed-point arithmetic as kg_pagerank with seeded
    init/teleport/dangling, so the SQL unroll differs only in the seed
    CASEs."""
    from promptner_ray.functions.graphops import pagerank

    edges = _kg_edges(sf_dir).materialize()
    return pagerank(edges, seeds=_top_hubs(edges, 2))


def _kg_ppr_bsp(sf_dir: str):
    """Same personalized ranks, BSP actor-pool plan — bit-identical
    fixed-point arithmetic, so the oracle SQL is literally
    `_ppr_sql()` again (the one-oracle-two-plans pattern)."""
    from promptner_ray.functions.graphbsp import pagerank_bsp

    edges = _kg_edges(sf_dir).materialize()
    return pagerank_bsp(edges, seeds=_top_hubs(edges, 2))


def _kg_reachability(sf_dir: str):
    """Directed BFS hop distances from the top hub (max out-weight,
    min-id tie-break): the "what does the busiest entity influence in
    ≤ k steps" reachability query."""
    from promptner_ray.functions.graphops import bfs_hops

    edges = _kg_edges_raw(sf_dir).materialize()
    return bfs_hops(edges, source=_top_hub(edges))


def _kg_reachability_bsp(sf_dir: str):
    """Same hop distances, BSP actor-pool execution plan (frontier
    positions over static message structure — functions/graphbsp.py).
    Identical output to :func:`_kg_reachability`, so the oracle SQL is
    literally `_bfs_sql()` again — the same one-oracle-two-plans
    pattern as `kg_pagerank_bsp`."""
    from promptner_ray.functions.graphbsp import bfs_bsp

    edges = _kg_edges_raw(sf_dir).materialize()
    return bfs_bsp(edges, source=_top_hub(edges))


def _kg_walk_pairs(sf_dir: str):
    """Skip-gram (center, context, n) pairs from the deterministic walk
    corpus — the embedding-trainer input stream."""
    from promptner_ray.functions.graphops import random_walks, walk_pairs
    from promptner_ray.shuffle import sized_partitions

    walks = random_walks(_kg_edges_raw(sf_dir)).materialize()
    return walk_pairs(
        walks, num_partitions=sized_partitions(walks.count(), None)
    )


def _kg_alias_pairs(sf_dir: str):
    """Near-miss surface pairs (Levenshtein ≤ 1) via deletion-
    neighborhood blocking — the edit-distance stage of entity
    resolution.  The synthetic corpus is typo-free, so a hash-selected
    quarter of surfaces gets a deterministically planted variant first
    (disclosed injection, same idiom as the PII/URL queries); the
    oracle replays the injection and verifies with DuckDB's own
    ``levenshtein`` over a brute-force cross join."""
    import pyarrow as pa

    from promptner_ray.functions.editsim import alias_pairs, with_typo_variants

    from promptner_ray.shuffle import sized_partitions

    links = _kg_links(sf_dir)
    parts = sized_partitions(links.count(), None)
    surfaces = links.map_batches(
        lambda t: pa.table({"surface": t.column("surface_norm")}),
        batch_format="pyarrow",
    )
    return alias_pairs(with_typo_variants(surfaces), num_partitions=parts)


def _kg_alias_clusters(sf_dir: str):
    """Edit-distance pairs closed into alias clusters by the distributed
    connected-components pass — (entity_id, alias_id), alias_id = min
    entity id of the cluster (the same compose shape as
    ``kg_entity_merge``, with edit-distance candidates instead of
    structural ones)."""
    import pyarrow as pa

    from promptner_ray.functions.editsim import alias_pairs, with_typo_variants
    from promptner_ray.functions.graphops import connected_components

    from promptner_ray.shuffle import sized_partitions

    links = _kg_links(sf_dir)
    parts = sized_partitions(links.count(), None)
    surfaces = links.map_batches(
        lambda t: pa.table({"surface": t.column("surface_norm")}),
        batch_format="pyarrow",
    )
    pairs = alias_pairs(with_typo_variants(surfaces), num_partitions=parts)
    cc = connected_components(
        pairs, a="entity_a", b="entity_b", num_partitions=parts
    )
    return cc.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t.column("doc_id"),
                "alias_id": t.column("component"),
            }
        ),
        batch_format="pyarrow",
    )


def _kg_random_walks(sf_dir: str):
    """Deterministic DeepWalk-style corpus: 2 walks × ≤8 steps from
    every entity, neighbor choice a pure hash of (node, step, walk,
    seed) — bit-identical at any parallelism, replayed exactly by the
    recursive-CTE oracle."""
    from promptner_ray.functions.graphops import random_walks

    return random_walks(_kg_edges_raw(sf_dir))


def _kg_random_walks_bsp(sf_dir: str):
    """Same walk corpus on the BSP actor-pool plan (walkers circulate
    as (start, walk_no, next) triples over static CSR shards —
    functions/graphbsp.py).  Bit-identical to `kg_random_walks`, so the
    oracle SQL is `_walks_sql()` again."""
    from promptner_ray.functions.graphbsp import random_walks_bsp

    return random_walks_bsp(_kg_edges_raw(sf_dir))


def _kg_edge_times(sf_dir: str):
    from promptner_ray.pipelines import kg

    return kg.edge_times(_kg_triples(sf_dir), _pages(sf_dir))


def _kg_edges_asof(sf_dir: str):
    """Temporal KG snapshot: the edges already asserted at the corpus
    midpoint instant — (subj_id, pred, obj_id, first_seen, weight) for
    edges with first_seen ≤ T where T = (min + max)/2 of the page
    crawl timestamps (two scalar aggregates; integer midpoint, so both
    engines compute the identical cut).  The time-travel face of
    :func:`kg.edge_times` — "what did the graph know as of T"."""
    import pyarrow.compute as pc

    from promptner_ray.pipelines import kg

    pages = _pages(sf_dir)

    def ts_minmax(t):
        import pyarrow as pa

        ts = t.column("warc_ts").cast(pa.timestamp("us")).cast(pa.int64())
        if len(ts) == 0:
            return pa.table(
                {
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "lo": pa.array([pc.min(ts).as_py()], type=pa.int64()),
                "hi": pa.array([pc.max(ts).as_py()], type=pa.int64()),
            }
        )

    bounds = pages.map_batches(ts_minmax, batch_format="pyarrow").materialize()
    t_cut = (int(bounds.min("lo")) + int(bounds.max("hi"))) // 2
    et = kg.edge_times(_kg_triples(sf_dir), pages)

    def asof(t):
        kept = t.filter(pc.less_equal(t.column("first_seen"), t_cut))
        return kept.select(
            ["subj_id", "pred", "obj_id", "first_seen", "weight"]
        )

    return et.map_batches(asof, batch_format="pyarrow")


def _kg_pmi(sf_dir: str):
    from promptner_ray.functions.graphops import edge_pmi

    return edge_pmi(_kg_edges_raw(sf_dir))


def _kg_triangles(sf_dir: str):
    from promptner_ray.functions.graphops import triangle_counts

    return triangle_counts(_kg_edges_raw(sf_dir))


def _kg_entity_times(sf_dir: str):
    """Per-entity temporal profile over the mentions stage + page
    timestamps."""
    from promptner_ray.pipelines.kg import entity_times

    return entity_times(_kg_mentions(sf_dir), _pages(sf_dir))


def _kg_pred_cooc(sf_dir: str):
    """DIRT-style relation-synonym candidates: predicate pairs sharing
    distinct argument pairs."""
    from promptner_ray.functions.kgschema import pred_cooc

    return pred_cooc(_kg_triples(sf_dir))


def _kg_scc(sf_dir: str):
    """Strongly connected components of the directed entity graph
    (Orzan coloring; scc_id = min node id of the component)."""
    from promptner_ray.functions.graphops import scc

    return scc(_kg_edges_raw(sf_dir))


def _kg_ktruss(sf_dir: str):
    """Edge-level cohesion: the 4-truss of the entity graph (every kept
    edge in ≥ 2 triangles inside the truss)."""
    from promptner_ray.functions.graphops import k_truss

    return k_truss(_kg_edges_raw(sf_dir))


def _kg_schema(sf_dir: str):
    """Schema induction: (subj_type, pred, obj_type) signatures with
    triple support and distinct-entity-pair diversity."""
    from promptner_ray.functions.kgschema import schema_patterns

    return schema_patterns(_kg_triples(sf_dir))


def _kg_schema_filter(sf_dir: str):
    """Ontology-consistency gate: triples whose type signature carries
    ≥ 1/SCHEMA_KEEP_DEN of their predicate's support."""
    from promptner_ray.functions.kgschema import schema_filter

    return schema_filter(_kg_triples(sf_dir))


def _kg_paths(sf_dir: str):
    """Bounded 2-hop path enumeration through capped pivots."""
    from promptner_ray.functions.kgschema import path_counts

    return path_counts(_kg_edges_raw(sf_dir))


def _kg_negative_samples(sf_dir: str):
    """TransE-style corrupted-tail negatives over the node table."""
    from promptner_ray.functions.kgschema import negative_samples

    return negative_samples(_kg_edges_raw(sf_dir), _kg_nodes(sf_dir))


def _kg_clustering(sf_dir: str):
    from promptner_ray.functions.graphops import clustering_coefficient

    return clustering_coefficient(_kg_edges_raw(sf_dir))


def _kg_node_jaccard(sf_dir: str):
    from promptner_ray.functions.graphops import neighbor_jaccard

    return neighbor_jaccard(_kg_edges_raw(sf_dir))


def _kg_adamic_adar(sf_dir: str):
    """Inverse-log-weighted shared-neighbor scores (Adamic–Adar): the
    link-prediction refinement of neighbor-Jaccard, hash-exact because
    pivot weights ride as 2⁻⁴⁰ fixed-point int64."""
    from promptner_ray.functions.graphops import adamic_adar

    return adamic_adar(_kg_edges_raw(sf_dir))


def _kg_entity_merge(sf_dir: str):
    """Second-stage (structural) entity resolution: surface linking can't
    merge aliases that never share a sentence, so candidates come from
    neighbor-Jaccard ≥ threshold and are closed into merge clusters by
    the distributed connected-components pass — (entity_id, merged_id),
    merged_id = min entity id of the cluster."""
    import pyarrow as pa

    from promptner_ray.functions.graphops import (
        connected_components,
        neighbor_jaccard,
    )

    pairs = neighbor_jaccard(
        _kg_edges_raw(sf_dir), min_jaccard=ENTITY_MERGE_JACCARD
    )
    cc = connected_components(pairs, a="a", b="b")
    return cc.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t.column("doc_id"),
                "merged_id": t.column("component"),
            }
        ),
        batch_format="pyarrow",
    )


def _events_quantile_sketch(sf_dir: str):
    from promptner_ray.functions.sketch import quantile_sketch

    return quantile_sketch(_read(sf_dir, "events"))


def _events_user_sketch(sf_dir: str):
    from promptner_ray.functions.hll import grouped_hll_registers

    return grouped_hll_registers(_read(sf_dir, "events"))


def _kg_kcore(sf_dir: str):
    from promptner_ray.functions.graphops import k_core

    return k_core(_kg_edges_raw(sf_dir), k=3)


def _kg_kcore_bsp(sf_dir: str):
    """Same core on the BSP actor-pool plan (deaths ship as static-slot
    positions — functions/graphbsp.py).  Bit-identical to `kg_kcore`,
    so the oracle SQL is `_kcore_sql()` again."""
    from promptner_ray.functions.graphbsp import k_core_bsp

    return k_core_bsp(_kg_edges_raw(sf_dir), k=3)


def _kg_communities(sf_dir: str):
    """Synchronous label propagation — deterministic at any parallelism
    (min tie-break), so the recursive-CTE replay in ``_labelprop_sql``
    value-checks it; the two-clique convergence is also pinned in
    tests/test_graphops.py."""
    from promptner_ray.functions.graphops import label_propagation

    return label_propagation(_kg_edges_raw(sf_dir))


def _kg_modularity(sf_dir: str):
    """Newman modularity per LPA community — the partition-quality gate
    over the same undirected entity graph; ``q_contrib`` is one fixed
    float expression of integer inputs (bit-exact vs the SQL twin)."""
    from promptner_ray.functions.graphops import modularity

    return modularity(_kg_edges_raw(sf_dir))


def _kg_communities_bsp(sf_dir: str):
    """Same communities on the BSP actor-pool plan (vote-count combiner
    over static shards — functions/graphbsp.py).  Bit-identical to
    `kg_communities`, so the oracle SQL is `_labelprop_sql()` again."""
    from promptner_ray.functions.graphbsp import label_propagation_bsp

    return label_propagation_bsp(_kg_edges_raw(sf_dir))


def _wave_filter(parity: int):
    """Deterministic two-wave split of the triples stream by url hash —
    the sandbox stand-in for two crawl segments (shared by the
    incremental-merge and edge-diff queries; the SQL twins replay the
    same md5-parity predicate)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from promptner_ray.kernels.cleaning import surface_hash64

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        d = pc.dictionary_encode(urls)
        par = pa.array(
            [surface_hash64(u) % 2 for u in d.dictionary.to_pylist()],
            type=pa.int64(),
        )
        mask = pc.equal(pc.take(par, d.indices), parity)
        return batch.filter(mask)

    return fn


def _kg_edges_incremental(sf_dir: str):
    """Two crawl waves (url-hash split) processed into edge tables
    independently, then merged — must equal the batch ``edg`` table
    exactly (the oracle IS the batch SQL)."""
    from promptner_ray.pipelines import kg
    from promptner_ray.shuffle import sized_partitions

    triples = _kg_triples(sf_dir)
    parts = sized_partitions(triples.count(), None)
    waves = [
        kg.edges(
            triples.map_batches(_wave_filter(p), batch_format="pyarrow"),
            num_partitions=parts,
        )
        for p in (0, 1)
    ]
    return kg.merge_edge_tables(*waves, num_partitions=parts)


def _kg_edge_diff(sf_dir: str):
    """What the second crawl wave changed: edges whose weight differs
    between the wave-0 and wave-1 edge tables (new / changed /
    vanished), the incremental-maintenance signal for cache
    invalidation and re-scoring."""
    from promptner_ray.pipelines import kg
    from promptner_ray.shuffle import sized_partitions

    triples = _kg_triples(sf_dir)
    # cached-export read → metadata-only count; size the per-wave edge
    # aggregation and both diff joins to the data
    parts = sized_partitions(triples.count(), None)
    old, new = [
        kg.edges(
            triples.map_batches(_wave_filter(p), batch_format="pyarrow"),
            num_partitions=parts,
        )
        for p in (0, 1)
    ]
    return kg.edge_diff(old, new, num_partitions=parts)


def _cc_outlinks(sf_dir: str):
    from promptner_ray.functions.urls import outlinks

    return outlinks(_pages(sf_dir))


def _cc_latest_snapshot(sf_dir: str):
    from promptner_ray.functions.urls import latest_snapshot

    return latest_snapshot(_pages(sf_dir))


def _cc_anchor_texts(sf_dir: str):
    """Per-target anchor-text profile — the web's alias/label signal for
    entity canonicalization (how OTHER pages name the target)."""
    from promptner_ray.functions.urls import anchor_texts

    return anchor_texts(_pages(sf_dir))


def _cc_canonical_urls(sf_dir: str):
    """Crawl-frontier URL canonicalization (lowercased origin, fragment
    and tracking-param strip) over a disclosed deterministic URL-noise
    injection — the synthetic corpus's URLs are clean, so the noise
    gives the pass real work (the nav-banner idiom)."""
    from promptner_ray.functions.urls import canonical_urls

    return canonical_urls(_pages(sf_dir))


def _cc_url_dedup(sf_dir: str):
    """Keep one page per canonical URL form (smallest raw url) — exact
    frontier dedup through the shared first_occurrence machinery."""
    from promptner_ray.functions.urls import url_dedup

    return url_dedup(_pages(sf_dir))


def _sql_canonical_urls() -> str:
    from promptner_ray.functions.urls import sql_canonical_urls

    return sql_canonical_urls(_CORPUS_GLOB, _sql_hash64)


def _sql_url_dedup() -> str:
    from promptner_ray.functions.urls import sql_url_dedup

    return sql_url_dedup(_CORPUS_GLOB, _sql_hash64)


def _cc_anchor_link(sf_dir: str):
    """Alias→target linking dictionary: majority link target per anchor
    text (the inverse grouping of `cc_anchor_texts`) — the dictionary
    bootstrap entity linkers mine from the web graph."""
    from promptner_ray.functions.urls import anchor_link

    return anchor_link(_pages(sf_dir))


def _sql_anchor_link() -> str:
    from promptner_ray.functions.urls import sql_anchor_link

    return sql_anchor_link(_CORPUS_GLOB)


def _kg_grounding(sf_dir: str):
    """Anchor-dictionary entity grounding: each canonical KG entity
    whose normalized surface appears as web anchor text gets the web's
    majority link target as an external grounding URL (Spitkovsky &
    Chang 2012 composition of the links table × `cc_anchor_link`)."""
    from promptner_ray.functions.urls import (
        entity_anchor_dict,
        ground_entities,
    )

    return ground_entities(
        _kg_links(sf_dir), entity_anchor_dict(_pages(sf_dir))
    )


def _kg_grounding_sql() -> str:
    from promptner_ray.functions.urls import (
        sql_entity_anchor_link,
        sql_ground_entities,
    )

    return sql_ground_entities(
        sql_entity_anchor_link(_CORPUS_GLOB, _sql_hash64),
        _sql_links_cte(),
        _sql_norm,
    )


def _cc_section_graph(sf_dir: str):
    """Site-section contraction of the page link graph (host-level
    contraction on a multi-host corpus) — contracted map-side, one
    data-sized exchange."""
    from promptner_ray.functions.urls import section_graph

    return section_graph(_pages(sf_dir))


def _kg_hits(sf_dir: str):
    """HITS hubs/authorities over the constructed KG — L1-normalized
    fixed-point variant, bit-replayable by the DuckDB twin (same int64
    op sequence; see graphops.hits)."""
    from promptner_ray.functions.graphops import hits

    return hits(_kg_edges(sf_dir))


def _kg_reciprocity(sf_dir: str):
    """Directed link-symmetry summary of the KG — one row (edges,
    reciprocal_edges, reciprocity) over distinct non-loop edges."""
    from promptner_ray.functions.graphops import reciprocity

    return reciprocity(_kg_edges(sf_dir))


def _kg_assortativity(sf_dir: str):
    """Out-degree/in-degree Pearson correlation across the KG's
    distinct directed edges (Newman degree assortativity) — the final
    float is one shared int→double expression on both engines."""
    from promptner_ray.functions.graphops import assortativity

    return assortativity(_kg_edges(sf_dir))


def _kg_bowtie(sf_dir: str):
    """Broder bow-tie regions around the top hub: core / in / out /
    other node counts from one forward and one backward BFS (same seed
    rule and depth cap as `kg_reachability`)."""
    from promptner_ray.functions.graphops import bowtie

    edges = _kg_edges_raw(sf_dir).materialize()
    return bowtie(edges, source=_top_hub(edges))


def _kg_hyperball(sf_dir: str):
    """HyperBall neighborhood function (Boldi & Vigna 2013): per-node
    estimated 4-hop ball size from 16-register HLL sketches max-merged
    along the edges — the web-scale effective-diameter primitive.  The
    DOUBLE estimate is hash-exact vs the oracle (fixed-order float sum,
    shared α·m² literal, libm ln)."""
    from promptner_ray.functions.hyperball import hyperball

    return hyperball(_kg_edges(sf_dir))


def _hyperball_sql() -> str:
    from promptner_ray.functions.hyperball import sql_hyperball

    return sql_hyperball(_graph_edge_prologue())


def _kg_effective_diameter(sf_dir: str):
    """Interpolated 90%-effective diameter from the HyperBall rounds —
    the headline web-graph summary statistic; NF sums are 2⁻¹⁶
    fixed-point quantized per node so the global float sum commutes."""
    from promptner_ray.functions.hyperball import effective_diameter

    return effective_diameter(_kg_edges(sf_dir))


def _effective_diameter_sql() -> str:
    from promptner_ray.functions.hyperball import sql_effective_diameter

    return sql_effective_diameter(_graph_edge_prologue())


def _kg_harmonic(sf_dir: str):
    """Harmonic centrality ``Σ_{u≠v} 1/d(u,v)`` truncated at 4 hops,
    estimated from the incoming-reach HyperBall rounds — the paper's
    flagship geometric centrality.  DOUBLE column hash-exact vs the
    oracle (shared per-round estimate expression + fixed-order
    accumulation)."""
    from promptner_ray.functions.hyperball import harmonic_centrality

    return harmonic_centrality(_kg_edges(sf_dir))


def _harmonic_sql() -> str:
    from promptner_ray.functions.hyperball import sql_harmonic

    return sql_harmonic(_graph_edge_prologue())


def _kg_harmonic_bsp(sf_dir: str):
    """Same harmonic centralities with the per-round accumulation in
    shard state (graphbsp.harmonic_bsp) — bit-identical, shared
    oracle."""
    from promptner_ray.functions.graphbsp import harmonic_bsp

    return harmonic_bsp(_kg_edges(sf_dir))


def _kg_hyperball_bsp(sf_dir: str):
    """Same ball estimates on the BSP actor pool (16-wide register
    messages over static shards — graphbsp.hyperball_bsp); bit-identical,
    shared oracle."""
    from promptner_ray.functions.graphbsp import hyperball_bsp

    return hyperball_bsp(_kg_edges(sf_dir))


def _kg_bowtie_bsp(sf_dir: str):
    """Same bow-tie regions with both reachability passes on the BSP
    actor pool (graphbsp.bowtie_bsp) — identical output, shared
    oracle."""
    from promptner_ray.functions.graphbsp import bowtie_bsp

    edges = _kg_edges_raw(sf_dir).materialize()
    return bowtie_bsp(edges, source=_top_hub(edges))


def _kg_hits_bsp(sf_dir: str):
    """Same HITS scores, BSP actor-pool execution plan (static edge
    shards held in BOTH directions per actor, per-round value-vector
    messages only — graphbsp.HITSBSP).  Bit-identical fixed-point
    arithmetic (tests/test_graphbsp.py), so the oracle SQL is literally
    `_hits_sql()` again — the one-oracle-two-plans pattern."""
    from promptner_ray.functions.graphbsp import hits_bsp

    return hits_bsp(_kg_edges(sf_dir))


def _kg_export(sf_dir: str) -> str:
    """Materialize the KG stage tables once (cached) for the SQL oracles."""
    from promptner_ray.pipelines.export import ensure_kg_export

    return str(ensure_kg_export(sf_dir))


def _kg_release(sf_dir: str):
    """Annotated node table of the composed release pipeline."""
    from promptner_ray.pipelines.release import release_graph

    return release_graph(_pages(sf_dir), _kg_cfg())["nodes"]


REF_TRIPLES_ROOT = "/tmp/promptner_ref_triples"


def ensure_ref_triples_export(sf_dir: str) -> str:
    """Export the single-process oracle's triple MULTISET counts —
    (url, sent_id, subj, pred, obj, n_ref) — as plain parquet, so the
    ``kg_eval`` SQL twin can replay the P/R/F1 arithmetic against the
    SQL-rederived predicted triples.  Deterministic (seed-42 replay of
    the same corpus the engine reads); same export discipline as the
    centroid/LUT exports: one canonical table both engines consume."""
    import pathlib

    import pyarrow as pa
    import pyarrow.parquet as pq_

    name = pathlib.Path(sf_dir).name
    out_dir = pathlib.Path(REF_TRIPLES_ROOT) / name
    out = out_dir / "triples.parquet"
    if out.exists():
        return str(out)
    from collections import Counter

    from promptner_ray.pipelines.oracle import oracle_run

    n_docs = _CORPUS_DOCS.get(name, _DEFAULT_DOCS)
    ref = oracle_run(n_docs, seed=42, sf_dir=sf_dir)
    counts = Counter(tuple(t) for t in ref["triples"])
    keys = list(counts)
    tbl = pa.table(
        {
            "url": pa.array([k[0] for k in keys], type=pa.string()),
            "sent_id": pa.array([k[1] for k in keys], type=pa.int32()),
            "subj": pa.array([k[2] for k in keys], type=pa.string()),
            "pred": pa.array([k[3] for k in keys], type=pa.string()),
            "obj": pa.array([k[4] for k in keys], type=pa.string()),
            "n_ref": pa.array(
                [counts[k] for k in keys], type=pa.int64()
            ),
        }
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    tmp = out_dir / "triples.parquet.tmp"
    pq_.write_table(tbl, tmp)
    tmp.rename(out)
    return str(out)


def _kg_eval(sf_dir: str):
    """Triple P/R of the Ray pipeline vs the single-process oracle —
    computed DISTRIBUTED (multiset P/R, same arithmetic as
    ``pipelines/oracle.py::triple_prf``): the predicted triple stream
    collapses map-side to per-digest counts and one int64-keyed grouped
    Sum; the reference side (inherently driver-sized: it IS the
    single-process replay) joins in as a small dataset; tp is a
    ``min(n_pred, n_ref)`` column summed by the engine.  The driver only
    ever sees three scalar aggregates — no ``take_all`` of the triples.
    """
    from collections import Counter

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from promptner_ray.kernels.cleaning import surface_hash64
    from promptner_ray.pipelines.oracle import oracle_run
    from promptner_ray.shuffle import hash_grouped, local_hash_join

    # the SQL twin replays P/R/F1 over this export + the SQL-rederived
    # predicted triples; exporting here (cached) guarantees it exists
    # whichever side the comparison harness runs first
    ensure_ref_triples_export(sf_dir)

    sep = "\x1f"

    def key_of(url, sent_id, subj, pred, obj) -> int:
        return surface_hash64(
            sep.join((url, str(sent_id), subj, pred, obj))
        )

    name = pathlib.Path(sf_dir).name
    n_docs = _CORPUS_DOCS.get(name, _DEFAULT_DOCS)
    ref = oracle_run(n_docs, seed=42, sf_dir=sf_dir)
    ref_counts = Counter(key_of(*t) for t in ref["triples"])
    total_r = sum(ref_counts.values())
    ref_ds = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(list(ref_counts), type=pa.int64()),
                "n_ref": pa.array(
                    list(ref_counts.values()), type=pa.int64()
                ),
            }
        )
    )

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter(
            key_of(u, s, sj, p, o)
            for u, s, sj, p, o in zip(
                batch.column("url").to_pylist(),
                batch.column("sent_id").to_pylist(),
                batch.column("subj").to_pylist(),
                batch.column("pred").to_pylist(),
                batch.column("obj").to_pylist(),
            )
        )
        return pa.table(
            {
                "key": pa.array(list(c), type=pa.int64()),
                "n_pred": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    pred_counts = hash_grouped(
        _kg_triples(sf_dir).map_batches(partial, batch_format="pyarrow"),
        ["key"],
        [("n_pred", "sum")],
        rename={"n_pred_sum": "n_pred"},
    )
    total_p = int(pred_counts.sum("n_pred") or 0)
    joined = local_hash_join(
        pred_counts,
        ref_ds,
        on=["key"],
        left_schema=pa.schema(
            [("key", pa.int64()), ("n_pred", pa.int64())]
        ),
        right_schema=pa.schema(
            [("key", pa.int64()), ("n_ref", pa.int64())]
        ),
        how="inner",
    )

    def tp_col(batch: pa.Table) -> pa.Table:
        tp = np.minimum(
            batch.column("n_pred").to_numpy(zero_copy_only=False),
            batch.column("n_ref").to_numpy(zero_copy_only=False),
        )
        return pa.table({"tp": pa.array(tp, type=pa.int64())})

    tp = int(
        joined.map_batches(tp_col, batch_format="pyarrow").sum("tp") or 0
    )
    prec = tp / total_p if total_p else 0.0
    rec = tp / total_r if total_r else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return pd.DataFrame(
        [
            {
                "precision": prec,
                "recall": rec,
                "f1": f1,
                "n_triples": total_p,
            }
        ]
    )


def _kg_typed_mentions(sf_dir: str):
    """Mentions after the optional second-pass type verification stage."""
    from promptner_ray.pipelines import kg
    from promptner_ray.stages.typecheck import verify_types

    return kg.mentions(verify_types(_kg_detected(sf_dir)), _kg_cfg())


def _kg_eval_f1(sf_dir: str):
    """Distributed span-F1 of detection vs the corpus gold annotations."""
    import pandas as pd
    import ray

    gold = ray.data.read_parquet(str(_corpus_root(sf_dir) / "gold"))
    from promptner_ray.pipelines.eval import evaluate_f1

    summary = evaluate_f1(_kg_detected(sf_dir), gold, num_partitions=8)
    return pd.DataFrame([summary])


def _kg_f1_counts(sf_dir: str):
    """Per-type exact-span (tp, n_pred, n_truth) — the distributed F1 core
    as an integer table (hash-comparable, unlike the derived ratios)."""
    import ray

    from promptner_ray.pipelines.eval import f1_counts

    gold = ray.data.read_parquet(str(_corpus_root(sf_dir) / "gold"))
    return f1_counts(_kg_detected(sf_dir), gold, num_partitions=4)


def _kg_confusion(sf_dir: str):
    """Token-level confusion matrix of detected vs gold tags (G7)."""
    import ray

    from promptner_ray.pipelines.eval import confusion_counts

    gold = ray.data.read_parquet(str(_corpus_root(sf_dir) / "gold"))
    return confusion_counts(_kg_detected(sf_dir), gold, num_partitions=4)


def _dedup_components(sf_dir: str):
    """Near-dup clusters: MinHash pairs → distributed label propagation."""
    import ray

    from promptner_ray.functions import dedup
    from promptner_ray.functions.graphops import connected_components

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return connected_components(dedup.minhash_lsh_pairs(docs))


def _dedup_components_bsp(sf_dir: str):
    """Same near-dup clusters on the BSP actor-pool plan (static edge
    shards, frontier-delta min-label messages — functions/graphbsp.py):
    the scale path for the pairs→components step, where the dataflow
    loop pays two edge-sized exchanges per round.  Bit-identical, so the
    oracle SQL is literally `dedup_components`'s recursive CTE again."""
    import ray

    from promptner_ray.functions import dedup
    from promptner_ray.functions.graphbsp import components_bsp

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return components_bsp(dedup.minhash_lsh_pairs(docs))


def _doc_clean(sf_dir: str):
    """C4-style cleaning: quality + language + exact-dedup keep-first."""
    from promptner_ray.pipelines.corpus_clean import clean_corpus

    return clean_corpus(_read(sf_dir, "documents"))


def _doc_curate(sf_dir: str):
    """Full curation: C4 gates + Gopher repetition + MinHash near-dedup."""
    from promptner_ray.pipelines.corpus_clean import curate_corpus

    return curate_corpus(_read(sf_dir, "documents"))


def _doc_decontam(sf_dir: str):
    """Benchmark decontamination: training docs sharing a word 3-gram
    with the deterministic benchmark slice (doc_id % 10 == 7)."""
    from promptner_ray.functions.decontam import contaminated_docs

    return contaminated_docs(_read(sf_dir, "documents"))


def _doc_decontam_keep(sf_dir: str):
    """Surviving training doc ids after the decontamination anti-join."""
    from promptner_ray.functions.decontam import decontaminate

    return decontaminate(_read(sf_dir, "documents"))


def _doc_pack(sf_dir: str):
    """Packed-training-stream layout: global token offsets via the
    two-pass distributed exclusive scan."""
    from promptner_ray.functions.packing import pack_layout

    return pack_layout(_read(sf_dir, "documents"))


def _doc_shuffle(sf_dir: str):
    """Deterministic global shuffle order via bucket-offset ranking."""
    from promptner_ray.functions.ordering import shuffle_positions

    return shuffle_positions(
        _read(sf_dir, "documents").select_columns(["doc_id"])
    )


def _embed_cluster(sf_dir: str):
    """k-means cluster assignment; centroids trained on a bounded
    deterministic sample and exported so the SQL oracle can recompute
    the argmax-cosine assignment independently."""
    import ray

    from promptner_ray.functions import similarity

    similarity.ensure_centroid_export(sf_dir)
    cent_ref = ray.put(similarity.train_centroids(sf_dir))
    return similarity.cluster_assign(_read(sf_dir, "embeddings"), cent_ref)


def _embed_semdedup(sf_dir: str):
    """SemDeDup: cluster with the exported centroids, keep only vectors
    with no smaller-id cosine-≥-τ neighbor in the same cell — the
    id-greedy deterministic keep rule, replayed by the oracle as a
    NOT EXISTS over the identical cell assignment."""
    import ray

    from promptner_ray.functions import similarity

    similarity.ensure_centroid_export(sf_dir)
    cent_ref = ray.put(similarity.train_centroids(sf_dir))
    return similarity.semantic_dedup(_read(sf_dir, "embeddings"), cent_ref)


def _knn_ivf(sf_dir: str):
    """IVF ANN: sample-trained centroids, ingest-time cell assignment,
    candidate-pruned top-k probe.  The centroids are exported so the SQL
    oracle can replay assignment, probe set, and candidate top-k."""
    import ray

    from promptner_ray.functions import similarity

    similarity.ensure_centroid_export(sf_dir)
    cent_ref = ray.put(similarity.train_centroids(sf_dir))
    qref = ray.put(similarity.load_query_matrix(sf_dir, KNN_QUERIES))
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.knn_ivf(
        similarity.ivf_assign(emb, cent_ref), qref, cent_ref, k=KNN_K
    )


def _knn_ivfadc(sf_dir: str):
    """IVF-ADC over PQ codes (Jégou et al. 2011): the compressed-index
    query path — candidates from the probed IVF cells are ranked by m
    LUT lookups, never touching embedding bytes.  The per-query LUT is
    computed once, exported for the SQL twin, and broadcast to the
    actors, so the distance doubles are canonical on both sides."""
    import ray

    from promptner_ray.functions import similarity

    similarity.ensure_centroid_export(sf_dir)
    similarity.ensure_pq_export(sf_dir)
    _, lut = similarity.ensure_adc_export(sf_dir, KNN_QUERIES)
    cent_ref = ray.put(similarity.train_centroids(sf_dir))
    cb_ref = ray.put(similarity.train_pq(sf_dir))
    lut_ref = ray.put(lut)
    qref = ray.put(similarity.load_query_matrix(sf_dir, KNN_QUERIES))
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    enc = similarity.ivfadc_encode(emb, cent_ref, cb_ref)
    return similarity.knn_ivfadc(
        enc, qref, cent_ref, lut_ref, k=KNN_K
    )


def _ivfadc_sql(centroids_path: str) -> str:
    """SQL twin of ``_knn_ivfadc``: cell assignment + probe set replay
    (the proven `embed_knn_ivf` CTEs), PQ code replay (the proven
    `embed_pq` argmin), then the ADC distance as the identical
    left-to-right ``l0.dist + l1.dist + …`` chain over the EXPORTED
    LUT doubles — bit-exact including the float column."""
    from promptner_ray.functions.similarity import IVF_NPROBE, PQ_M

    dim = 64
    sub = dim // PQ_M
    cb = f"/tmp/promptner_pq/{_ORACLE_SF_NAME}/codebooks.parquet"
    from promptner_ray.functions.similarity import adc_export_name

    lutp = (
        f"/tmp/promptner_adc/{_ORACLE_SF_NAME}/"
        f"{adc_export_name(KNN_QUERIES)}"
    )
    codes = ",\n          ".join(
        f"""(SELECT c.code FROM read_parquet('{cb}') c
             WHERE c.sub = {s}
             ORDER BY list_distance(
               e.embedding[{s * sub + 1}:{(s + 1) * sub}]::DOUBLE[],
               c.centroid) ASC, c.code ASC
             LIMIT 1) AS code{s}"""
        for s in range(PQ_M)
    )
    dist_terms = " + ".join(f"l{s}.dist" for s in range(PQ_M))
    lut_joins = "\n          ".join(
        f"JOIN lut l{s} ON l{s}.qid = p.qid AND l{s}.sub = {s} "
        f"AND l{s}.code = c.code{s}"
        for s in range(PQ_M)
    )
    return f"""
        WITH cent AS (SELECT cell, centroid
                      FROM read_parquet('{centroids_path}')),
        assign AS (
          SELECT e.vec_id, (
            SELECT c.cell FROM cent c
            ORDER BY list_cosine_similarity(
              e.embedding::DOUBLE[], c.centroid) DESC, c.cell ASC
            LIMIT 1) AS cell
          FROM embeddings e),
        codes AS (
          SELECT e.vec_id,
          {codes}
          FROM embeddings e),
        probes AS (
          SELECT qid, cell FROM (
            SELECT e.vec_id AS qid, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(
                       e.embedding::DOUBLE[], c.centroid) DESC,
                       c.cell ASC) AS rn
            FROM embeddings e, cent c
            WHERE e.vec_id < {KNN_QUERIES})
          WHERE rn <= {IVF_NPROBE}),
        lut AS (SELECT qid, sub, code, dist
                FROM read_parquet('{lutp}')),
        cand AS (
          SELECT p.qid, a.vec_id AS nid,
                 {dist_terms} AS dist
          FROM probes p
          JOIN assign a ON a.cell = p.cell
          JOIN codes c ON c.vec_id = a.vec_id
          {lut_joins}
          WHERE a.vec_id != p.qid),
        ranked AS (
          SELECT qid, nid, dist,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY dist ASC, nid ASC) AS rank
          FROM cand)
        SELECT qid, nid, dist, rank FROM ranked WHERE rank <= {KNN_K}
    """


def _knn_lsh(sf_dir: str):
    """LSH ANN: the hyperplanes are exported so the SQL oracle can
    recompute the sign-pattern buckets and the Hamming-≤2 probe set."""
    import ray

    from promptner_ray.functions import similarity

    similarity.ensure_plane_export(sf_dir)
    qref = ray.put(similarity.load_query_matrix(sf_dir, KNN_QUERIES))
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.knn_lsh(emb, qref, k=KNN_K)


def _cosine_pairs_ivf(sf_dir: str):
    """Near-dup pairs via IVF-cell self-join — no corpus broadcast.
    The query surface carries the pair ids only: the engine's cosine is
    a float whose last-ULP depends on summation order, so the
    value-hash-robust columns are the ids; the threshold itself is
    verified by the SQL twin recomputing the cosine over the same
    exported-centroid candidate set."""
    import ray

    from promptner_ray.functions import similarity

    similarity.ensure_centroid_export(sf_dir)
    cent_ref = ray.put(similarity.train_centroids(sf_dir))
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.cosine_pairs_ivf(
        emb, cent_ref, threshold=COSINE_THRESHOLD
    ).select_columns(["vec_a", "vec_b"])


def _embed_pq(sf_dir: str):
    """Product-quantization encode: m 4-bit sub-codes per vector; the
    codebooks are exported so the SQL twin recomputes the argmin-L2
    assignment over the identical table."""
    import ray

    from promptner_ray.functions import similarity

    similarity.ensure_pq_export(sf_dir)
    cb_ref = ray.put(similarity.train_pq(sf_dir))
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.pq_assign(emb, cb_ref)


def _events_asof(sf_dir: str):
    import ray

    from promptner_ray.functions import asof

    idx_ref = ray.put(asof.load_orders_index(sf_dir))
    return asof.events_asof_orders(_read(sf_dir, "events"), idx_ref)


def _events_asof_part(sf_dir: str):
    from promptner_ray.functions import asof

    return asof.events_asof_orders_partitioned(
        _read(sf_dir, "events"), _read(sf_dir, "orders")
    )


def _events_range(sf_dir: str):
    import ray

    from promptner_ray.functions import asof, rangejoin

    idx_ref = ray.put(asof.load_orders_index(sf_dir))
    return rangejoin.events_range_orders(_read(sf_dir, "events"), idx_ref)


def _events_range_part(sf_dir: str):
    from promptner_ray.functions import rangejoin

    return rangejoin.events_range_orders_partitioned(
        _read(sf_dir, "events"), _read(sf_dir, "orders")
    )


def entry() -> Any:
    """Flagship pipeline at sf0.001: pages → …→ named edge table."""
    return _kg_edges("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from promptner_ray.functions import (
        bloom,
        decontam,
        dedup,
        hll,
        multimodal,
        ngrams,
        packing,
        pii,
        relational,
        sampling,
        similarity,
        textstats,
        urls,
        vectorize,
    )

    def _docs(sf_dir: str):
        return _read(sf_dir, "documents")

    def _doc_wave(sf_dir: str, parity: int):
        """Deterministic doc_id-parity wave split (vectorized batch
        filter) — the documents-table twin of the pages `_wave_filter`."""
        import pyarrow.compute as pc

        return _docs(sf_dir).map_batches(
            lambda t, p=parity: t.filter(
                pc.equal(
                    pc.bit_wise_and(t.column("doc_id").combine_chunks(), 1),
                    p,
                )
            ),
            batch_format="pyarrow",
        )

    def _emb(sf_dir: str):
        return _read(sf_dir, "embeddings")

    def _qref(sf_dir: str):
        import ray

        return ray.put(similarity.load_query_matrix(sf_dir, KNN_QUERIES))

    def _nation_ref(sf_dir: str):
        import ray
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{sf_dir}/nation.parquet")
        return ray.put(
            dict(
                zip(
                    tbl.column("n_nationkey").to_pylist(),
                    tbl.column("n_name").to_pylist(),
                )
            )
        )

    q = {
        # --- text analysis (documents) -------------------------------
        "doc_token_stats": lambda sf: _docs(sf).map_batches(
            textstats.token_stats_batch, batch_format="pyarrow"
        ),
        "doc_fingerprint": lambda sf: _docs(sf).map_batches(
            textstats.fingerprint_batch, batch_format="pyarrow"
        ),
        "doc_quality": lambda sf: _docs(sf).map_batches(
            textstats.quality_batch, batch_format="pyarrow"
        ),
        "doc_tokens": lambda sf: _docs(sf).map_batches(
            textstats.explode_tokens_batch, batch_format="pyarrow"
        ),
        "doc_hashed_tf": lambda sf: vectorize.hashed_tf(_docs(sf)),
        "doc_classifier_score": lambda sf: vectorize.linear_score(_docs(sf)),
        # distributed quality-classifier TRAINING: full-batch logistic
        # regression over hashed-TF, quantized-gradient checked sums,
        # per-round loss — bit-exact weight trajectory vs the unrolled
        # SQL replay (round 5)
        "doc_classifier_train": lambda sf: vectorize.train_linear_classifier(
            _docs(sf)
        ),
        # the full learned-filter loop: train, then one exchange-free
        # scoring pass with the final weights
        "doc_classifier_apply": lambda sf: vectorize.score_with_trained(
            _docs(sf)
        ),
        "doc_repetition": lambda sf: _docs(sf).map_batches(
            textstats.repetition_stats_batch, batch_format="pyarrow"
        ),
        # synthetic-PII injection (pure fn of doc_id, mirrored in SQL)
        # makes the redaction non-trivial on the PII-free sandbox corpus
        "doc_pii_redact": lambda sf: pii.redact_pii(
            _docs(sf).map_batches(
                pii.inject_synthetic_pii_batch, batch_format="pyarrow"
            ),
            column="text_pii",
        ).select_columns(
            [
                "doc_id",
                "text_pii_redacted",
                "n_email",
                "n_ssn",
                "n_phone",
                "n_ipv4",
            ]
        ),
        "doc_bpe_tokens": lambda sf: _docs(sf).map_batches(
            textstats.bpe_token_stats_batch, batch_format="pyarrow"
        ),
        "doc_langid": lambda sf: _docs(sf).map_batches(
            textstats.langid_batch, batch_format="pyarrow"
        ),
        "doc_winnow": lambda sf: _docs(sf).map_batches(
            textstats.winnow_batch, batch_format="pyarrow"
        ),
        "lang_counts": lambda sf: relational.lang_counts(_docs(sf)),
        "doc_blocklist": lambda sf: _docs(sf).map_batches(
            textstats.blocklist_batch, batch_format="pyarrow"
        ),
        # Gopher quality rules (Rae et al. 2021): per-rule booleans +
        # composite keep, all from integer counts and single divisions
        "doc_gopher": lambda sf: _docs(sf).map_batches(
            textstats.gopher_batch, batch_format="pyarrow"
        ),
        # C4 line-level rules (Raffel et al. 2020) over a disclosed
        # deterministic line/punctuation injection (the sandbox corpus is
        # single-line and punctuation-free); the oracle replays both
        "doc_c4": lambda sf: _docs(sf)
        .map_batches(textstats.inject_c4_lines_batch, batch_format="pyarrow")
        .map_batches(textstats.c4_batch, batch_format="pyarrow"),
        "doc_domains": lambda sf: urls.doc_domains(_docs(sf)),
        "domain_counts": lambda sf: urls.domain_counts(_docs(sf)),
        "doc_domain_cap": lambda sf: urls.domain_cap(_docs(sf)),
        "doc_tfidf": lambda sf: vectorize.tfidf(_docs(sf)),
        "doc_lm_score": lambda sf: vectorize.lm_score(_docs(sf)),
        # CCNet head/middle/tail: per-language exact tercile thresholds
        # found by constant-exchange radix selection (no per-language
        # value centralization — safe under 90%-one-language skew)
        "doc_ccnet_buckets": lambda sf: vectorize.ccnet_buckets(_docs(sf)),
        # DSIR importance weights (hashed-unigram target/raw log ratio)
        # and the deterministic top-k selection over them
        "doc_dsir": lambda sf: vectorize.dsir_scores(_docs(sf)),
        "doc_dsir_select": lambda sf: vectorize.dsir_select(_docs(sf)),
        # paper-faithful DSIR: Gumbel-top-k resampling with md5-derived
        # deterministic noise (bit-exact cross-engine)
        "doc_dsir_sample": lambda sf: vectorize.dsir_sample(_docs(sf)),
        "doc_distinct_sketch": lambda sf: hll.hll_registers(_docs(sf)),
        "dedup_winnow_pairs": lambda sf: dedup.winnow_pairs(_docs(sf)),
        # exact duplicated-substring spans (Lee et al. 2022 style, token
        # granularity): maximal token ranges covered by corpus-repeated
        # 12-grams
        "doc_dup_spans": lambda sf: dedup.dup_spans(_docs(sf)),
        # the destructive half: texts with every duplicated span cut
        "doc_strip_dup_spans": lambda sf: dedup.strip_dup_spans(_docs(sf)),
        # per-source boilerplate (RefinedWeb/C4 template stripping); the
        # synthetic corpus carries no templates, so the query plants a
        # deterministic per-source nav banner on 3/4 of each source's
        # docs (disclosed injection, same idiom as the PII/alias
        # queries) and the oracle replays it
        "doc_boilerplate_spans": lambda sf: dedup.boilerplate_spans(
            _docs(sf).map_batches(
                dedup.inject_nav_banner_batch, batch_format="pyarrow"
            )
        ),
        "doc_strip_boilerplate": lambda sf: dedup.strip_boilerplate(
            _docs(sf).map_batches(
                dedup.inject_nav_banner_batch, batch_format="pyarrow"
            )
        ),
        "doc_clean": _doc_clean,
        "doc_curate": _doc_curate,
        "doc_decontam": _doc_decontam,
        "doc_decontam_keep": _doc_decontam_keep,
        # constant-size Bloom-bitset variant of the decontamination
        # probe (FPs deterministic, reproduced exactly by the oracle)
        "doc_bloom_decontam": lambda sf: bloom.bloom_decontam(_docs(sf)),
        "doc_ngram_counts": lambda sf: ngrams.ngram_counts(_docs(sf)),
        "doc_top_ngrams": lambda sf: ngrams.top_ngrams(_docs(sf)),
        # exact token counts via the DYNAMIC salted-shuffle plan
        # (sample → count-min hot detection → two-stage salted merge);
        # result is plan-independent, so a plain GROUP BY oracles it
        "doc_word_counts": lambda sf: ngrams.token_counts_salted(_docs(sf)),
        # one BPE merge iteration's pair statistics (Sennrich et al.
        # 2016): corpus-weighted adjacent-symbol pairs over chars+</w>
        "doc_bpe_pairs": lambda sf: ngrams.bpe_pair_counts(_docs(sf)),
        # word co-occurrence PMI within a ±2 token window — the
        # word2vec/GloVe association statistic (SGNS ≈ shifted PMI)
        "doc_cooc_pmi": lambda sf: ngrams.cooc_pmi(_docs(sf)),
        # full distributed BPE TRAINING loop — the merge-rule table is
        # hash-checked against an unrolled recursive-CTE SQL replay of
        # all 8 training rounds (sql_bpe_merges); the single-process
        # reference equality ALSO lives in tests, and round 1's pair
        # table is separately oracled via doc_bpe_pairs
        "doc_bpe_merges": lambda sf: ngrams.bpe_merges(_docs(sf)),
        # tokenizer-aware per-doc token census: train the 8 rules, then
        # one exchange-free streaming encode pass (round 5)
        "doc_bpe_encode": lambda sf: ngrams.bpe_train_encode(_docs(sf)),
        # RAG retrieval-corpus chunking: overlapping 64-token windows
        "doc_chunks": lambda sf: _docs(sf).map_batches(
            packing.chunk_batch, batch_format="pyarrow"
        ),
        "doc_pack": _doc_pack,
        "doc_shuffle": _doc_shuffle,
        "doc_stratified_sample": lambda sf: sampling.stratified_sample(
            _docs(sf).select_columns(["doc_id", "lang"]),
            group="lang",
            key="doc_id",
            k=20,
        ),
        # Dolma/Pile-style training-mix reweighting (weights >1 repeat,
        # <1 hash-downsample; expected multiplicity == weight exactly)
        "doc_mixture": lambda sf: sampling.mixture_resample(
            _docs(sf).select_columns(["doc_id", "source"])
        ),
        "doc_sample": lambda sf: sampling.hash_sample(
            _docs(sf).select_columns(["doc_id", "lang"]),
            key="doc_id",
            fraction=0.25,
            seed=7,
        ),
        # deterministic content-addressed train/val/test assignment
        "doc_split": lambda sf: sampling.train_val_test(
            _docs(sf).select_columns(["doc_id", "source"])
        ),
        # --- dedup (documents) ---------------------------------------
        "dedup_exact": lambda sf: dedup.exact_dedup(_docs(sf)),
        "dedup_jaccard_pairs": lambda sf: dedup.jaccard_pairs(
            _docs(sf), threshold=JACCARD_THRESHOLD
        ),
        "dedup_minhash_lsh": lambda sf: dedup.minhash_lsh_pairs(_docs(sf)),
        "dedup_simhash": lambda sf: _docs(sf).map_batches(
            dedup.simhash_batch, batch_format="pyarrow"
        ),
        "dedup_simhash_pairs": lambda sf: dedup.simhash_pairs(_docs(sf)),
        "dedup_components": _dedup_components,
        # same clusters on the BSP actor-pool plan; same oracle
        "dedup_components_bsp": _dedup_components_bsp,
        "dedup_minhash_keep": lambda sf: dedup.minhash_dedup(_docs(sf)),
        # incremental cross-wave near-dedup: odd-doc_id "new crawl"
        # filtered against the even-doc_id "prior crawl"'s band buckets
        "dedup_minhash_incremental": lambda sf: dedup.minhash_incremental(
            _doc_wave(sf, 0), _doc_wave(sf, 1)
        ),
        # fraction of each new-wave doc's 3-grams unseen in the prior
        # wave — distributed semi-join, never a broadcast (the "prior"
        # side is half the corpus)
        "doc_novelty": lambda sf: decontam.novelty_scores(
            _doc_wave(sf, 0), _doc_wave(sf, 1)
        ),
        # per-(source, lang) curation dashboard rollup
        "doc_quality_by_source": lambda sf: textstats.quality_by_source(
            _docs(sf)
        ),
        # --- similarity search (embeddings) --------------------------
        "embed_knn": lambda sf: similarity.knn_topk(
            _emb(sf), _qref(sf), k=KNN_K
        ),
        "embed_cosine_pairs": lambda sf: similarity.cosine_pairs(
            _emb(sf), threshold=COSINE_THRESHOLD
        ),
        "embed_knn_lsh": _knn_lsh,
        "embed_knn_ivf": _knn_ivf,
        "embed_cluster": _embed_cluster,
        "embed_semdedup": _embed_semdedup,
        "embed_quantize": lambda sf: similarity.quantize_embeddings(
            _emb(sf)
        ),
        # product quantization: m sub-codebooks, argmin-L2 codes
        "embed_pq": _embed_pq,
        # compressed-index query path: IVF probe + PQ asymmetric distance
        "embed_knn_ivfadc": _knn_ivfadc,
        "embed_cosine_pairs_ivf": _cosine_pairs_ivf,
        # --- multimodal plumbing (documents-as-binary) ---------------
        "multimodal_features": lambda sf: multimodal.media_features(
            _docs(sf)
        ).select_columns(["doc_id", "n_bytes", "fp"]),
        "multimodal_decode": lambda sf: multimodal.media_features(_docs(sf)),
        # exact asset dedup over the payload fingerprint, through the
        # actor-pool decode stage
        "multimodal_dedup": lambda sf: multimodal.media_dedup(_docs(sf)),
        # --- relational demos (TPC-H-ish tables) ---------------------
        "lineitem_stats": lambda sf: relational.lineitem_stats(
            _read(sf, "lineitem")
        ),
        "customer_nation_counts": lambda sf: relational.customer_nation_counts(
            _read(sf, "customer"), _nation_ref(sf)
        ),
        # Q5-shaped narrowing join chain with fixed-point-exact revenue
        "revenue_by_nation": lambda sf: relational.revenue_by_nation(
            _read(sf, "lineitem"),
            _read(sf, "orders"),
            _read(sf, "customer"),
            _nation_ref(sf),
        ),
        "events_tumbling": lambda sf: relational.events_tumbling(
            _read(sf, "events")
        ),
        "events_hopping": lambda sf: relational.events_hopping(
            _read(sf, "events")
        ),
        "events_asof_orders": lambda sf: _events_asof(sf),
        "events_asof_orders_part": _events_asof_part,
        "events_range_orders": _events_range,
        "events_range_orders_part": _events_range_part,
        "events_topk": lambda sf: relational.grouped_topk(
            _read(sf, "events"), k=3
        ),
        "events_quantiles": lambda sf: relational.grouped_quantiles(
            _read(sf, "events")
        ),
        "events_sessions": lambda sf: relational.events_sessions(
            _read(sf, "events")
        ),
        # signup→purchase funnel conversion (first-anchor semantics,
        # int64 epoch-µs arithmetic end to end)
        "events_funnel": lambda sf: relational.events_funnel(
            _read(sf, "events")
        ),
        # cohort retention triangle (first-seen-day cohorts, day offsets)
        "events_retention": lambda sf: relational.events_retention(
            _read(sf, "events")
        ),
        # per-type standard-score outlier flags (exact cents moments →
        # broadcast stats → stateless scoring map)
        "events_zscores": lambda sf: relational.events_zscores(
            _read(sf, "events")
        ),
        # mergeable bottom-k quantile sketch — constant memory per key;
        # md5 ranks make the SKETCH itself oracle-checkable
        "events_quantile_sketch": _events_quantile_sketch,
        # per-key HLL: distinct users per event type, ≤2^p int rows per
        # (key, block) cross the exchange
        "events_user_sketch": _events_user_sketch,
        # --- KG pipeline (synthetic pages corpus) --------------------
        # Value-checked against DuckDB SQL over the exported stage tables
        # (promptner_ray/pipelines/export.py); the export also runs from
        # oracle_sql() so the SQL side is self-sufficient.
        "kg_docs_text": _kg_docs_text,
        "kg_sentences": _kg_sentences,
        # C4-style corpus pass: drop repeated sentences, keep the global
        # first occurrence in (url, sent_id) order
        "kg_sentence_dedup": lambda sf: dedup.first_occurrence(
            _kg_sentences(sf), "text", ["url", "sent_id"]
        ),
        "kg_mentions": _kg_mentions,
        "kg_triples": _kg_triples,
        "kg_links": _kg_links,
        "kg_nodes": _kg_nodes,
        "kg_edges": _kg_edges,
        "kg_top_edges": lambda sf: _kg_edges(sf).sort(
            ["weight", "subj_id", "pred", "obj_id"],
            descending=[True, False, False, False],
        ).limit(50),
        "kg_confusion": _kg_confusion,
        "kg_f1_counts": _kg_f1_counts,
        # per-node degree/weight totals — hub (hot-entity) profiling
        "kg_degrees": _kg_degrees,
        # temporal edges: first/last crawl timestamp asserting each edge
        "kg_edge_times": _kg_edge_times,
        # per-entity first/last-seen + page breadth
        "kg_entity_times": _kg_entity_times,
        # DIRT-style predicate co-occurrence (relation synonyms)
        "kg_pred_cooc": _kg_pred_cooc,
        "kg_edges_asof": _kg_edges_asof,
        # PMI edge re-weighting vs the weighted-degree null model
        "kg_pmi": _kg_pmi,
        # per-node triangle counts (degree-ordered orientation)
        "kg_triangles": _kg_triangles,
        # ontology induction: per-(subj_type, pred, obj_type) signature
        # support + distinct-pair diversity
        "kg_schema": _kg_schema,
        # consistency gate: triples conforming to a dominant signature
        "kg_schema_filter": _kg_schema_filter,
        # SPARQL-ish 2-hop pattern scan through capped pivots
        "kg_paths": _kg_paths,
        # KG-embedding training prep: deterministic corrupted-tail
        # negatives, true edges anti-joined out
        "kg_negative_samples": _kg_negative_samples,
        "kg_node_jaccard": _kg_node_jaccard,
        # oracle: same pair CTE with the inverse-log fixed-point weight
        "kg_adamic_adar": _kg_adamic_adar,
        "kg_entity_merge": _kg_entity_merge,
        "kg_clustering": _kg_clustering,
        # oracle: recursive-CTE peel replay (plus the single-process
        # peel reference in tests)
        "kg_kcore": _kg_kcore,
        # edge-level cohesion one notch past k-core: support peel
        "kg_ktruss": _kg_ktruss,
        # directed cycle structure: strongly connected components
        "kg_scc": _kg_scc,
        # same core on the BSP actor-pool plan; same oracle
        "kg_kcore_bsp": _kg_kcore_bsp,
        # oracle: recursive-CTE BFS (min hop per node, capped depth)
        "kg_reachability": _kg_reachability,
        "kg_reachability_bsp": _kg_reachability_bsp,
        # oracle: hash-driven walk replay (deterministic neighbor pick)
        "kg_random_walks": _kg_random_walks,
        # same corpus on the BSP actor-pool plan; same oracle
        "kg_random_walks_bsp": _kg_random_walks_bsp,
        # oracle: walk-replay self-join within the skip-gram window
        "kg_walk_pairs": _kg_walk_pairs,
        # oracle: brute-force levenshtein cross join (independent of the
        # engine's deletion-neighborhood blocking)
        "kg_alias_pairs": _kg_alias_pairs,
        # oracle: the pair SQL closed by a recursive reachability CTE
        "kg_alias_clusters": _kg_alias_clusters,
        # oracle: deterministic synchronous voting replayed as a
        # recursive CTE (see _labelprop_sql)
        "kg_communities": _kg_communities,
        # same communities on the BSP actor-pool plan; same oracle
        "kg_communities_bsp": _kg_communities_bsp,
        # Newman modularity of the LPA partition (quality gate)
        "kg_modularity": _kg_modularity,
        # greedy coloring by deterministic Luby-MIS rounds
        "kg_coloring": _kg_coloring,
        # k-source Brandes betweenness, fixed-point dependency sums
        "kg_betweenness": _kg_betweenness,
        # the same recursion on the dual-direction BSP shards (round 5)
        "kg_betweenness_bsp": _kg_betweenness_bsp,
        # incremental-crawl wave merge must equal the batch edge table
        "kg_edges_incremental": _kg_edges_incremental,
        # oracle: full-outer join of the two wave-replay edge CTEs
        "kg_edge_diff": _kg_edge_diff,
        # web-graph edge extraction from raw HTML anchors
        "cc_outlinks": _cc_outlinks,
        # keep-newest-crawl per URL over (injected) multi-snapshot pages
        "cc_latest_snapshot": _cc_latest_snapshot,
        # per-target anchor-text profile (alias/label signal for linking)
        "cc_anchor_texts": _cc_anchor_texts,
        # alias→target majority dictionary (the inverse grouping)
        "cc_anchor_link": _cc_anchor_link,
        # entity grounding: links × anchor dictionary (round 5)
        "kg_grounding": _kg_grounding,
        # crawl-frontier URL canonicalization + canonical-form dedup
        "cc_canonical_urls": _cc_canonical_urls,
        "cc_url_dedup": _cc_url_dedup,
        # site-section contraction of the page graph (host-level rollup)
        "cc_section_graph": _cc_section_graph,
        # HITS hubs/authorities (same fixed-point replay discipline)
        "kg_hits": _kg_hits,
        # scalar web-graph structure statistics: link symmetry, hub-to-hub
        # degree correlation, and the Broder bow-tie regions
        "kg_reciprocity": _kg_reciprocity,
        "kg_assortativity": _kg_assortativity,
        "kg_bowtie": _kg_bowtie,
        "kg_bowtie_bsp": _kg_bowtie_bsp,
        # HyperBall h-hop ball sizes (HLL register max-merge per round)
        "kg_hyperball": _kg_hyperball,
        # neighborhood function + interpolated 90%-effective diameter
        "kg_effective_diameter": _kg_effective_diameter,
        "kg_hyperball_bsp": _kg_hyperball_bsp,
        # harmonic centrality from the "in"-direction HyperBall rounds
        "kg_harmonic": _kg_harmonic,
        "kg_harmonic_bsp": _kg_harmonic_bsp,
        # same scores on the BSP actor-pool plan (both edge directions
        # resident per shard — graphbsp.HITSBSP); bit-identical, so the
        # oracle is the same unrolled replay
        "kg_hits_bsp": _kg_hits_bsp,
        # oracle: int64 fixed-point mass makes the distributed result
        # order-independent, so the unrolled SQL replay hash-matches
        "kg_pagerank": _kg_pagerank,
        "kg_ppr": _kg_ppr,
        "kg_ppr_bsp": _kg_ppr_bsp,
        # same ranks on the BSP actor-pool plan (graphbsp.py): the
        # iterative-analytics scale path, checked by the same oracle
        "kg_pagerank_bsp": _kg_pagerank_bsp,
        # P/R/F1 vs the single-process oracle — hash-checked against a
        # SQL replay (predicted side re-derived by the kg_triples SQL,
        # reference side from the deterministic ref-triples export)
        "kg_eval": _kg_eval,
        # the COMPOSED web-scale release pipeline: crawl dedup → extract
        # → quality gates → content dedup → detect → schema filter →
        # graph → PageRank+harmonic annotations, one streaming chain
        # (pipelines/release.py) — hash-checked END TO END against a
        # single WITH-chain SQL re-derivation of the whole composition
        # (_release_sql), floats bit-exact; e2e-pinned by
        # tests/test_release.py besides
        "kg_release": _kg_release,
        "kg_eval_f1": _kg_eval_f1,
        "kg_typed_mentions": _kg_typed_mentions,
    }
    # The driver's correctness gate compares exactly the FIRST 50 entries of
    # this dict against their DuckDB oracles at sf0.01.  Round-5 rotation
    # (VERDICT r4 item #1): the 48 queries that have NEVER had a driver
    # CORRECTNESS row — all round-4 additions that landed after the r4
    # reorder, plus the deliberately-deferred BSP/_part plan twins — now
    # occupy the window, plus the two new round-5 rows (kg_eval, newly
    # SQL-oracled, and kg_release, the composed pipeline).  Everything
    # displaced is green in CORRECTNESS_r0{1..4}.json and mirrored every
    # session by tests/test_oracle_parity.py.
    first = [
        # round-4 doc_* additions (incl. doc_bpe_merges, rows-only until
        # this round — now hash-checked against the unrolled SQL replay)
        "doc_gopher", "doc_c4", "doc_ccnet_buckets",
        "doc_boilerplate_spans", "doc_strip_boilerplate",
        "doc_bpe_pairs", "doc_bpe_merges", "doc_cooc_pmi", "doc_chunks",
        # PQ / IVF-ADC compressed-index path
        "embed_pq", "embed_knn_ivfadc",
        # events tail.  The two _part plan twins yielded their slots to
        # the round-5 classifier trainer and the BSP Brandes (same
        # weakest-evidence rule as the random_walks/communities BSP
        # twins below: a bit-identical twin of a driver-green plan
        # gives way to a genuinely new implementation).
        "doc_classifier_train", "kg_betweenness_bsp",
        "events_funnel", "events_retention", "events_zscores",
        # KG schema / ontology / temporal / sampling ops
        "kg_entity_times", "kg_pred_cooc", "kg_schema",
        "kg_schema_filter", "kg_paths", "kg_negative_samples",
        # graph structure suite (r4 additions, incl. the ADVICE-hardened
        # betweenness and the p-parameterized HyperBall family)
        "kg_ktruss", "kg_scc", "kg_modularity", "kg_coloring",
        "kg_betweenness", "kg_reciprocity", "kg_assortativity",
        "kg_bowtie", "kg_hyperball", "kg_harmonic",
        "kg_effective_diameter",
        # BSP plan twins (bit-identical to the dataflow twins, shared
        # oracles — first driver rows for the BSP execution path).
        # kg_random_walks_bsp / kg_communities_bsp yielded their slots
        # to the two brand-new round-5 operators below: a bit-identical
        # twin of a driver-green dataflow plan is the weakest marginal
        # evidence in the window, a new operator the strongest.
        "kg_bowtie_bsp", "kg_hyperball_bsp", "kg_harmonic_bsp",
        "kg_hits_bsp", "kg_ppr_bsp", "kg_pagerank_bsp", "kg_kcore_bsp",
        "kg_reachability_bsp",
        # round-5 NEW operators: tokenizer-aware token census and
        # anchor-dictionary entity grounding
        "doc_bpe_encode", "kg_grounding",
        # web-graph ops (incl. the ADVICE-anchored URL canonicalization)
        "cc_anchor_texts", "cc_anchor_link", "cc_canonical_urls",
        "cc_url_dedup", "cc_section_graph",
        # round-5 additions: kg_eval newly SQL-oracled; kg_release is the
        # composed release pipeline, hash-checked end to end against the
        # one-WITH-chain SQL re-derivation (_release_sql)
        "kg_eval", "kg_release",
    ]
    assert len(first) == 50 and all(k in q for k in first), (
        len(first), [k for k in first if k not in q])
    return {k: q[k] for k in first} | {
        k: v for k, v in q.items() if k not in set(first)
    }


# --- SQL building blocks for the KG / simhash / winnow oracles -------------

# The driver's side-by-side correctness gate runs at sf0.01; the KG oracle
# SQL reads the exported stage tables for that sf (tests/test_oracle_parity
# rewrites the sf token to run the identical comparison at sf0.001).
_ORACLE_SF_NAME = "sf0.01"
_CORPUS_GLOB = f"/tmp/promptner_corpus/{_ORACLE_SF_NAME}/pages/part=*/*.parquet"
_EXPORT = f"/tmp/promptner_kg/{_ORACLE_SF_NAME}"


def _sql_quantile_sketch() -> str:
    from promptner_ray.functions.sketch import sql_quantile_sketch

    return sql_quantile_sketch()


def _sql_grouped_hll() -> str:
    from promptner_ray.functions.hll import sql_grouped_hll_registers

    return sql_grouped_hll_registers()


def _sql_outlinks() -> str:
    from promptner_ray.functions.urls import sql_outlinks

    return sql_outlinks(_CORPUS_GLOB)


def _sql_anchor_texts() -> str:
    from promptner_ray.functions.urls import sql_anchor_texts

    return sql_anchor_texts(_CORPUS_GLOB)


def _sql_section_graph() -> str:
    from promptner_ray.functions.urls import sql_section_graph

    return sql_section_graph(_CORPUS_GLOB)


def _sql_latest_snapshot() -> str:
    from promptner_ray.functions.urls import sql_latest_snapshot

    return sql_latest_snapshot(_CORPUS_GLOB, _sql_hash64("url"))


def _sql_punct() -> str:
    import string

    return string.punctuation.replace("'", "''")


def _sql_norm(expr: str) -> str:
    """DuckDB twin of kernels.cleaning.normalize_surface: lower → strip
    whitespace → strip punctuation → strip whitespace."""
    return f"trim(trim(trim(lower({expr})), '{_sql_punct()}'))"


def _sql_hash64(expr: str) -> str:
    """DuckDB twin of kernels.cleaning.surface_hash64: first 8 md5 bytes,
    big-endian, reinterpreted as SIGNED int64 (two's-complement wrap)."""
    u = f"('0x' || substr(md5({expr}), 1, 16))::UBIGINT"
    return (
        f"CASE WHEN {u} >= 9223372036854775808::UBIGINT "
        f"THEN CAST({u}::HUGEINT - 18446744073709551616 AS BIGINT) "
        f"ELSE {u}::BIGINT END"
    )


def _sql_links_cte() -> str:
    """CTE chain re-deriving the links table from exported mentions: the
    full canonicalization stage (normalize → count → argmax with the
    (count desc, value asc) tie-break → md5 entity ids) in pure SQL."""
    norm_m = _sql_norm("mention")
    return f"""
    mn AS (SELECT {norm_m} AS surface_norm, mention, mtype
           FROM read_parquet('{_EXPORT}/mentions/part=*/*.parquet')
           WHERE {norm_m} != ''),
    tot AS (SELECT surface_norm, count(*)::BIGINT AS n_mentions
            FROM mn GROUP BY 1),
    canon AS (
      SELECT surface_norm, mention AS canonical FROM (
        SELECT surface_norm, mention,
               row_number() OVER (PARTITION BY surface_norm
                                  ORDER BY count(*) DESC, mention ASC) AS rn
        FROM mn GROUP BY surface_norm, mention) WHERE rn = 1),
    ety AS (
      SELECT surface_norm, mtype AS etype FROM (
        SELECT surface_norm, mtype,
               row_number() OVER (PARTITION BY surface_norm
                                  ORDER BY count(*) DESC, mtype ASC) AS rn
        FROM mn GROUP BY surface_norm, mtype) WHERE rn = 1),
    lnk AS (
      SELECT t.surface_norm, {_sql_hash64('t.surface_norm')} AS surface_hash,
             {_sql_hash64('t.surface_norm')} AS entity_id,
             c.canonical, e.etype, t.n_mentions
      FROM tot t JOIN canon c USING (surface_norm)
                 JOIN ety e USING (surface_norm))"""


def _sql_edges_cte() -> str:
    """CTE re-deriving named edges from exported triples + the links CTE."""
    return f"""{_sql_links_cte()},
    tr AS (SELECT subj, pred, obj
           FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
    edg AS (
      SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
             {_sql_hash64(_sql_norm('obj'))} AS obj_id,
             count(*)::BIGINT AS weight
      FROM tr GROUP BY 1, 2, 3),
    named AS (
      SELECT edg.subj_id, edg.pred, edg.obj_id, edg.weight,
             coalesce(s.canonical, '') AS subj_canonical,
             coalesce(o.canonical, '') AS obj_canonical
      FROM edg LEFT JOIN lnk s ON edg.subj_id = s.entity_id
               LEFT JOIN lnk o ON edg.obj_id = o.entity_id)"""


def _pagerank_sql(iters: int = 8, damping: float = 0.85) -> str:
    """Exact SQL twin of :func:`graphops.pagerank` — possible because the
    Ray op carries rank mass as int64 fixed-point (2⁻⁴² units): integer
    sums commute, so the distributed result is bit-reproducible and each
    iteration unrolls to one dangling-sum + contribution-join +
    rebuild-CTE triple replaying the identical integer ops
    (``(fp * w) // w_out``, ``(dnum * mass) // 1000``)."""
    from promptner_ray.functions.graphops import PR_SCALE

    dnum = round(damping * 1000)
    # every per-round CTE is referenced twice downstream; AS MATERIALIZED
    # stops DuckDB's inliner from re-expanding the whole chain per
    # reference (exponential 2^iters blowup measured without it)
    parts = [
        f"""tr AS (SELECT subj, pred, obj
           FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
    edg AS MATERIALIZED (
      SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
             {_sql_hash64(_sql_norm('obj'))} AS obj_id,
             count(*)::BIGINT AS weight
      FROM tr GROUP BY 1, 2, 3),
    ends AS (SELECT subj_id AS entity_id, weight AS w_out FROM edg
             UNION ALL SELECT obj_id, 0 FROM edg),
    nodes AS MATERIALIZED (SELECT entity_id, sum(w_out)::BIGINT AS w_out
              FROM ends GROUP BY entity_id),
    nn AS MATERIALIZED (SELECT count(*)::BIGINT AS c FROM nodes),
    r0 AS MATERIALIZED (
           SELECT entity_id, {PR_SCALE} // (SELECT c FROM nn) AS fp, w_out
           FROM nodes)"""
    ]
    for i in range(iters):
        parts.append(
            f"""d{i} AS MATERIALIZED (
           SELECT coalesce(sum(fp), 0)::BIGINT AS m
           FROM r{i} WHERE w_out = 0),
    c{i} AS MATERIALIZED (
             SELECT e.obj_id AS entity_id,
                    sum((r.fp * e.weight) // r.w_out)::BIGINT AS s
             FROM edg e JOIN r{i} r ON r.entity_id = e.subj_id
             GROUP BY 1),
    r{i + 1} AS MATERIALIZED (
           SELECT nd.entity_id,
               (({1000 - dnum} * {PR_SCALE})
                  // (1000 * (SELECT c FROM nn)))
             + ({dnum} * (coalesce(c.s, 0)
                  + (SELECT m FROM d{i}) // (SELECT c FROM nn))) // 1000
               AS fp,
               nd.w_out
           FROM nodes nd LEFT JOIN c{i} c ON c.entity_id = nd.entity_id)"""
        )
        # power-of-two divisor: BIGINT / DOUBLE division is exact
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT entity_id, fp / {float(PR_SCALE)} AS rank FROM r{iters}"""
    )


def _release_sql(pr_iters: int = 4, hb_iters: int = 4) -> str:
    """SQL twin of the COMPOSED release pipeline (`pipelines/release.py::
    release_graph`) — every stage re-derived independently in one WITH
    chain: crawl dedup (canonicalize + keep-newest-per-canonical-form),
    Gopher + C4 page gates over the extracted text (byte-identical to
    the corpus text column, the pinned invariant), exact content dedup,
    the links/canonicalization chain and the schema-filtered edge table
    RESTRICTED to surviving urls (detection is per-sentence, so the
    gated corpus's detection output equals the full-corpus export
    restricted to surviving pages), then the int64 fixed-point PageRank
    unroll (``pr_iters`` rounds) and the HyperBall harmonic twin
    (p = 4, ``hb_iters`` rounds) joined onto the node table with
    fill-0.0 — the engine's exact float expressions throughout."""
    from promptner_ray.functions.graphops import PR_SCALE
    from promptner_ray.functions.hyperball import sql_harmonic
    from promptner_ray.functions.textstats import (
        C4_MIN_KEPT_LINES,
        C4_MIN_LINE_WORDS,
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOP_KINDS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
    )
    from promptner_ray.functions.urls import _sql_canonicalize

    stops = " + ".join(
        f"list_contains(string_split(text, ' '), '{w}')::INT"
        for w in GOPHER_STOPWORDS
    )
    norm_m = _sql_norm("mention")
    dnum = round(0.85 * 1000)
    parts = [
        f"""pg AS MATERIALIZED (
      SELECT url, warc_ts, lang, text
      FROM read_parquet('{_CORPUS_GLOB}'))""",
        # crawl dedup: newest capture per canonical URL form, url ASC tie
        f"""cd AS MATERIALIZED (
      SELECT url FROM (
        SELECT url, row_number() OVER (
            PARTITION BY {_sql_canonicalize('url')}
            ORDER BY epoch_us(warc_ts) DESC, url ASC) AS rk
        FROM pg) WHERE rk = 1)""",
        # Gopher page gate (sql_gopher's proven expressions, url-keyed)
        f"""gop AS (
      SELECT url FROM (
        SELECT url,
          len(string_split(text, ' '))::BIGINT AS n_words,
          length(text)::BIGINT AS n_chars,
          ((length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3
          )::BIGINT AS n_sym,
          len(list_filter(string_split(text, ' '),
              w -> regexp_matches(w, '[A-Za-z]')))::BIGINT AS n_alpha,
          ({stops})::BIGINT AS stop_kinds
        FROM pg JOIN cd USING (url))
      WHERE n_words >= {GOPHER_MIN_WORDS}
        AND n_words <= {GOPHER_MAX_WORDS}
        AND (n_chars - (n_words - 1))::DOUBLE
              / greatest(n_words, 1)::DOUBLE >= {GOPHER_MIN_MEAN_LEN}
        AND (n_chars - (n_words - 1))::DOUBLE
              / greatest(n_words, 1)::DOUBLE <= {GOPHER_MAX_MEAN_LEN}
        AND n_sym::DOUBLE / greatest(n_words, 1)::DOUBLE
              <= {GOPHER_MAX_SYMBOL_RATIO}
        AND n_alpha::DOUBLE / greatest(n_words, 1)::DOUBLE
              >= {GOPHER_MIN_ALPHA_FRAC}
        AND stop_kinds >= {GOPHER_MIN_STOP_KINDS})""",
        # C4 page gate over the RAW page lines (no injection here — the
        # corpus pages are multi-line sentence text)
        f"""c4l AS (
      SELECT url, line,
        (length(line) - length(replace(line, ' ', '')) + 1
        )::BIGINT AS lw,
        (line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?'
         OR line LIKE '%"') AS term,
        regexp_matches(lower(line), '(^| )javascript( |$)') AS js,
        (position('lorem ipsum' IN lower(line)) > 0) AS lorem,
        (position('{{' IN line) > 0) AS brace
      FROM (SELECT pg.url, unnest(string_split(pg.text, chr(10))) AS line
            FROM pg JOIN cd USING (url)))""",
        f"""c4k AS (
      SELECT url FROM c4l GROUP BY url
      HAVING coalesce(sum(CASE WHEN term AND lw >= {C4_MIN_LINE_WORDS}
                                AND NOT js THEN 1 END), 0)
               >= {C4_MIN_KEPT_LINES}
         AND NOT bool_or(lorem) AND NOT bool_or(brace))""",
        # exact content dedup over the gated pages (smallest url wins)
        """surv AS MATERIALIZED (
      SELECT url FROM (
        SELECT pg.url,
               row_number() OVER (PARTITION BY pg.text
                                  ORDER BY pg.url ASC) AS rk
        FROM pg JOIN cd USING (url) JOIN gop USING (url)
                JOIN c4k USING (url))
      WHERE rk = 1)""",
        # links/canonicalization chain over the gated mentions
        f"""mn AS (SELECT {norm_m} AS surface_norm, mention, mtype
      FROM read_parquet('{_EXPORT}/mentions/part=*/*.parquet')
      WHERE url IN (SELECT url FROM surv) AND {norm_m} != '')""",
        """tot AS (SELECT surface_norm, count(*)::BIGINT AS n_mentions
      FROM mn GROUP BY 1)""",
        """canon AS (
      SELECT surface_norm, mention AS canonical FROM (
        SELECT surface_norm, mention,
               row_number() OVER (PARTITION BY surface_norm
                                  ORDER BY count(*) DESC, mention ASC)
                 AS rn
        FROM mn GROUP BY surface_norm, mention) WHERE rn = 1)""",
        """ety AS (
      SELECT surface_norm, mtype AS etype FROM (
        SELECT surface_norm, mtype,
               row_number() OVER (PARTITION BY surface_norm
                                  ORDER BY count(*) DESC, mtype ASC)
                 AS rn
        FROM mn GROUP BY surface_norm, mtype) WHERE rn = 1)""",
        f"""lnk AS MATERIALIZED (
      SELECT {_sql_hash64('t.surface_norm')} AS entity_id,
             c.canonical, e.etype, t.n_mentions
      FROM tot t JOIN canon c USING (surface_norm)
                 JOIN ety e USING (surface_norm))""",
        # schema filter over the gated triples
        f"""trf AS MATERIALIZED (
      SELECT url, sent_id, subj, pred, obj, subj_type, obj_type
      FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')
      WHERE url IN (SELECT url FROM surv))""",
        """pat AS (SELECT subj_type, pred, obj_type,
             count(*)::BIGINT AS n
      FROM trf GROUP BY 1, 2, 3)""",
        """ptot AS (SELECT pred, sum(n)::BIGINT AS t FROM pat
      GROUP BY pred)""",
        f"""trk AS (
      SELECT trf.subj, trf.pred, trf.obj FROM trf
      JOIN pat USING (subj_type, pred, obj_type)
      JOIN ptot USING (pred)
      WHERE pat.n * {_SCHEMA_KEEP_DEN()} >= ptot.t)""",
        f"""edg AS MATERIALIZED (
      SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
             {_sql_hash64(_sql_norm('obj'))} AS obj_id,
             count(*)::BIGINT AS weight
      FROM trk GROUP BY 1, 2, 3)""",
        # PageRank fixed-point unroll over the release edge table
        """pends AS (SELECT subj_id AS entity_id, weight AS w_out FROM edg
      UNION ALL SELECT obj_id, 0 FROM edg)""",
        """pnodes AS MATERIALIZED (
      SELECT entity_id, sum(w_out)::BIGINT AS w_out
      FROM pends GROUP BY entity_id)""",
        """pnn AS MATERIALIZED (SELECT count(*)::BIGINT AS c FROM pnodes)""",
        f"""pr0 AS MATERIALIZED (
      SELECT entity_id, {PR_SCALE} // (SELECT c FROM pnn) AS fp, w_out
      FROM pnodes)""",
    ]
    for i in range(pr_iters):
        parts.append(
            f"""pd{i} AS MATERIALIZED (
      SELECT coalesce(sum(fp), 0)::BIGINT AS m
      FROM pr{i} WHERE w_out = 0)"""
        )
        parts.append(
            f"""pc{i} AS MATERIALIZED (
      SELECT e.obj_id AS entity_id,
             sum((r.fp * e.weight) // r.w_out)::BIGINT AS s
      FROM edg e JOIN pr{i} r ON r.entity_id = e.subj_id
      GROUP BY 1)"""
        )
        parts.append(
            f"""pr{i + 1} AS MATERIALIZED (
      SELECT nd.entity_id,
          (({1000 - dnum} * {PR_SCALE})
             // (1000 * (SELECT c FROM pnn)))
        + ({dnum} * (coalesce(c.s, 0)
             + (SELECT m FROM pd{i}) // (SELECT c FROM pnn))) // 1000
          AS fp,
          nd.w_out
      FROM pnodes nd LEFT JOIN pc{i} c ON c.entity_id = nd.entity_id)"""
        )
    parts.append(
        f"""prk AS (SELECT entity_id, fp / {float(PR_SCALE)} AS rank
      FROM pr{pr_iters})"""
    )
    harmonic_sub = sql_harmonic(
        "e2 AS (SELECT DISTINCT subj_id, obj_id FROM edg)",
        iters=hb_iters,
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    harm AS MATERIALIZED ({harmonic_sub})
    SELECT l.entity_id, l.canonical, l.etype, l.n_mentions,
           coalesce(p.rank, 0.0) AS rank,
           coalesce(h.harmonic, 0.0) AS harmonic
    FROM lnk l
    LEFT JOIN prk p ON p.entity_id = l.entity_id
    LEFT JOIN harm h ON h.entity_id = l.entity_id
    """
    )


def _ppr_sql(iters: int = 8, damping: float = 0.85, n_seeds: int = 2) -> str:
    """SQL twin of :func:`_kg_ppr`: the :func:`_pagerank_sql` unroll
    with initial mass, teleport, and dangling share gated to the seed
    set (top ``n_seeds`` hubs by w_out DESC, entity_id ASC — the same
    deterministic pick as ``_top_hubs``)."""
    from promptner_ray.functions.graphops import PR_SCALE

    dnum = round(damping * 1000)
    seed = "entity_id IN (SELECT entity_id FROM seeds)"
    parts = [
        f"""tr AS (SELECT subj, pred, obj
           FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
    edg AS MATERIALIZED (
      SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
             {_sql_hash64(_sql_norm('obj'))} AS obj_id,
             count(*)::BIGINT AS weight
      FROM tr GROUP BY 1, 2, 3),
    ends AS (SELECT subj_id AS entity_id, weight AS w_out FROM edg
             UNION ALL SELECT obj_id, 0 FROM edg),
    nodes AS MATERIALIZED (SELECT entity_id, sum(w_out)::BIGINT AS w_out
              FROM ends GROUP BY entity_id),
    seeds AS MATERIALIZED (
           SELECT entity_id FROM nodes
           ORDER BY w_out DESC, entity_id ASC LIMIT {n_seeds}),
    ns AS MATERIALIZED (SELECT count(*)::BIGINT AS c FROM seeds),
    r0 AS MATERIALIZED (
           SELECT entity_id,
             CASE WHEN {seed}
                  THEN {PR_SCALE} // (SELECT c FROM ns) ELSE 0 END AS fp,
             w_out
           FROM nodes)"""
    ]
    for i in range(iters):
        parts.append(
            f"""d{i} AS MATERIALIZED (
           SELECT coalesce(sum(fp), 0)::BIGINT AS m
           FROM r{i} WHERE w_out = 0),
    c{i} AS MATERIALIZED (
             SELECT e.obj_id AS entity_id,
                    sum((r.fp * e.weight) // r.w_out)::BIGINT AS s
             FROM edg e JOIN r{i} r ON r.entity_id = e.subj_id
             GROUP BY 1),
    r{i + 1} AS MATERIALIZED (
           SELECT nd.entity_id,
               (CASE WHEN nd.{seed}
                 THEN ({1000 - dnum} * {PR_SCALE})
                        // (1000 * (SELECT c FROM ns)) ELSE 0 END)
             + ({dnum} * (coalesce(c.s, 0)
                  + CASE WHEN nd.{seed}
                    THEN (SELECT m FROM d{i}) // (SELECT c FROM ns)
                    ELSE 0 END)) // 1000
               AS fp,
               nd.w_out
           FROM nodes nd LEFT JOIN c{i} c ON c.entity_id = nd.entity_id)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT entity_id, fp / {float(PR_SCALE)} AS rank FROM r{iters}"""
    )


def _hits_sql(iters: int = 5) -> str:
    """Exact SQL twin of :func:`graphops.hits` — the L1-normalized HITS
    rounds unroll to (raw-sum, total, rescale) CTE triples per phase
    replaying the identical int64 ops (``Σ fp·w`` then
    ``raw // greatest(total // HITS_SCALE, 1)``)."""
    from promptner_ray.functions.graphops import HITS_SCALE

    s = HITS_SCALE
    parts = [
        f"""tr AS (SELECT subj, pred, obj
           FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
    edg AS MATERIALIZED (
      SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
             {_sql_hash64(_sql_norm('obj'))} AS obj_id,
             count(*)::BIGINT AS weight
      FROM tr GROUP BY 1, 2, 3),
    nodes AS MATERIALIZED (
      SELECT DISTINCT entity_id FROM (
        SELECT subj_id AS entity_id FROM edg
        UNION ALL SELECT obj_id FROM edg)),
    nn AS MATERIALIZED (SELECT count(*)::BIGINT AS c FROM nodes),
    h0 AS MATERIALIZED (
      SELECT entity_id, {s} // (SELECT c FROM nn) AS fp FROM nodes)"""
    ]
    for i in range(iters):
        parts.append(
            f"""ar{i} AS MATERIALIZED (
      SELECT nd.entity_id, coalesce(sc.c, 0)::BIGINT AS c
      FROM nodes nd LEFT JOIN (
        SELECT e.obj_id AS entity_id,
               sum(h.fp * e.weight)::BIGINT AS c
        FROM edg e JOIN h{i} h ON h.entity_id = e.subj_id
        GROUP BY 1) sc ON sc.entity_id = nd.entity_id),
    ad{i} AS MATERIALIZED (
      SELECT greatest(sum(c)::BIGINT // {s}, 1) AS d FROM ar{i}),
    a{i + 1} AS MATERIALIZED (
      SELECT entity_id, c // (SELECT d FROM ad{i}) AS fp FROM ar{i}),
    hr{i} AS MATERIALIZED (
      SELECT nd.entity_id, coalesce(sc.c, 0)::BIGINT AS c
      FROM nodes nd LEFT JOIN (
        SELECT e.subj_id AS entity_id,
               sum(a.fp * e.weight)::BIGINT AS c
        FROM edg e JOIN a{i + 1} a ON a.entity_id = e.obj_id
        GROUP BY 1) sc ON sc.entity_id = nd.entity_id),
    hd{i} AS MATERIALIZED (
      SELECT greatest(sum(c)::BIGINT // {s}, 1) AS d FROM hr{i}),
    h{i + 1} AS MATERIALIZED (
      SELECT entity_id, c // (SELECT d FROM hd{i}) AS fp FROM hr{i})"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT a.entity_id, a.fp / {float(s)} AS auth,
           h.fp / {float(s)} AS hub
    FROM a{iters} a JOIN h{iters} h USING (entity_id)"""
    )


def _graph_edge_prologue() -> str:
    """Shared CTE prologue for the scalar graph-statistic twins: the
    hashed weighted edge table and its distinct directed pair set."""
    return f"""tr AS (SELECT subj, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        e2 AS MATERIALIZED (
          SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS subj_id,
                 {_sql_hash64(_sql_norm('obj'))} AS obj_id
          FROM tr)"""


def _reciprocity_sql() -> str:
    """SQL twin of :func:`graphops.reciprocity` — distinct non-loop
    pairs folded onto the undirected key with the same injective
    direction-flag sum (3 ⇔ both directions present), final ratio as
    one int64→double division on both engines."""
    return f"""
        WITH {_graph_edge_prologue()},
        nl AS (SELECT subj_id, obj_id FROM e2 WHERE subj_id <> obj_id),
        und AS (
          SELECT least(subj_id, obj_id) AS lo,
                 greatest(subj_id, obj_id) AS hi,
                 sum(CASE WHEN subj_id < obj_id THEN 1 ELSE 2 END) AS d
          FROM nl GROUP BY 1, 2),
        agg AS (
          SELECT (count(*) + count(*) FILTER (WHERE d = 3))::BIGINT
                   AS edges,
                 (2 * count(*) FILTER (WHERE d = 3))::BIGINT AS recip
          FROM und)
        SELECT edges, recip AS reciprocal_edges,
               CASE WHEN edges > 0
                    THEN CAST(recip AS DOUBLE) / CAST(edges AS DOUBLE)
                    ELSE 0.0 END AS reciprocity
        FROM agg
    """


def _assortativity_sql() -> str:
    """SQL twin of :func:`graphops.assortativity` — the six moment sums
    in exact HUGEINT arithmetic (the engine uses Python ints), then the
    identical double expression: ``(n·Σxy − ΣxΣy) / (√(n·Σx² − (Σx)²) ·
    √(n·Σy² − (Σy)²))`` with int→double casts on both sides."""
    return f"""
        WITH {_graph_edge_prologue()},
        xd AS (SELECT subj_id, count(*)::BIGINT AS x FROM e2 GROUP BY 1),
        yd AS (SELECT obj_id, count(*)::BIGINT AS y FROM e2 GROUP BY 1),
        j AS (SELECT x, y FROM e2
              JOIN xd USING (subj_id) JOIN yd USING (obj_id)),
        m AS (SELECT count(*)::HUGEINT AS n,
                     sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
                     sum(x::HUGEINT * y) AS sxy,
                     sum(x::HUGEINT * x) AS sxx,
                     sum(y::HUGEINT * y) AS syy
              FROM j)
        SELECT CAST(n AS BIGINT) AS edges,
               CASE WHEN (n * sxx - sx * sx) > 0
                     AND (n * syy - sy * sy) > 0
                    THEN CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                    ELSE 0.0 END AS assortativity
        FROM m
    """


def _bowtie_sql(max_hops: int = 15) -> str:
    """SQL twin of :func:`graphops.bowtie` — the forward and backward
    reachable sets as two recursive CTEs from the shared seed rule
    (argmax out-weight, min-id tie-break), classified per node; empty
    regions drop out of the GROUP BY on both engines."""
    return f"""
        WITH RECURSIVE tr AS (SELECT subj, pred, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        edg AS MATERIALIZED (
          SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
                 {_sql_hash64(_sql_norm('obj'))} AS obj_id,
                 count(*)::BIGINT AS weight
          FROM tr GROUP BY 1, 2, 3),
        ends AS (SELECT subj_id AS entity_id, weight AS w_out FROM edg
                 UNION ALL SELECT obj_id, 0 FROM edg),
        nodes AS MATERIALIZED (
          SELECT entity_id, sum(w_out)::BIGINT AS w_out
          FROM ends GROUP BY entity_id),
        seed AS (SELECT entity_id FROM nodes
                 ORDER BY w_out DESC, entity_id ASC LIMIT 1),
        e2 AS MATERIALIZED (SELECT DISTINCT subj_id, obj_id FROM edg),
        fw(node, hop) AS (
          SELECT entity_id, 0 FROM seed
          UNION
          SELECT e.obj_id, f.hop + 1
          FROM fw f JOIN e2 e ON e.subj_id = f.node
          WHERE f.hop < {max_hops}),
        bw(node, hop) AS (
          SELECT entity_id, 0 FROM seed
          UNION
          SELECT e.subj_id, b.hop + 1
          FROM bw b JOIN e2 e ON e.obj_id = b.node
          WHERE b.hop < {max_hops}),
        f1 AS (SELECT DISTINCT node FROM fw),
        b1 AS (SELECT DISTINCT node FROM bw),
        cls AS (
          SELECT n.entity_id,
                 CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL
                        THEN 'core'
                      WHEN b.node IS NOT NULL THEN 'in'
                      WHEN f.node IS NOT NULL THEN 'out'
                      ELSE 'other' END AS region
          FROM nodes n
          LEFT JOIN f1 f ON f.node = n.entity_id
          LEFT JOIN b1 b ON b.node = n.entity_id)
        SELECT region, count(*)::BIGINT AS n_nodes
        FROM cls GROUP BY region
    """


def _kcore_sql(k: int = 3, max_iters: int = 30) -> str:
    """SQL twin of :func:`graphops.k_core`: iterative peeling as one
    recursive CTE carrying the surviving EDGE set per round (it, a, b) —
    degrees recomputed per round from the carried edges, nodes below
    ``k`` dropped by semi-joining both endpoints against the survivor
    set, capped at ``max_iters`` rounds (matching the Ray op); once the
    peel converges the fixpoint set re-emits unchanged every round, so
    the ``it = max_iters`` slice IS the k-core (and is empty exactly
    when the core is empty — matching the Ray op's empty result)."""
    surv = f"""(SELECT it, node FROM (
              SELECT it, node, count(*) AS c
              FROM (SELECT it, a AS node FROM peel
                    UNION ALL SELECT it, b FROM peel)
              GROUP BY it, node)
            WHERE c >= {k})"""
    return f"""
        WITH RECURSIVE tr AS (SELECT subj, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        edg AS (
          SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS subj_id,
                 {_sql_hash64(_sql_norm('obj'))} AS obj_id
          FROM tr),
        und AS (
          SELECT DISTINCT least(subj_id, obj_id) AS a,
                 greatest(subj_id, obj_id) AS b
          FROM edg WHERE subj_id != obj_id),
        peel(it, a, b) AS (
          SELECT 0, a, b FROM und
          UNION
          SELECT p.it + 1, p.a, p.b
          FROM peel p
          JOIN {surv} sa ON sa.it = p.it AND sa.node = p.a
          JOIN {surv} sb ON sb.it = p.it AND sb.node = p.b
          WHERE p.it < {max_iters}
        ),
        core AS (SELECT a, b FROM peel WHERE it = {max_iters})
        SELECT node AS entity_id, count(*)::BIGINT AS degree
        FROM (SELECT a AS node FROM core UNION ALL SELECT b FROM core)
        GROUP BY node
    """


def _ktruss_sql(k: int = 4, max_iters: int = 8) -> str:
    """SQL twin of :func:`graphops.k_truss`: support peeling as one
    recursive CTE carrying the surviving EDGE set per round.  Edges are
    id-ordered (a < b), so a triangle enumerates as the straight
    3-self-join (a,b)+(b,c)+(a,c) with x<y<z and its three edge keys
    need no re-normalization; per-round support is the 3-way UNION ALL
    rollup of that enumeration (inlined — the recursive table cannot be
    aliased into a named CTE), edges under k−2 drop (zero-support edges
    drop implicitly via the inner join), capped at ``max_iters`` rounds
    matching the Ray op; the converged peel re-emits its fixpoint
    unchanged, so the ``it = max_iters`` slice IS the truss.  The final
    SELECT recomputes support inside the truss exactly like the Ray op's
    closing pass."""
    tri = (
        "SELECT t1.it, t1.a AS x, t1.b AS y, t2.b AS z "
        "FROM peel t1 "
        "JOIN peel t2 ON t2.it = t1.it AND t2.a = t1.b "
        "JOIN peel t3 ON t3.it = t1.it AND t3.a = t1.a AND t3.b = t2.b"
    )
    sup = f"""(SELECT s.it, s.ea AS a, s.eb AS b, count(*) AS c FROM (
              SELECT it, x AS ea, y AS eb FROM ({tri})
              UNION ALL SELECT it, y, z FROM ({tri})
              UNION ALL SELECT it, x, z FROM ({tri})) s
            GROUP BY 1, 2, 3)"""
    return f"""
        WITH RECURSIVE tr AS (SELECT subj, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        edg AS (
          SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS subj_id,
                 {_sql_hash64(_sql_norm('obj'))} AS obj_id
          FROM tr),
        und AS (
          SELECT DISTINCT least(subj_id, obj_id) AS a,
                 greatest(subj_id, obj_id) AS b
          FROM edg WHERE subj_id != obj_id),
        peel(it, a, b) AS (
          SELECT 0, a, b FROM und
          UNION
          SELECT p.it + 1, p.a, p.b
          FROM peel p
          JOIN {sup} s ON s.it = p.it AND s.a = p.a AND s.b = p.b
          WHERE p.it < {max_iters} AND s.c >= {k - 2}
        ),
        truss AS (SELECT a, b FROM peel WHERE it = {max_iters}),
        tri2 AS (
          SELECT t1.a AS x, t1.b AS y, t2.b AS z
          FROM truss t1
          JOIN truss t2 ON t2.a = t1.b
          JOIN truss t3 ON t3.a = t1.a AND t3.b = t2.b)
        SELECT s.a, s.b, count(*)::BIGINT AS support FROM (
          SELECT x AS a, y AS b FROM tri2
          UNION ALL SELECT y, z FROM tri2
          UNION ALL SELECT x, z FROM tri2) s
        GROUP BY s.a, s.b
        HAVING count(*) >= {k - 2}
    """


def _lp_cte(max_iters: int = 10) -> str:
    """Shared recursive-CTE prefix replaying synchronous min-tie-break
    label propagation over the undirected distinct entity graph — used
    by the `kg_communities` and `kg_modularity` twins."""
    votes = """(SELECT v.it, v.dst, v.label, count(*) AS c
          FROM (SELECT l.it, a.dst, l.label
                FROM adj a JOIN lp l ON l.node = a.src
                UNION ALL
                SELECT it, node, label FROM lp) v
          GROUP BY v.it, v.dst, v.label)"""
    return f"""
        WITH RECURSIVE tr AS (SELECT subj, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        edg AS (
          SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS subj_id,
                 {_sql_hash64(_sql_norm('obj'))} AS obj_id
          FROM tr),
        und AS (
          SELECT DISTINCT least(subj_id, obj_id) AS a,
                 greatest(subj_id, obj_id) AS b
          FROM edg WHERE subj_id != obj_id),
        adj AS (SELECT a AS src, b AS dst FROM und
                UNION ALL SELECT b, a FROM und),
        nodes AS (SELECT DISTINCT src AS node FROM adj),
        lp(it, node, label) AS (
          SELECT 0, node, node FROM nodes
          UNION
          SELECT it + 1, dst, label FROM (
            SELECT c.it, c.dst, min(c.label) AS label
            FROM {votes} c
            JOIN (SELECT it, dst, max(c) AS m FROM {votes} mm
                  GROUP BY it, dst) mx
              ON mx.it = c.it AND mx.dst = c.dst AND c.c = mx.m
            GROUP BY c.it, c.dst
          ) WHERE it < {max_iters}
        )"""


def _kg_betweenness(sf_dir: str):
    """Approximate betweenness by k-source Brandes from the top-k hubs,
    with the dependency recursion in exact 2⁻²⁰ fixed-point integers —
    commutative sums, bit-identical at any parallelism."""
    from promptner_ray.functions.graphops import BC_SOURCES, betweenness

    edges = _kg_edges_raw(sf_dir).materialize()
    return betweenness(edges, sources=_top_hubs(edges, BC_SOURCES))


def _kg_betweenness_bsp(sf_dir: str):
    """The same k-source Brandes on the dual-direction BSP actor pool —
    bit-identical (shared oracle), the scale path (round 5)."""
    from promptner_ray.functions.graphbsp import betweenness_bsp
    from promptner_ray.functions.graphops import BC_SOURCES

    edges = _kg_edges_raw(sf_dir).materialize()
    return betweenness_bsp(edges, sources=_top_hubs(edges, BC_SOURCES))


def _betweenness_sql(max_depth: int | None = None) -> str:
    """SQL twin of ``_kg_betweenness``: seeds = ORDER BY w_out DESC,
    entity_id LIMIT k; forward levels unrolled with NOT-EXISTS
    visited-set pruning; backward levels unrolled with the identical
    integer ``(σv·(SCALE+δw)) // σw`` accumulation."""
    from promptner_ray.functions.graphops import (
        BC_MAX_DEPTH,
        BC_SCALE,
        BC_SOURCES,
    )

    depth = BC_MAX_DEPTH if max_depth is None else max_depth
    fwd = []
    for k in range(1, depth + 1):
        fwd.append(
            f"""f{k} AS MATERIALIZED (
          SELECT s, node, sum(sigma)::BIGINT AS sigma FROM (
            SELECT f.s, e.obj_id AS node, f.sigma
            FROM f{k - 1} f JOIN e2 e ON e.subj_id = f.node) m
          WHERE NOT EXISTS (SELECT 1 FROM v{k - 1} v
                            WHERE v.s = m.s AND v.node = m.node)
          GROUP BY s, node),
        v{k} AS MATERIALIZED (SELECT * FROM v{k - 1}
                 UNION ALL SELECT s, node FROM f{k})"""
        )
    bwd = [
        f"d{depth} AS (SELECT s, node, sigma, 0::BIGINT AS delta "
        f"FROM f{depth})"
    ]
    for k in range(depth - 1, 0, -1):
        bwd.append(
            f"""d{k} AS MATERIALIZED (
          SELECT v.s, v.node, v.sigma,
                 coalesce((SELECT sum((v.sigma * ({BC_SCALE} + w.delta))
                                      // w.sigma)
                           FROM e2 e JOIN d{k + 1} w
                             ON w.s = v.s AND w.node = e.obj_id
                           WHERE e.subj_id = v.node), 0)::BIGINT AS delta
          FROM f{k} v)"""
        )
    union = "\n          UNION ALL ".join(
        f"SELECT node, delta FROM d{k}" for k in range(1, depth + 1)
    )
    return f"""
        WITH tr AS (SELECT subj, pred, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        edg AS MATERIALIZED (
          SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
                 {_sql_hash64(_sql_norm('obj'))} AS obj_id,
                 count(*)::BIGINT AS weight
          FROM tr GROUP BY 1, 2, 3),
        ends AS (SELECT subj_id AS entity_id, weight AS w_out FROM edg
                 UNION ALL SELECT obj_id, 0 FROM edg),
        nodes AS (SELECT entity_id, sum(w_out)::BIGINT AS w_out
                  FROM ends GROUP BY entity_id),
        seeds AS (SELECT entity_id FROM nodes
                  ORDER BY w_out DESC, entity_id ASC
                  LIMIT {BC_SOURCES}),
        e2 AS MATERIALIZED (SELECT DISTINCT subj_id, obj_id FROM edg),
        f0 AS (SELECT entity_id AS s, entity_id AS node,
                      1::BIGINT AS sigma FROM seeds),
        v0 AS (SELECT s, node FROM f0),
        {",".join(fwd)},
        {",".join(bwd)}
        SELECT node AS entity_id, sum(delta)::BIGINT AS bc_fp,
               (sum(delta)::BIGINT)::DOUBLE / {float(BC_SCALE)!r} AS bc
        FROM ({union})
        GROUP BY node
    """


def _kg_coloring(sf_dir: str):
    """Greedy distributed coloring by iterated deterministic Luby MIS
    rounds — the conflict-free-scheduling primitive (e.g. batching
    entity merges so no two adjacent entities merge in one wave)."""
    from promptner_ray.functions.graphops import mis_coloring

    return mis_coloring(_kg_edges_raw(sf_dir))


def _mis_coloring_sql(max_rounds: int | None = None) -> str:
    """SQL twin of :func:`graphops.mis_coloring`: a recursive CTE where
    a node survives a round iff some live neighbor's (md5 prio, id)
    beats it; color = the last round survived (winners stop appearing;
    the shared ``max_rounds`` cap rule makes the engines identical even
    if rounds run out)."""
    from promptner_ray.functions.graphops import MIS_MAX_ROUNDS

    cap = MIS_MAX_ROUNDS if max_rounds is None else max_rounds
    return f"""
        WITH RECURSIVE tr AS (SELECT subj, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        edg AS (
          SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS subj_id,
                 {_sql_hash64(_sql_norm('obj'))} AS obj_id
          FROM tr),
        und AS (
          SELECT DISTINCT least(subj_id, obj_id) AS a,
                 greatest(subj_id, obj_id) AS b
          FROM edg WHERE subj_id != obj_id),
        adj AS (SELECT a AS src, b AS dst FROM und
                UNION ALL SELECT b, a FROM und),
        np AS (SELECT DISTINCT src AS node FROM adj),
        pr AS (SELECT node, {_sql_hash64('node::VARCHAR')} AS prio
               FROM np),
        live(it, node, prio) AS (
          SELECT 0, node, prio FROM pr
          UNION ALL
          SELECT it + 1, node, prio FROM (
            SELECT l.it, l.node, l.prio,
                   max(CASE WHEN m.prio < l.prio
                            OR (m.prio = l.prio AND m.node < l.node)
                       THEN 1 ELSE 0 END) AS beaten
            FROM live l
            JOIN adj a ON a.src = l.node
            JOIN live m ON m.it = l.it AND m.node = a.dst
            GROUP BY l.it, l.node, l.prio
          ) WHERE beaten = 1 AND it < {cap}
        )
        SELECT node AS entity_id, max(it)::BIGINT AS color
        FROM live GROUP BY node
    """


def _labelprop_sql(max_iters: int = 10) -> str:
    """SQL twin of :func:`graphops.label_propagation`: synchronous
    min-tie-break voting is deterministic at any parallelism, so the
    recursive CTE carrying (it, node, label) and replaying the identical
    vote (count desc, label asc over neighbor labels + self-vote) for
    exactly ``max_iters`` rounds reproduces the distributed result — an
    early-converged run re-emits its fixpoint unchanged every remaining
    round, so the ``it = max_iters`` slice matches both the converged
    and the iteration-capped case."""
    return f"""{_lp_cte(max_iters)}
        SELECT node AS entity_id, label AS community
        FROM lp WHERE it = {max_iters}
    """


def _modularity_sql(max_iters: int = 10) -> str:
    """SQL twin of :func:`graphops.modularity`: the `_lp_cte` labels
    joined back onto the undirected edge and degree tables;
    ``q_contrib`` is the identical fixed (x/m) − (d/2m)·(d/2m) float
    expression of integer inputs, so it hash-matches bit for bit."""
    return f"""{_lp_cte(max_iters)},
        lab AS (SELECT node AS entity_id, label AS community
                FROM lp WHERE it = {max_iters}),
        mm AS (SELECT count(*)::BIGINT AS m FROM und),
        labeled AS (
          SELECT la.community AS ca, lb.community AS cb
          FROM und u
          JOIN lab la ON la.entity_id = u.a
          JOIN lab lb ON lb.entity_id = u.b),
        inner_c AS (
          SELECT ca AS community, count(*)::BIGINT AS inner_edges
          FROM labeled WHERE ca = cb GROUP BY ca),
        degs AS (
          SELECT node, count(*)::BIGINT AS d
          FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
          GROUP BY node),
        comm AS (
          SELECT l.community, count(*)::BIGINT AS n_nodes,
                 sum(dg.d)::BIGINT AS degree_sum
          FROM degs dg JOIN lab l ON l.entity_id = dg.node
          GROUP BY l.community)
        SELECT c.community, c.n_nodes,
               coalesce(i.inner_edges, 0)::BIGINT AS inner_edges,
               c.degree_sum,
               coalesce(i.inner_edges, 0)::DOUBLE / mm.m::DOUBLE
                 - (c.degree_sum::DOUBLE / (2 * mm.m)::DOUBLE)
                   * (c.degree_sum::DOUBLE / (2 * mm.m)::DOUBLE)
                 AS q_contrib
        FROM comm c LEFT JOIN inner_c i USING (community), mm
    """


def _bfs_sql(max_hops: int = 15) -> str:
    """SQL twin of ``_kg_reachability``: seed = argmax out-weight (min
    id tie-break), then a recursive CTE enumerating (node, hop) pairs up
    to the shared depth cap; ``min(hop)`` per node equals BFS distance
    for every node whose distance is within the cap — exactly the set
    the frontier expansion emits."""
    return f"""
        WITH RECURSIVE tr AS (SELECT subj, pred, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        edg AS MATERIALIZED (
          SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
                 {_sql_hash64(_sql_norm('obj'))} AS obj_id,
                 count(*)::BIGINT AS weight
          FROM tr GROUP BY 1, 2, 3),
        ends AS (SELECT subj_id AS entity_id, weight AS w_out FROM edg
                 UNION ALL SELECT obj_id, 0 FROM edg),
        nodes AS (SELECT entity_id, sum(w_out)::BIGINT AS w_out
                  FROM ends GROUP BY entity_id),
        seed AS (SELECT entity_id FROM nodes
                 ORDER BY w_out DESC, entity_id ASC LIMIT 1),
        e2 AS MATERIALIZED (SELECT DISTINCT subj_id, obj_id FROM edg),
        bfs(node, hop) AS (
          SELECT entity_id, 0 FROM seed
          UNION
          SELECT e.obj_id, b.hop + 1
          FROM bfs b JOIN e2 e ON e.subj_id = b.node
          WHERE b.hop < {max_hops}
        )
        SELECT node AS entity_id, min(hop)::BIGINT AS hop
        FROM bfs GROUP BY node
    """


def _walks_sql(walk_len: int = 8, k_walks: int = 2, seed: int = 42) -> str:
    """SQL twin of ``_kg_random_walks``: neighbor choice is a pure
    wrapping-int64 mix of (node, step, walk identity, seed) reduced mod
    out-degree, replayed here in HUGEINT arithmetic (operands kept
    < 2⁹⁷ by the < 2³² multipliers, wrap = explicit ``% 2⁶⁴``); the
    recursive CTE advances every live walk one step per round, walks
    dying at sinks exactly like the Ray frontier."""
    from promptner_ray.functions.graphops import RW_M1, RW_M2, RW_M3

    T = "18446744073709551616"  # 2**64

    def u(x: str) -> str:
        return f"((({x})::HUGEINT % {T}) + {T}) % {T}"

    h = (
        f"(({u('w.cur')}) * {RW_M1} "
        f"+ (w.step + 1) * {RW_M2} "
        f"+ ((({u('w.start_node')}) * {k_walks} + w.walk_no) % {T}) "
        f"* {RW_M3} + {seed}) % {T}"
    )
    return f"""
        WITH RECURSIVE tr AS (SELECT subj, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        edg AS MATERIALIZED (
          SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS src,
                 {_sql_hash64(_sql_norm('obj'))} AS dst
          FROM tr),
        adjr AS MATERIALIZED (
          SELECT src, dst,
                 row_number() OVER (PARTITION BY src ORDER BY dst) - 1
                   AS rk
          FROM edg),
        degs AS MATERIALIZED (
          SELECT src, count(*)::BIGINT AS d FROM edg GROUP BY src),
        nodes AS (SELECT DISTINCT node FROM (
          SELECT src AS node FROM edg UNION ALL SELECT dst FROM edg)),
        walks(start_node, walk_no, step, cur) AS (
          SELECT node, wno, 0, node
          FROM nodes,
               (SELECT unnest(generate_series(0, {k_walks - 1})) AS wno)
          UNION ALL
          SELECT w.start_node, w.walk_no, w.step + 1, a.dst
          FROM walks w
          JOIN degs dg ON dg.src = w.cur
          JOIN adjr a ON a.src = w.cur
                     AND a.rk = CAST(({h}) % dg.d::HUGEINT AS BIGINT)
          WHERE w.step < {walk_len}
        )
        SELECT start_node, walk_no, step::BIGINT AS step,
               cur AS entity_id
        FROM walks
    """


def _SCHEMA_KEEP_DEN() -> int:
    from promptner_ray.functions.kgschema import SCHEMA_KEEP_DEN

    return SCHEMA_KEEP_DEN


def _PATH_PIVOT_CAP() -> int:
    from promptner_ray.functions.kgschema import PATH_PIVOT_CAP

    return PATH_PIVOT_CAP


def _pq_sql() -> str:
    """SQL twin of ``_embed_pq``: per subspace one correlated argmin-L2
    subquery over the exported codebooks (DuckDB ``list_distance`` on
    the 1-based-inclusive subvector slice)."""
    from promptner_ray.functions.similarity import PQ_M

    dim = 64
    sub = dim // PQ_M
    cb = f"/tmp/promptner_pq/{_ORACLE_SF_NAME}/codebooks.parquet"
    codes = ",\n          ".join(
        f"""(SELECT c.code FROM read_parquet('{cb}') c
             WHERE c.sub = {s}
             ORDER BY list_distance(
               e.embedding[{s * sub + 1}:{(s + 1) * sub}]::DOUBLE[],
               c.centroid) ASC, c.code ASC
             LIMIT 1) AS code{s}"""
        for s in range(PQ_M)
    )
    return f"""
        SELECT e.vec_id,
          {codes}
        FROM embeddings e
    """


def _pred_cooc_sql() -> str:
    """SQL twin of ``_kg_pred_cooc``: distinct (subj_id, obj_id, pred)
    rows self-joined on the argument pair under the hot-pair cap;
    ``a.pred < b.pred`` is byte order = the engine's ``sorted()`` on
    the ASCII predicate tokens."""
    from promptner_ray.functions.kgschema import DIRT_PAIR_CAP

    return f"""
        WITH tr AS (SELECT subj, pred, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        e AS (
          SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS s,
                 {_sql_hash64(_sql_norm('obj'))} AS o, pred
          FROM tr),
        cnt AS (SELECT s, o, count(*)::BIGINT AS c FROM e GROUP BY s, o),
        ok AS (SELECT s, o FROM cnt
               WHERE c BETWEEN 2 AND {DIRT_PAIR_CAP})
        SELECT a.pred AS pred_a, b.pred AS pred_b,
               count(*)::BIGINT AS n_pairs
        FROM e a
        JOIN e b ON a.s = b.s AND a.o = b.o AND a.pred < b.pred
        JOIN ok ON a.s = ok.s AND a.o = ok.o
        GROUP BY 1, 2
    """


def _negatives_sql() -> str:
    """SQL twin of ``_kg_negative_samples``: node ranks via
    ``row_number() OVER (ORDER BY uint64(entity_id))``, candidate tails
    via the identical wrapping-uint64 mix replayed in HUGEINT (operands
    < 2⁹⁶: multipliers < 2³², values < 2⁶⁴), degenerate tails filtered,
    true edges removed with NOT EXISTS — an independent anti-join
    formulation of the engine's padded left-outer miss filter."""
    from promptner_ray.functions.kgschema import (
        NEG_K,
        NEG_SEED,
        _M1,
        _M2,
        _M3,
    )

    T = "18446744073709551616"  # 2**64

    def u(x: str) -> str:
        return (
            f"CASE WHEN {x} < 0 THEN {x}::HUGEINT + {T} "
            f"ELSE {x}::HUGEINT END"
        )

    pk = _sql_hash64("e.pred")
    h = (
        f"(({u('e.subj_id')}) * {_M1} + ({u('e.obj_id')}) * {_M2} "
        f"+ ({u(f'({pk})')}) * {_M3} + (g.i + 1) * {_M1} + {NEG_SEED}) % {T}"
    )
    return f"""
        WITH {_sql_links_cte()},
        rk AS (
          SELECT entity_id AS nid,
                 row_number() OVER (ORDER BY {u('entity_id')}) - 1 AS rank
          FROM lnk),
        nn AS (SELECT count(*)::HUGEINT AS n FROM rk),
        tr AS (SELECT subj, pred, obj
               FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        edg AS (
          SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
                 {_sql_hash64(_sql_norm('obj'))} AS obj_id
          FROM tr GROUP BY 1, 2, 3),
        cand AS (
          SELECT e.subj_id, e.pred, e.obj_id, g.i::BIGINT AS neg_no,
                 CAST(({h}) % nn.n AS BIGINT) AS rank
          FROM edg e
          CROSS JOIN (SELECT unnest(generate_series(0, {NEG_K - 1})) AS i)
            AS g
          CROSS JOIN nn)
        SELECT c.subj_id, c.pred, c.obj_id, c.neg_no, r.nid AS neg_id
        FROM cand c
        JOIN rk r USING (rank)
        WHERE r.nid != c.obj_id AND r.nid != c.subj_id
          AND NOT EXISTS (
            SELECT 1 FROM edg e2
            WHERE e2.subj_id = c.subj_id AND e2.pred = c.pred
              AND e2.obj_id = r.nid)
    """


def _alias_pairs_sql() -> str:
    """SQL twin of ``_kg_alias_pairs``: replay the deterministic typo
    injection with string surgery (selection and edit position are md5
    mod-functions of the surface, wrapped to Python's non-negative mod),
    then find Levenshtein ≤ 1 pairs with a brute-force cross join —
    an algorithm independent of the engine's deletion-neighborhood
    blocking, which must produce the identical pair set."""
    from promptner_ray.functions.editsim import (
        PAIR_MIN_LEN,
        TYPO_MIN_LEN,
        TYPO_RATE_MOD,
    )

    hs = _sql_hash64("s")
    hts = _sql_hash64("'typo:' || s")
    p0 = f"((({hts}) % length(s)) + length(s)) % length(s)"
    return f"""
        WITH {_sql_links_cte()},
        base AS (SELECT DISTINCT surface_norm AS s FROM lnk),
        inj AS (
          SELECT substr(s, 1, {p0}) || substr(s, {p0} + 2) AS s
          FROM base
          WHERE length(s) >= {TYPO_MIN_LEN}
            AND ((({hs}) % {TYPO_RATE_MOD}) + {TYPO_RATE_MOD})
                  % {TYPO_RATE_MOD} = 0),
        surf AS (
          SELECT DISTINCT s FROM (
            SELECT s FROM base UNION ALL SELECT s FROM inj)
          WHERE length(s) >= {PAIR_MIN_LEN}),
        pairsq AS (
          SELECT {_sql_hash64('a.s')} AS ha, a.s AS sa,
                 {_sql_hash64('b.s')} AS hb, b.s AS sb
          FROM surf a JOIN surf b ON a.s < b.s
          WHERE abs(length(a.s) - length(b.s)) <= 1
            AND levenshtein(a.s, b.s) <= 1)
        SELECT CASE WHEN ha < hb THEN ha ELSE hb END AS entity_a,
               CASE WHEN ha < hb THEN hb ELSE ha END AS entity_b,
               CASE WHEN ha < hb THEN sa ELSE sb END AS surface_a,
               CASE WHEN ha < hb THEN sb ELSE sa END AS surface_b
        FROM pairsq
    """


def _adamic_adar_sql() -> str:
    """SQL twin of :func:`graphops.adamic_adar`: identical pair CTE to
    the neighbor-Jaccard oracle, with each pivot contributing
    ``floor(2⁴⁰ / ln(d_p))`` as BIGINT — ln is libm on both engines and
    the division operands are exact, so the per-pivot weight is
    bit-identical and the integer sum commutes; the final /2⁴⁰ float
    division is exact (power-of-two divisor)."""
    from promptner_ray.functions.graphops import AA_SCALE

    return f"""
        WITH tr AS (SELECT subj, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        edg AS (
          SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS subj_id,
                 {_sql_hash64(_sql_norm('obj'))} AS obj_id
          FROM tr),
        und AS (
          SELECT DISTINCT least(subj_id, obj_id) AS a,
                 greatest(subj_id, obj_id) AS b
          FROM edg WHERE subj_id != obj_id),
        deg AS (
          SELECT node, count(*)::BIGINT AS d
          FROM (SELECT a AS node FROM und
                UNION ALL SELECT b FROM und)
          GROUP BY node),
        adj AS (SELECT a AS p, b AS n FROM und
                UNION ALL SELECT b, a FROM und),
        cap AS (
          SELECT adj.p, adj.n, deg.d AS dp FROM adj
          JOIN deg ON adj.p = deg.node
          WHERE deg.d <= 256 AND deg.d >= 2),
        pairs AS (
          SELECT t1.n AS x, t2.n AS y, count(*)::BIGINT AS common,
                 sum(CAST(floor({float(AA_SCALE)} / ln(t1.dp))
                          AS BIGINT))::BIGINT AS aa_fp
          FROM cap t1 JOIN cap t2 ON t1.p = t2.p AND t1.n < t2.n
          GROUP BY 1, 2)
        SELECT x AS a, y AS b, common, aa_fp,
               aa_fp / {float(AA_SCALE)} AS adamic_adar
        FROM pairs WHERE common >= 2
    """


def _edge_diff_sql() -> str:
    """SQL twin of ``_kg_edge_diff``: replay the md5 url-parity wave
    split, build each wave's edge table with a GROUP BY, FULL OUTER
    JOIN them on the edge identity and keep rows whose weights differ —
    an algorithm independent of the engine's digest-keyed two-join
    plan."""
    hurl = _sql_hash64("url")
    subj = _sql_hash64(_sql_norm("subj"))
    obj = _sql_hash64(_sql_norm("obj"))
    return f"""
        WITH tr AS (SELECT url, subj, pred, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
        e0 AS (
          SELECT {subj} AS subj_id, pred, {obj} AS obj_id,
                 count(*)::BIGINT AS w
          FROM tr WHERE (({hurl}) % 2 + 2) % 2 = 0
          GROUP BY 1, 2, 3),
        e1 AS (
          SELECT {subj} AS subj_id, pred, {obj} AS obj_id,
                 count(*)::BIGINT AS w
          FROM tr WHERE (({hurl}) % 2 + 2) % 2 = 1
          GROUP BY 1, 2, 3)
        SELECT coalesce(e1.subj_id, e0.subj_id) AS subj_id,
               coalesce(e1.pred, e0.pred) AS pred,
               coalesce(e1.obj_id, e0.obj_id) AS obj_id,
               coalesce(e0.w, 0)::BIGINT AS w_old,
               coalesce(e1.w, 0)::BIGINT AS w_new,
               (coalesce(e1.w, 0) - coalesce(e0.w, 0))::BIGINT AS delta
        FROM e1 FULL OUTER JOIN e0
          ON e1.subj_id = e0.subj_id AND e1.pred = e0.pred
         AND e1.obj_id = e0.obj_id
        WHERE coalesce(e1.w, 0) != coalesce(e0.w, 0)
    """


def _sql_simhash_cte() -> str:
    """CTE computing the 64-bit SimHash per document in pure SQL: token
    multiset counts, per-token md5-derived 64-bit hash, signed bit vote,
    bit assembly — bit-identical to functions.dedup.simhash64."""
    return """
    toks AS (
      SELECT doc_id, tok, count(*) AS n FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents)
      GROUP BY doc_id, tok),
    th AS (SELECT doc_id, n,
                  ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
           FROM toks),
    bits AS (
      SELECT doc_id, b,
             sum(CASE WHEN (h >> b) & 1 = 1 THEN n ELSE -n END) AS acc
      FROM th, UNNEST(generate_series(0, 63)) AS g(b)
      GROUP BY doc_id, b),
    sh AS (
      SELECT doc_id,
             lpad(lower(hex(sum(CASE WHEN acc > 0
                                     THEN (1::UBIGINT << b::INT)::HUGEINT
                                     ELSE 0 END)::UBIGINT)), 16, '0')
               AS simhash
      FROM bits GROUP BY doc_id)"""


def _sql_winnow_chosen() -> str:
    """Shared CTE chain ending in ``chosen(doc_id, sel)`` — the distinct
    winnowing fingerprint set per document: explicit 8-term polynomial
    rolling hash (base 257 mod 2^61-1) + per-window min — mirrors
    functions.textstats.winnow_fingerprints for k=8, w=6 on ASCII text."""
    mod = (1 << 61) - 1
    terms = " + ".join(
        f"ord(substr(text, i + {j}, 1))::HUGEINT * {pow(257, 7 - j, mod)}"
        for j in range(8)
    )
    return f"""
    pos AS (
      SELECT doc_id, text, unnest(generate_series(1, length(text) - 7)) AS i
      FROM documents WHERE length(text) >= 8),
    kh AS (
      SELECT doc_id, i, (({terms}) % {mod})::UBIGINT AS h,
             length(text) - 7 AS n
      FROM pos),
    win AS (
      SELECT doc_id, i, n,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS sel
      FROM kh),
    chosen AS (SELECT DISTINCT doc_id, sel FROM win
               WHERE i <= greatest(1, n - 5))"""


def _sql_winnow() -> str:
    """Winnowing fingerprint summary in SQL (see :func:`_sql_winnow_chosen`)."""
    return f"""
    WITH {_sql_winnow_chosen()}
    SELECT doc_id, count(*)::BIGINT AS n_fp, min(sel) AS fp_min
    FROM chosen GROUP BY doc_id
    """


def _dup_spans_sql() -> str:
    """DuckDB twin of functions.dedup.dup_spans: positional token
    n-grams, corpus-repeated grams (count ≥ 2, within-doc repeats
    included), then a gaps-and-islands merge of the covered
    [pos, pos+n) intervals per doc.  Groups by the gram STRING where
    the engine groups by its md5-prefix int64 — identical short of an
    md5 collision (the ``exact_dedup`` caveat)."""
    from promptner_ray.functions.dedup import DUP_SPAN_N as N

    return f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        pos AS (
          SELECT doc_id, ts,
                 unnest(range(0, greatest(len(ts) - {N} + 1, 0))) AS p
          FROM toks
        ),
        grams AS (
          SELECT doc_id, p,
                 array_to_string(ts[p + 1 : p + {N}], ' ') AS g
          FROM pos
        ),
        hot AS (
          SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
        ),
        marked AS (
          SELECT doc_id, p FROM grams WHERE g IN (SELECT g FROM hot)
        ),
        brk AS (
          SELECT doc_id, p,
                 CASE WHEN p - lag(p) OVER (
                     PARTITION BY doc_id ORDER BY p) <= {N}
                 THEN 0 ELSE 1 END AS b
          FROM marked
        ),
        grp AS (
          SELECT doc_id, p,
                 sum(coalesce(b, 1)) OVER (
                     PARTITION BY doc_id ORDER BY p) AS gid
          FROM brk
        )
        SELECT doc_id, min(p)::BIGINT AS start_tok,
               (max(p) + {N})::BIGINT AS end_tok
        FROM grp GROUP BY doc_id, gid
    """


def _strip_dup_spans_sql() -> str:
    """DuckDB twin of functions.dedup.strip_dup_spans: anti-join every
    token position against the duplicated-span intervals, re-join the
    survivors on single spaces (the corpus's canonical whitespace, so
    untouched docs round-trip verbatim)."""
    return f"""
        WITH spans AS ({_dup_spans_sql()}),
        toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        tok AS (
          SELECT doc_id, unnest(ts) AS w,
                 generate_subscripts(ts, 1) - 1 AS p
          FROM toks
        ),
        kept AS (
          SELECT t.doc_id, t.w, t.p FROM tok t
          WHERE NOT EXISTS (
            SELECT 1 FROM spans s
            WHERE s.doc_id = t.doc_id
              AND t.p >= s.start_tok AND t.p < s.end_tok)
        )
        SELECT d.doc_id,
               coalesce(string_agg(k.w, ' ' ORDER BY k.p), '') AS text
        FROM toks d LEFT JOIN kept k ON k.doc_id = d.doc_id
        GROUP BY d.doc_id
    """


def _boiler_docs_cte() -> str:
    """The injected-banner documents view shared by the boilerplate
    twins — replays ``dedup.inject_nav_banner_batch`` verbatim."""
    from promptner_ray.functions.dedup import BANNER_TAIL

    return f"""bdocs AS (
          SELECT doc_id, source,
                 CASE WHEN doc_id % 4 <> 0
                      THEN source || ' {BANNER_TAIL} ' || text
                      ELSE text END AS text
          FROM documents
        )"""


def _boilerplate_spans_sql() -> str:
    """DuckDB twin of functions.dedup.boilerplate_spans over the
    banner-injected documents: per-(source, gram) DISTINCT-doc counts,
    the same ``df * 1.0 / total`` fraction filter, and the shared
    gaps-and-islands merge.  Groups by the (source, gram) STRINGS where
    the engine groups by their md5 digest — identical short of an md5
    collision."""
    from promptner_ray.functions.dedup import (
        BOILER_MIN_DOCS,
        BOILER_MIN_FRAC,
        BOILER_N as N,
    )

    return f"""
        WITH {_boiler_docs_cte()},
        toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS ts FROM bdocs
        ),
        pos AS (
          SELECT doc_id, source, ts,
                 unnest(range(0, greatest(len(ts) - {N} + 1, 0))) AS p
          FROM toks
        ),
        grams AS (
          SELECT doc_id, source, p,
                 array_to_string(ts[p + 1 : p + {N}], ' ') AS g
          FROM pos
        ),
        df AS (
          SELECT source, g, count(DISTINCT doc_id)::BIGINT AS df
          FROM grams GROUP BY source, g
        ),
        tot AS (
          SELECT source, count(*)::BIGINT AS total
          FROM bdocs GROUP BY source
        ),
        hot AS (
          SELECT source, g FROM df JOIN tot USING (source)
          WHERE df >= {BOILER_MIN_DOCS}
            AND df * 1.0 / total >= {BOILER_MIN_FRAC}
        ),
        marked AS (
          SELECT doc_id, p FROM grams
          JOIN hot USING (source, g)
        ),
        brk AS (
          SELECT doc_id, p,
                 CASE WHEN p - lag(p) OVER (
                     PARTITION BY doc_id ORDER BY p) <= {N}
                 THEN 0 ELSE 1 END AS b
          FROM marked
        ),
        grp AS (
          SELECT doc_id, p,
                 sum(coalesce(b, 1)) OVER (
                     PARTITION BY doc_id ORDER BY p) AS gid
          FROM brk
        )
        SELECT doc_id, min(p)::BIGINT AS start_tok,
               (max(p) + {N})::BIGINT AS end_tok
        FROM grp GROUP BY doc_id, gid
    """


def _strip_boilerplate_sql() -> str:
    """DuckDB twin of functions.dedup.strip_boilerplate: anti-join the
    injected docs' token positions against the boilerplate spans, same
    single-space rejoin as the dup-span stripper."""
    return f"""
        WITH spans AS ({_boilerplate_spans_sql()}),
        {_boiler_docs_cte()},
        toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM bdocs
        ),
        tok AS (
          SELECT doc_id, unnest(ts) AS w,
                 generate_subscripts(ts, 1) - 1 AS p
          FROM toks
        ),
        kept AS (
          SELECT t.doc_id, t.w, t.p FROM tok t
          WHERE NOT EXISTS (
            SELECT 1 FROM spans s
            WHERE s.doc_id = t.doc_id
              AND t.p >= s.start_tok AND t.p < s.end_tok)
        )
        SELECT d.doc_id,
               coalesce(string_agg(k.w, ' ' ORDER BY k.p), '') AS text
        FROM toks d LEFT JOIN kept k ON k.doc_id = d.doc_id
        GROUP BY d.doc_id
    """


def _winnow_pairs_sql() -> str:
    """DuckDB twin of functions.dedup.winnow_pairs: self-join the chosen
    fingerprint sets, count shared fingerprints per ordered pair."""
    from promptner_ray.functions.dedup import WINNOW_MIN_SHARED

    return f"""
    WITH {_sql_winnow_chosen()}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*)::BIGINT AS n_shared
    FROM chosen a JOIN chosen b
      ON a.sel = b.sel AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {WINNOW_MIN_SHARED}
    """  # min_shared=40: measured bimodal gap, see dedup.WINNOW_MIN_SHARED


# count/min/max are order-independent, so the range-join aggregate row is
# value-exact against SQL; both physical plans share this one oracle.
_RANGE_JOIN_SQL = """
    SELECT e.event_id, count(o.o_orderdate)::BIGINT AS n_orders,
           min(o.o_orderdate) AS first_order_ts,
           max(o.o_orderdate) AS last_order_ts
    FROM events e LEFT JOIN orders o
      ON o.o_custkey = e.user_id
     AND o.o_orderdate >= e.ts - INTERVAL 7 DAY
     AND o.o_orderdate <= e.ts
    GROUP BY e.event_id
"""


def _f1_counts_sql() -> str:
    """Span-F1 core counts in SQL (shared by the kg_f1_counts oracle
    and the kg_eval_f1 summary oracle)."""
    return f"""
            WITH det AS (SELECT url, sent_id
                         FROM read_parquet('{_EXPORT}/detected/part=*/*.parquet')),
            mrows AS (
              SELECT d.url, d.sent_id, m.mtype AS ty,
                     m.span_start AS s, m.span_end AS e
              FROM (SELECT url, sent_id, unnest(mentions) AS m
                    FROM read_parquet('{_EXPORT}/detected/part=*/*.parquet'))
                   AS d(url, sent_id, m)),
            gpos AS (
              SELECT g.url, g.sent_id, unnest(g.bio) AS tag,
                     generate_subscripts(g.bio, 1) - 1 AS pos
              FROM read_parquet(
                '/tmp/promptner_corpus/{_ORACLE_SF_NAME}/gold/*.parquet') g
              JOIN det ON det.url = g.url AND det.sent_id = g.sent_id),
            nz AS (SELECT *, substr(tag, 3) AS ty FROM gpos
                   WHERE tag != 'O'),
            marked AS (
              SELECT *, CASE WHEN tag LIKE 'B-%' THEN 1
                             WHEN lag(pos) OVER w IS NULL
                               OR lag(pos) OVER w != pos - 1
                               OR lag(ty) OVER w != ty THEN 1
                             ELSE 0 END AS new_span
              FROM nz WINDOW w AS (PARTITION BY url, sent_id ORDER BY pos)),
            tspans AS (
              SELECT url, sent_id, ty, min(pos) AS s, max(pos) + 1 AS e
              FROM (SELECT *, sum(new_span) OVER (
                        PARTITION BY url, sent_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS sid
                    FROM marked)
              GROUP BY url, sent_id, ty, sid),
            tpc AS (
              SELECT t.ty, count(*) AS tp
              FROM tspans t JOIN mrows p
                ON t.url = p.url AND t.sent_id = p.sent_id AND t.ty = p.ty
               AND t.s = p.s AND t.e = p.e
              GROUP BY t.ty),
            ntc AS (SELECT ty, count(*) AS n_truth FROM tspans GROUP BY ty),
            npc AS (SELECT ty, count(*) AS n_pred FROM mrows GROUP BY ty)
            SELECT coalesce(ntc.ty, npc.ty) AS etype,
                   coalesce(tp, 0)::BIGINT AS tp,
                   coalesce(n_pred, 0)::BIGINT AS n_pred,
                   coalesce(n_truth, 0)::BIGINT AS n_truth
            FROM ntc FULL JOIN npc ON ntc.ty = npc.ty
            LEFT JOIN tpc ON coalesce(ntc.ty, npc.ty) = tpc.ty
        """


def _f1_summary_sql() -> str:
    """Micro/macro P/R/F1 over the span-count core — the SQL twin of
    ``pipelines.eval.evaluate_f1``.

    Float-parity care: every expression mirrors the Python operation
    order (left-associative ``(2*p)*r/(p+r)``), and the macro-F1 sum is
    pinned to ascending-type order on BOTH sides (``list_sum(list(f
    ORDER BY etype))`` here, sorted dict in ``evaluate_f1``) so the
    result is bit-identical, not merely close.
    """
    return f"""
        WITH base AS ({_f1_counts_sql()}),
        per AS (
          SELECT etype,
            CASE WHEN n_pred > 0 THEN tp::DOUBLE / n_pred ELSE 0.0 END AS p,
            CASE WHEN n_truth > 0 THEN tp::DOUBLE / n_truth ELSE 0.0 END AS r
          FROM base),
        perf AS (
          SELECT etype,
            CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END AS f
          FROM per),
        tot AS (
          SELECT sum(tp) AS tp, sum(n_pred) AS np, sum(n_truth) AS nt
          FROM base),
        micro AS (
          SELECT
            CASE WHEN np > 0 THEN tp::DOUBLE / np ELSE 0.0 END AS mp,
            CASE WHEN nt > 0 THEN tp::DOUBLE / nt ELSE 0.0 END AS mr
          FROM tot)
        SELECT mp AS micro_precision, mr AS micro_recall,
               CASE WHEN mp + mr > 0 THEN 2 * mp * mr / (mp + mr)
                    ELSE 0.0 END AS micro_f1,
               (SELECT CASE WHEN count(*) > 0
                       THEN list_sum(list(f ORDER BY etype)) / count(*)
                       ELSE 0.0 END FROM perf) AS macro_f1
        FROM micro
    """


def _hashed_tf_sql() -> str:
    from promptner_ray.functions.vectorize import sql_hashed_tf

    return sql_hashed_tf()


def _linear_score_sql() -> str:
    from promptner_ray.functions.vectorize import sql_linear_score

    return sql_linear_score()


def _classifier_train_sql() -> str:
    from promptner_ray.functions.vectorize import (
        sql_train_linear_classifier,
    )

    return sql_train_linear_classifier()


def _classifier_apply_sql() -> str:
    from promptner_ray.functions.vectorize import sql_score_with_trained

    return sql_score_with_trained()


def _gopher_sql() -> str:
    from promptner_ray.functions.textstats import sql_gopher

    return sql_gopher()


def _c4_sql() -> str:
    from promptner_ray.functions.textstats import sql_c4

    return sql_c4()


def _bpe_pairs_sql() -> str:
    from promptner_ray.functions.ngrams import sql_bpe_pairs

    return sql_bpe_pairs()


def _bpe_merges_sql() -> str:
    from promptner_ray.functions.ngrams import BPE_N_MERGES, sql_bpe_merges

    return sql_bpe_merges(BPE_N_MERGES)


def _bpe_encode_sql() -> str:
    from promptner_ray.functions.ngrams import BPE_N_MERGES, sql_bpe_encode

    return sql_bpe_encode(BPE_N_MERGES)


def _cooc_pmi_sql() -> str:
    from promptner_ray.functions.ngrams import sql_cooc_pmi

    return sql_cooc_pmi()


def _chunks_sql() -> str:
    from promptner_ray.functions.packing import sql_chunks

    return sql_chunks()


def _events_funnel_sql() -> str:
    from promptner_ray.functions.relational import sql_events_funnel

    return sql_events_funnel()


def _events_retention_sql() -> str:
    from promptner_ray.functions.relational import sql_events_retention

    return sql_events_retention()


def _events_zscores_sql() -> str:
    from promptner_ray.functions.relational import sql_events_zscores

    return sql_events_zscores()


def _blocklist_sql() -> str:
    from promptner_ray.functions.textstats import sql_blocklist

    return sql_blocklist()


def _doc_domains_sql() -> str:
    from promptner_ray.functions.urls import sql_doc_domains

    return sql_doc_domains()


def _domain_counts_sql() -> str:
    from promptner_ray.functions.urls import sql_domain_counts

    return sql_domain_counts()


def _tfidf_sql() -> str:
    from promptner_ray.functions.vectorize import sql_tfidf

    return sql_tfidf()


def _hll_sql() -> str:
    from promptner_ray.functions.hll import sql_hll_registers

    return sql_hll_registers()


def _domain_cap_sql() -> str:
    from promptner_ray.functions.urls import sql_domain_cap

    return sql_domain_cap()


def _lm_score_sql() -> str:
    from promptner_ray.functions.vectorize import sql_lm_score

    return sql_lm_score()


def _ccnet_buckets_sql() -> str:
    from promptner_ray.functions.vectorize import sql_ccnet_buckets

    return sql_ccnet_buckets()


def _dsir_sql() -> str:
    from promptner_ray.functions.vectorize import sql_dsir_scores

    return sql_dsir_scores()


def _dsir_select_sql() -> str:
    from promptner_ray.functions.vectorize import sql_dsir_select

    return sql_dsir_select()


def _dsir_sample_sql() -> str:
    from promptner_ray.functions.vectorize import sql_dsir_sample

    return sql_dsir_sample()


def _quantize_sql() -> str:
    from promptner_ray.functions.similarity import sql_quantize

    return sql_quantize()


def _mixture_sql() -> str:
    from promptner_ray.functions.sampling import sql_mixture_resample

    return sql_mixture_resample()


def _bloom_sql() -> str:
    from promptner_ray.functions.bloom import sql_bloom_decontam

    return sql_bloom_decontam()


def _pii_redact_sql() -> str:
    from promptner_ray.functions.pii import sql_inject_expr, sql_redact_exprs

    red, counts = sql_redact_exprs("text_pii")
    return f"""
        WITH injected AS (
          SELECT doc_id, {sql_inject_expr("text")} AS text_pii
          FROM documents)
        SELECT doc_id, {red} AS text_pii_redacted, {", ".join(counts)}
        FROM injected
    """


def oracle_sql() -> dict[str, str]:
    # The KG oracle SQL reads exported stage tables; materialize them now
    # (cached) so the SQL side works whichever order the driver runs in.
    try:
        import ray

        if ray.is_initialized():
            _kg_export(f"/root/testdata/{_ORACLE_SF_NAME}")
    except Exception:
        pass  # no Ray session: the export must already exist on disk
    from promptner_ray.functions.similarity import (
        IVF_NPROBE,
        LSH_CONFIDENT,
        LSH_MARGIN_SCALE,
        PAIR_ASSIGN_CELLS,
        SEMDEDUP_THRESHOLD,
        ensure_centroid_export,
        ensure_plane_export,
    )

    from promptner_ray.functions.similarity import ensure_pq_export

    ensure_centroid_export(f"/root/testdata/{_ORACLE_SF_NAME}")
    ensure_plane_export(f"/root/testdata/{_ORACLE_SF_NAME}")
    ensure_ref_triples_export(f"/root/testdata/{_ORACLE_SF_NAME}")
    ensure_pq_export(f"/root/testdata/{_ORACLE_SF_NAME}")
    from promptner_ray.functions.similarity import ensure_adc_export

    ensure_adc_export(f"/root/testdata/{_ORACLE_SF_NAME}", KNN_QUERIES)
    _centroids = (
        f"/tmp/promptner_centroids/{_ORACLE_SF_NAME}/centroids.parquet"
    )
    _planes = f"/tmp/promptner_planes/{_ORACLE_SF_NAME}/planes.parquet"
    from promptner_ray.pipelines.corpus_clean import (
        CURATE_DUP2_MAX,
        CURATE_TOP_TOKEN_MAX as CURATE_TOP_MAX,
    )

    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS())
    big_stop_list = ", ".join(
        "'" + s.replace("'", "''") + "'" for s in sorted(_STOPWORD_SET())
    )
    punct = r"[!-/:-@\[-`{-~]"
    markers = _LANG_MARKERS()
    mk = {
        lang: ", ".join(f"'{m}'" for m in ms) for lang, ms in markers.items()
    }
    shingles = """
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
          FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS g(i)
        )"""
    node_jaccard_sql = f"""
            WITH tr AS (SELECT subj, obj
                        FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
            edg AS (
              SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS subj_id,
                     {_sql_hash64(_sql_norm('obj'))} AS obj_id
              FROM tr),
            und AS (
              SELECT DISTINCT least(subj_id, obj_id) AS a,
                     greatest(subj_id, obj_id) AS b
              FROM edg WHERE subj_id != obj_id),
            deg AS (
              SELECT node, count(*)::BIGINT AS d
              FROM (SELECT a AS node FROM und
                    UNION ALL SELECT b FROM und)
              GROUP BY node),
            adj AS (SELECT a AS p, b AS n FROM und
                    UNION ALL SELECT b, a FROM und),
            cap AS (
              SELECT adj.p, adj.n FROM adj
              JOIN deg ON adj.p = deg.node WHERE deg.d <= 256),
            pairs AS (
              SELECT t1.n AS x, t2.n AS y, count(*)::BIGINT AS common
              FROM cap t1 JOIN cap t2 ON t1.p = t2.p AND t1.n < t2.n
              GROUP BY 1, 2)
            SELECT x AS a, y AS b, common, da.d AS d_a, db.d AS d_b,
                   common::DOUBLE / (da.d + db.d - common)::DOUBLE
                     AS jaccard
            FROM pairs
            JOIN deg da ON x = da.node
            JOIN deg db ON y = db.node
            WHERE common >= 2
        """
    # incremental cross-wave filter: same band buckets as the pairs SQL,
    # keyed by the same int64 md5 digest the engine exchanges on
    minhash_incremental_sql = f"""
            WITH {shingles},
            mh AS (
              SELECT doc_id, i, min(md5(i::VARCHAR || ':' || s)) AS h
              FROM sh, UNNEST(generate_series(0, 11)) AS p(i)
              GROUP BY doc_id, i),
            bands AS (
              SELECT doc_id,
                     {_sql_hash64("(i // 3)::VARCHAR || '|' || "
                                  "string_agg(h, ',' ORDER BY i)")} AS bkey
              FROM mh GROUP BY doc_id, i // 3),
            old AS (SELECT DISTINCT bkey FROM bands WHERE doc_id % 2 = 0),
            hits AS (
              SELECT DISTINCT doc_id FROM bands
              WHERE doc_id % 2 = 1
                AND bkey IN (SELECT bkey FROM old))
            SELECT doc_id FROM documents
            WHERE doc_id % 2 = 1
              AND doc_id NOT IN (SELECT doc_id FROM hits)
        """
    minhash_pairs_sql = f"""
            WITH {shingles},
            mh AS (
              SELECT doc_id, i, min(md5(i::VARCHAR || ':' || s)) AS h
              FROM sh, UNNEST(generate_series(0, 11)) AS p(i)
              GROUP BY doc_id, i),
            bands AS (
              SELECT doc_id, i // 3 AS band,
                     string_agg(h, ',' ORDER BY i) AS sig
              FROM mh GROUP BY doc_id, i // 3)
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.sig = b.sig
                        AND a.doc_id < b.doc_id
        """
    out = {
        "doc_token_stats": (
            "SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_tokens, "
            "length(text)::BIGINT AS n_chars FROM documents"
        ),
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "doc_quality": f"""
            WITH base AS (
              SELECT doc_id,
                len(string_split(text,' '))::BIGINT AS n_tokens,
                length(text)::BIGINT AS n_chars,
                (length(text) - length(regexp_replace(text, '{punct}', '', 'g')))::BIGINT AS n_punct,
                len(list_filter(string_split(text,' '), x -> x IN ({stop_list})))::BIGINT AS n_stop
              FROM documents)
            SELECT doc_id, n_tokens, n_chars, n_punct, n_stop,
              CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END AS punct_ratio,
              CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0.0 END AS stop_ratio,
              (n_tokens >= 5 AND n_tokens <= 5000
               AND (CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END) < 0.3
               AND (CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0.0 END) < 0.5) AS passes
            FROM base
        """,
        # per-(source, lang) curation dashboard: same quality
        # predicates, integer sums divided once (exact both engines)
        "doc_quality_by_source": f"""
            WITH base AS (
              SELECT source, lang,
                len(string_split(text,' '))::BIGINT AS n_tokens,
                length(text)::BIGINT AS n_chars,
                (length(text) - length(regexp_replace(text, '{punct}', '', 'g')))::BIGINT AS n_punct,
                len(list_filter(string_split(text,' '), x -> x IN ({stop_list})))::BIGINT AS n_stop
              FROM documents),
            f AS (
              SELECT source, lang, n_tokens, n_chars, n_punct,
                (n_tokens >= 5 AND n_tokens <= 5000
                 AND (CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END) < 0.3
                 AND (CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0.0 END) < 0.5) AS p
              FROM base)
            SELECT source, lang, count(*)::BIGINT AS n_docs,
              sum(n_tokens)::DOUBLE / count(*)::DOUBLE AS avg_tokens,
              sum(n_punct)::DOUBLE / greatest(sum(n_chars), 1)::DOUBLE
                AS punct_rate,
              sum(CASE WHEN p THEN 1 ELSE 0 END)::DOUBLE
                / count(*)::DOUBLE AS pass_rate
            FROM f GROUP BY source, lang
        """,
        "doc_tokens": (
            "SELECT doc_id, unnest(string_split(text,' ')) AS token "
            "FROM documents"
        ),
        "doc_pii_redact": _pii_redact_sql(),
        "doc_hashed_tf": _hashed_tf_sql(),
        "doc_classifier_score": _linear_score_sql(),
        # the training loop unrolled: per round one σ/error CTE, dim
        # quantized-gradient sums + the loss sum, the identical update
        "doc_classifier_train": _classifier_train_sql(),
        "doc_classifier_apply": _classifier_apply_sql(),
        "doc_blocklist": _blocklist_sql(),
        "doc_gopher": _gopher_sql(),
        "doc_c4": _c4_sql(),
        "doc_domains": _doc_domains_sql(),
        "domain_counts": _domain_counts_sql(),
        "doc_domain_cap": _domain_cap_sql(),
        "doc_tfidf": _tfidf_sql(),
        "doc_lm_score": _lm_score_sql(),
        # per-lang tercile replay: row_number order statistics at the
        # same ⌈n/3⌉ / ⌈2n/3⌉ ranks, identical CASE comparisons
        "doc_ccnet_buckets": _ccnet_buckets_sql(),
        "doc_dsir": _dsir_sql(),
        "doc_dsir_select": _dsir_select_sql(),
        "doc_dsir_sample": _dsir_sample_sql(),
        "doc_distinct_sketch": _hll_sql(),
        "dedup_winnow_pairs": _winnow_pairs_sql(),
        "doc_dup_spans": _dup_spans_sql(),
        "doc_strip_dup_spans": _strip_dup_spans_sql(),
        "doc_boilerplate_spans": _boilerplate_spans_sql(),
        "doc_strip_boilerplate": _strip_boilerplate_sql(),
        "doc_mixture": _mixture_sql(),
        "doc_bloom_decontam": _bloom_sql(),
        "doc_repetition": """
            WITH toks AS (SELECT doc_id, string_split(text,' ') AS t
                          FROM documents),
            tok AS (SELECT doc_id, unnest(t) AS w,
                           generate_subscripts(t, 1) AS i FROM toks),
            tc AS (SELECT doc_id, w, count(*) AS c FROM tok
                   GROUP BY doc_id, w),
            top AS (SELECT doc_id, max(c) AS topc, sum(c) AS n FROM tc
                    GROUP BY doc_id),
            bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS g
                   FROM tok a JOIN tok b
                     ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            bc AS (SELECT doc_id, g, count(*) AS c FROM bg
                   GROUP BY doc_id, g),
            bs AS (SELECT doc_id,
                          sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
                          sum(c) AS n2
                   FROM bc GROUP BY doc_id)
            SELECT t.doc_id, t.n::BIGINT AS n_tokens,
                   t.topc::DOUBLE / t.n AS top_token_frac,
                   COALESCE(b.dup::DOUBLE / b.n2, 0.0) AS dup_2gram_frac
            FROM top t LEFT JOIN bs b USING (doc_id)
        """,
        "doc_bpe_tokens": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{_BPE_RE_SQL()}'))::BIGINT
                     AS n_pretokens
            FROM documents
        """,
        "doc_langid": f"""
            WITH s AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
            sc AS (SELECT doc_id,
              len(list_filter(t, x -> x IN ({mk['en']}))) AS en,
              len(list_filter(t, x -> x IN ({mk['de']}))) AS de,
              len(list_filter(t, x -> x IN ({mk['fr']}))) AS fr,
              len(list_filter(t, x -> x IN ({mk['es']}))) AS es
            FROM s)
            SELECT doc_id,
              CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
                   WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
                   WHEN fr > 0 AND fr >= es THEN 'fr'
                   WHEN es > 0 THEN 'es'
                   ELSE 'und' END AS lang_pred
            FROM sc
        """,
        "lang_counts": (
            "SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang"
        ),
        "doc_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE {_sql_hash_sample_predicate()}
        """,
        "doc_split": _doc_split_sql(),
        # corpus n-gram statistics: same strict 3-token windows as
        # decontamination; occurrences (not per-doc distinct) counted
        "doc_ngram_counts": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents)
            SELECT array_to_string(t[i:i+2], ' ') AS gram,
                   count(*)::BIGINT AS n
            FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS s(i)
            GROUP BY gram
        """,
        "doc_top_ngrams": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents)
            SELECT array_to_string(t[i:i+2], ' ') AS gram,
                   count(*)::BIGINT AS n
            FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS s(i)
            GROUP BY gram
            ORDER BY n DESC, gram ASC
            LIMIT 50
        """,
        # the salted plan is physical-only: the exact GROUP BY is its oracle
        "doc_word_counts": """
            SELECT w AS gram, count(*)::BIGINT AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents)
            GROUP BY w
        """,
        "doc_bpe_pairs": _bpe_pairs_sql(),
        # the full training loop, unrolled: 8 × (pair census →
        # (n DESC, a, b) argmax → recursive-CTE greedy merge rewrite)
        "doc_bpe_merges": _bpe_merges_sql(),
        # the training chain extended through the final rewrite, joined
        # onto per-doc word counts
        "doc_bpe_encode": _bpe_encode_sql(),
        "doc_cooc_pmi": _cooc_pmi_sql(),
        "doc_chunks": _chunks_sql(),
        # deterministic global training-shuffle order: dense zero-based
        # rank under ORDER BY md5(doc_id:seed), doc_id
        "doc_shuffle": """
            SELECT doc_id,
              (row_number() OVER (
                 ORDER BY md5(doc_id::VARCHAR || ':0'), doc_id
               ) - 1)::BIGINT AS pos
            FROM documents
        """,
        # quota sampler: 20 docs per language, deterministic md5 rank
        # (rank string identical to sampling._rank_cut_batch)
        "doc_stratified_sample": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                row_number() OVER (
                  PARTITION BY lang
                  ORDER BY md5(doc_id::VARCHAR || ':0'), doc_id
                ) AS rn
              FROM documents)
            WHERE rn <= 20
        """,
        # packed-stream layout: exclusive cumsum over whitespace token
        # counts in doc_id order, 256-token sequences — pure int
        # arithmetic, so the window-function twin is bit-exact
        "doc_pack": """
            WITH t AS (SELECT doc_id,
                              len(string_split(text, ' '))::BIGINT AS n_tokens
                       FROM documents),
            s AS (SELECT doc_id, n_tokens,
                    coalesce(sum(n_tokens) OVER (
                      ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), 0)::BIGINT AS start
                  FROM t)
            SELECT doc_id, n_tokens, start,
                   start // 256 AS seq_first,
                   (start + n_tokens - 1) // 256 AS seq_last,
                   start % 256 AS seq_offset
            FROM s
        """,
        # benchmark decontamination: strict full word 3-gram windows
        # (docs < 3 tokens contribute nothing — generate_series(1, len-2)
        # is empty), md5-hex digests matching decontam._doc_gram_digests,
        # benchmark slice carved as doc_id % 10 = 7
        "doc_decontam": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+2], ' ')) AS g
              FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS s(i)
            ),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 7),
            train AS (SELECT doc_id, g FROM grams WHERE doc_id % 10 <> 7)
            SELECT t.doc_id, count(*)::BIGINT AS n_hit
            FROM train t JOIN bench b USING (g)
            GROUP BY t.doc_id
        """,
        "doc_decontam_keep": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+2], ' ')) AS g
              FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS s(i)
            ),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 7),
            bad AS (SELECT DISTINCT t.doc_id
                    FROM grams t JOIN bench b USING (g)
                    WHERE t.doc_id % 10 <> 7)
            SELECT doc_id FROM documents
            WHERE doc_id % 10 <> 7 AND doc_id NOT IN (SELECT doc_id FROM bad)
        """,
        # composed cleaning pipeline: quality gates + language ID +
        # exact-dedup keep-first, re-derived independently in SQL
        "doc_clean": f"""
            WITH base AS (
              SELECT doc_id, text, string_split(text, ' ') AS t,
                len(string_split(text, ' '))::BIGINT AS n_tokens,
                length(text)::BIGINT AS n_chars,
                (length(text) - length(
                   regexp_replace(text, '{punct}', '', 'g')))::BIGINT
                  AS n_punct,
                len(list_filter(string_split(text, ' '),
                    x -> x IN ({stop_list})))::BIGINT AS n_stop
              FROM documents),
            sc AS (SELECT doc_id,
              len(list_filter(t, x -> x IN ({mk['en']}))) AS en,
              len(list_filter(t, x -> x IN ({mk['de']}))) AS de,
              len(list_filter(t, x -> x IN ({mk['fr']}))) AS fr,
              len(list_filter(t, x -> x IN ({mk['es']}))) AS es
            FROM base),
            lang AS (SELECT doc_id,
              CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
                   WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
                   WHEN fr > 0 AND fr >= es THEN 'fr'
                   WHEN es > 0 THEN 'es'
                   ELSE 'und' END AS lang_pred
            FROM sc),
            gated AS (
              SELECT b.doc_id, b.n_tokens, l.lang_pred, b.text,
                (b.n_tokens >= 5 AND b.n_tokens <= 5000
                 AND (CASE WHEN b.n_chars > 0
                           THEN b.n_punct::DOUBLE / b.n_chars
                           ELSE 0.0 END) < 0.3
                 AND (CASE WHEN b.n_tokens > 0
                           THEN b.n_stop::DOUBLE / b.n_tokens
                           ELSE 0.0 END) < 0.5) AS passes
              FROM base b JOIN lang l USING (doc_id)),
            keepers AS (
              SELECT md5(text) AS fp, min(doc_id) AS keeper
              FROM documents GROUP BY 1)
            SELECT g.doc_id, g.n_tokens, g.lang_pred
            FROM gated g JOIN keepers k ON md5(g.text) = k.fp
            WHERE g.doc_id = k.keeper AND g.passes AND g.lang_pred = 'en'
        """,
        # full curation recipe: the doc_clean gates + Gopher repetition
        # fractions + MinHash near-dedup restricted to the gated
        # survivors, transitive clusters via the recursive CTE
        "doc_curate": f"""
            WITH RECURSIVE base AS (
              SELECT doc_id, text, string_split(text, ' ') AS t,
                len(string_split(text, ' '))::BIGINT AS n_tokens,
                length(text)::BIGINT AS n_chars,
                (length(text) - length(
                   regexp_replace(text, '{punct}', '', 'g')))::BIGINT
                  AS n_punct,
                len(list_filter(string_split(text, ' '),
                    x -> x IN ({stop_list})))::BIGINT AS n_stop
              FROM documents),
            sc AS (SELECT doc_id,
              len(list_filter(t, x -> x IN ({mk['en']}))) AS en,
              len(list_filter(t, x -> x IN ({mk['de']}))) AS de,
              len(list_filter(t, x -> x IN ({mk['fr']}))) AS fr,
              len(list_filter(t, x -> x IN ({mk['es']}))) AS es
            FROM base),
            lang AS (SELECT doc_id,
              CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
                   WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
                   WHEN fr > 0 AND fr >= es THEN 'fr'
                   WHEN es > 0 THEN 'es'
                   ELSE 'und' END AS lang_pred
            FROM sc),
            gated AS (
              SELECT b.doc_id, b.n_tokens, l.lang_pred, b.text,
                (b.n_tokens >= 5 AND b.n_tokens <= 5000
                 AND (CASE WHEN b.n_chars > 0
                           THEN b.n_punct::DOUBLE / b.n_chars
                           ELSE 0.0 END) < 0.3
                 AND (CASE WHEN b.n_tokens > 0
                           THEN b.n_stop::DOUBLE / b.n_tokens
                           ELSE 0.0 END) < 0.5) AS passes
              FROM base b JOIN lang l USING (doc_id)),
            keepers AS (
              SELECT md5(text) AS fp, min(doc_id) AS keeper
              FROM documents GROUP BY 1),
            rtok AS (SELECT doc_id, unnest(t) AS w,
                            generate_subscripts(t, 1) AS i FROM base),
            rtc AS (SELECT doc_id, w, count(*) AS c FROM rtok
                    GROUP BY doc_id, w),
            rtop AS (SELECT doc_id, max(c) AS topc, sum(c) AS n FROM rtc
                     GROUP BY doc_id),
            rbg AS (SELECT a.doc_id, a.w || ' ' || b.w AS g
                    FROM rtok a JOIN rtok b
                      ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            rbc AS (SELECT doc_id, g, count(*) AS c FROM rbg
                    GROUP BY doc_id, g),
            rbs AS (SELECT doc_id,
                           sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
                           sum(c) AS n2
                    FROM rbc GROUP BY doc_id),
            rep AS (SELECT t.doc_id, t.topc::DOUBLE / t.n AS top_token_frac,
                           COALESCE(b.dup::DOUBLE / b.n2, 0.0)
                             AS dup_2gram_frac
                    FROM rtop t LEFT JOIN rbs b USING (doc_id)),
            surv AS (
              SELECT g.doc_id, g.n_tokens, g.lang_pred,
                     r.top_token_frac, r.dup_2gram_frac
              FROM gated g JOIN keepers k ON md5(g.text) = k.fp
                   JOIN rep r ON r.doc_id = g.doc_id
              WHERE g.doc_id = k.keeper AND g.passes AND g.lang_pred = 'en'
                AND r.top_token_frac < {CURATE_TOP_MAX}
                AND r.dup_2gram_frac < {CURATE_DUP2_MAX}),
            stoks AS (SELECT d.doc_id, string_split(d.text, ' ') AS t
                      FROM documents d JOIN surv s ON s.doc_id = d.doc_id),
            ssh AS (
              SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
              FROM stoks,
                   UNNEST(generate_series(1, greatest(len(t)-2, 1)))
                     AS g2(i)),
            smh AS (SELECT doc_id, i, min(md5(i::VARCHAR || ':' || s)) AS h
                    FROM ssh, UNNEST(generate_series(0, 11)) AS p(i)
                    GROUP BY doc_id, i),
            sbands AS (SELECT doc_id, i // 3 AS band,
                              string_agg(h, ',' ORDER BY i) AS sig
                       FROM smh GROUP BY doc_id, i // 3),
            prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                    FROM sbands a JOIN sbands b
                      ON a.band = b.band AND a.sig = b.sig
                     AND a.doc_id < b.doc_id),
            cedges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
                       UNION SELECT doc_b AS src, doc_a AS dst FROM prs),
            reach AS (SELECT src AS v, src AS u FROM cedges
                      UNION
                      SELECT r.v, e.dst AS u FROM reach r
                      JOIN cedges e ON r.u = e.src),
            comp AS (SELECT v AS doc_id, min(u) AS component FROM reach
                     GROUP BY v)
            SELECT s.doc_id, s.n_tokens, s.lang_pred,
                   s.top_token_frac, s.dup_2gram_frac
            FROM surv s LEFT JOIN comp c ON c.doc_id = s.doc_id
            WHERE c.doc_id IS NULL OR c.component = s.doc_id
        """,
        "dedup_exact": (
            "SELECT md5(text) AS fp, min(doc_id) AS doc_id, "
            "count(*)::BIGINT AS n_dups FROM documents GROUP BY md5(text)"
        ),
        "dedup_jaccard_pairs": f"""
            WITH {shingles},
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ninter
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   ninter::DOUBLE / (sa.n + sb.n - ninter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE ninter::DOUBLE / (sa.n + sb.n - ninter) >= {JACCARD_THRESHOLD}
        """,
        "dedup_minhash_lsh": minhash_pairs_sql,
        "dedup_minhash_incremental": minhash_incremental_sql,
        # cross-wave 3-gram novelty: same shingle convention, same
        # signed-int64 md5 gram digest as the engine's semi-join key
        "doc_novelty": f"""
            WITH {shingles},
            k AS (SELECT doc_id, {_sql_hash64('s')} AS gkey FROM sh),
            old AS (SELECT DISTINCT gkey FROM k WHERE doc_id % 2 = 0),
            nw AS (SELECT doc_id, gkey FROM k WHERE doc_id % 2 = 1),
            tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams
                    FROM nw GROUP BY doc_id),
            seen AS (SELECT doc_id, count(*)::BIGINT AS n_seen
                     FROM nw WHERE gkey IN (SELECT gkey FROM old)
                     GROUP BY doc_id)
            SELECT t.doc_id, t.n_grams,
                   coalesce(s.n_seen, 0)::BIGINT AS n_seen,
                   1.0 - coalesce(s.n_seen, 0)::DOUBLE
                       / t.n_grams::DOUBLE AS novelty
            FROM tot t LEFT JOIN seen s USING (doc_id)
        """,
        # near-dup clusters: min-reachable-id per node via a recursive CTE
        # — the independent ground truth for the engine's iterative
        # label-propagation connected components
        "dedup_components": f"""
            WITH RECURSIVE prs AS ({minhash_pairs_sql}),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM prs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM prs),
            reach AS (
              SELECT src AS v, src AS u FROM edges
              UNION
              SELECT r.v, e.dst AS u FROM reach r JOIN edges e
                ON r.u = e.src)
            SELECT v AS doc_id, min(u)::BIGINT AS component
            FROM reach GROUP BY v
        """,
        # survivors of near-dedup: every doc that is not a non-keeper
        # member of some component
        "dedup_minhash_keep": f"""
            WITH RECURSIVE prs AS ({minhash_pairs_sql}),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM prs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM prs),
            reach AS (
              SELECT src AS v, src AS u FROM edges
              UNION
              SELECT r.v, e.dst AS u FROM reach r JOIN edges e
                ON r.u = e.src),
            comp AS (SELECT v AS doc_id, min(u) AS component
                     FROM reach GROUP BY v)
            SELECT d.doc_id FROM documents d
            LEFT JOIN comp c ON d.doc_id = c.doc_id
            WHERE c.doc_id IS NULL OR c.component = d.doc_id
        """,
        "embed_knn": f"""
            WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < {KNN_QUERIES}),
            scored AS (
              SELECT q.qid, e.vec_id AS nid,
                row_number() OVER (
                  PARTITION BY q.qid
                  ORDER BY list_cosine_similarity(
                    q.qe::DOUBLE[], e.embedding::DOUBLE[]) DESC, e.vec_id
                ) AS rank
              FROM q, embeddings e WHERE e.vec_id != q.qid)
            SELECT qid, nid, rank FROM scored WHERE rank <= {KNN_K}
        """,
        # k-means assignment: argmax cosine against the exported
        # (deterministically trained) centroid table — same first-max
        # tie-break as np.argmax via (sim DESC, cell ASC)
        "embed_cluster": f"""
            SELECT e.vec_id, (
              SELECT c.cell
              FROM read_parquet(
                '/tmp/promptner_centroids/{_ORACLE_SF_NAME}/centroids.parquet') c
              ORDER BY list_cosine_similarity(
                e.embedding::DOUBLE[], c.centroid) DESC, c.cell ASC
              LIMIT 1) AS cell
            FROM embeddings e
        """,
        "embed_cosine_pairs": f"""
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(
                    a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                  >= {COSINE_THRESHOLD}
        """,
        # PQ codes over the exported sub-codebooks: per subspace the
        # argmin-L2 code (dist ASC, code ASC — np.argmin's first-min)
        "embed_pq": _pq_sql(),
        "embed_knn_ivfadc": _ivfadc_sql(_centroids),
        # SemDeDup keep rule over the exported-centroid assignment:
        # drop a vector iff a smaller-id same-cell vector is within the
        # cosine ball — the engine's id-greedy rule as a NOT EXISTS
        "embed_semdedup": f"""
            WITH cent AS (SELECT cell, centroid
                          FROM read_parquet('{_centroids}')),
            assign AS (
              SELECT e.vec_id, e.embedding, (
                SELECT c.cell FROM cent c
                ORDER BY list_cosine_similarity(
                  e.embedding::DOUBLE[], c.centroid) DESC, c.cell ASC
                LIMIT 1) AS cell
              FROM embeddings e)
            SELECT a.vec_id, a.cell, NOT EXISTS (
              SELECT 1 FROM assign b
              WHERE b.cell = a.cell AND b.vec_id < a.vec_id
                AND list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                    >= {SEMDEDUP_THRESHOLD}) AS keep
            FROM assign a
        """,
        # IVF ANN replay over the exported centroid table: cell
        # assignment = argmax cosine (sim DESC, cell ASC — the np.argmax
        # first-max tie-break), probe set = the nprobe best cells per
        # query (stable argsort ≡ row_number over sim DESC, cell ASC),
        # then exact cosine top-k over candidates only — the SQL scans
        # the identical candidate set the engine prunes to
        "embed_knn_ivf": f"""
            WITH cent AS (SELECT cell, centroid
                          FROM read_parquet('{_centroids}')),
            assign AS (
              SELECT e.vec_id, (
                SELECT c.cell FROM cent c
                ORDER BY list_cosine_similarity(
                  e.embedding::DOUBLE[], c.centroid) DESC, c.cell ASC
                LIMIT 1) AS cell
              FROM embeddings e),
            probes AS (
              SELECT qid, cell FROM (
                SELECT e.vec_id AS qid, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_cosine_similarity(
                           e.embedding::DOUBLE[], c.centroid) DESC,
                           c.cell ASC) AS rn
                FROM embeddings e, cent c
                WHERE e.vec_id < {KNN_QUERIES})
              WHERE rn <= {IVF_NPROBE}),
            scored AS (
              SELECT p.qid, e.vec_id AS nid,
                     row_number() OVER (PARTITION BY p.qid
                       ORDER BY list_cosine_similarity(
                         q.embedding::DOUBLE[], e.embedding::DOUBLE[])
                         DESC, e.vec_id) AS rank
              FROM probes p
              JOIN embeddings q ON q.vec_id = p.qid
              JOIN assign a ON a.cell = p.cell
              JOIN embeddings e ON e.vec_id = a.vec_id
              WHERE e.vec_id != p.qid)
            SELECT qid, nid, rank FROM scored WHERE rank <= {KNN_K}
        """,
        # LSH ANN replay over the exported hyperplanes: bucket = the
        # 12-bit sign pattern of plane dot products; query-directed
        # multiprobe — a candidate must match the query's sign on its
        # LSH_CONFIDENT highest-quantized-|margin| planes (margin rank:
        # floor(|dot|·2^20) DESC, plane_id ASC — identical tie-break to
        # the engine) — then exact cosine top-k over the candidates
        "embed_knn_lsh": f"""
            WITH pl AS (SELECT plane_id, plane
                        FROM read_parquet('{_planes}')),
            b AS (
              SELECT e.vec_id,
                     sum(CASE WHEN list_dot_product(
                           e.embedding::DOUBLE[], p.plane) > 0
                         THEN (1::BIGINT << p.plane_id)
                         ELSE 0 END)::BIGINT AS bucket
              FROM embeddings e, pl p GROUP BY e.vec_id),
            qmargin AS (
              SELECT e.vec_id AS qid, p.plane_id,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY floor(abs(list_dot_product(
                         e.embedding::DOUBLE[], p.plane)) * {LSH_MARGIN_SCALE})::BIGINT DESC,
                         p.plane_id ASC) AS rn
              FROM embeddings e, pl p
              WHERE e.vec_id < {KNN_QUERIES}),
            qmask AS (
              SELECT qid,
                     sum(1::BIGINT << plane_id)::BIGINT AS mask
              FROM qmargin WHERE rn <= {LSH_CONFIDENT} GROUP BY qid),
            q AS (
              SELECT e.vec_id AS qid, e.embedding AS qe, b.bucket AS qb,
                     m.mask
              FROM embeddings e
              JOIN b ON e.vec_id = b.vec_id
              JOIN qmask m ON m.qid = e.vec_id
              WHERE e.vec_id < {KNN_QUERIES}),
            scored AS (
              SELECT q.qid, e.vec_id AS nid,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY list_cosine_similarity(
                         q.qe::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                         e.vec_id) AS rank
              FROM q
              JOIN b vb ON (xor(q.qb, vb.bucket) & q.mask) = 0
              JOIN embeddings e ON e.vec_id = vb.vec_id
              WHERE e.vec_id != q.qid)
            SELECT qid, nid, rank FROM scored WHERE rank <= {KNN_K}
        """,
        # IVF-cell self-join near-dup replay: each vector indexed under
        # its top-2 cells (stable argsort ≡ row_number), candidate pairs
        # share ≥1 cell, verification is the exact cosine ≥ threshold —
        # the id pair set is float-robust (no cosine column crosses the
        # comparison)
        "embed_cosine_pairs_ivf": f"""
            WITH cent AS (SELECT cell, centroid
                          FROM read_parquet('{_centroids}')),
            ranked AS (
              SELECT e.vec_id, c.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(
                         e.embedding::DOUBLE[], c.centroid) DESC,
                         c.cell ASC) AS rn
              FROM embeddings e, cent c),
            assign AS (SELECT vec_id, cell FROM ranked
                       WHERE rn <= {PAIR_ASSIGN_CELLS}),
            cand AS (
              SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
              FROM assign a JOIN assign b
                ON a.cell = b.cell AND a.vec_id < b.vec_id)
            SELECT c.vec_a, c.vec_b
            FROM cand c
            JOIN embeddings ea ON ea.vec_id = c.vec_a
            JOIN embeddings eb ON eb.vec_id = c.vec_b
            WHERE list_cosine_similarity(
                    ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])
                  >= {COSINE_THRESHOLD}
        """,
        "multimodal_features": (
            "SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes, "
            "md5(text) AS fp FROM documents"
        ),
        "multimodal_dedup": (
            "SELECT md5(text) AS fp, min(doc_id)::BIGINT AS doc_id, "
            "count(*)::BIGINT AS n_dups FROM documents GROUP BY md5(text)"
        ),
        "lineitem_stats": """
            SELECT l_returnflag, l_linestatus,
                   count(*)::BIGINT AS n_rows,
                   sum(l_quantity)::DOUBLE AS sum_qty,
                   min(l_quantity)::DOUBLE AS min_qty,
                   max(l_quantity)::DOUBLE AS max_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "customer_nation_counts": """
            SELECT n.n_name, count(*)::BIGINT AS n_customers
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        # Q5-shaped rollup; revenue in fixed-point int64 (cents ×
        # (100 − discount%)) summed exactly, divided by 10^4 once —
        # identical double on both engines
        "revenue_by_nation": """
            SELECT n.n_name AS nation,
                   (sum(round(l.l_extendedprice * 100)::BIGINT
                        * (100 - round(l.l_discount * 100)::BIGINT))::DOUBLE
                    / 10000.0) AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "events_tumbling": """
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "events_hopping": """
            SELECT user_id, make_timestamp(s) AS window_start,
                   count(*)::BIGINT AS n_events
            FROM (
              SELECT user_id, epoch_us(ts) AS tus,
                     (epoch_us(ts) // 900000000) * 900000000
                       - j * 900000000 AS s
              FROM events, UNNEST(generate_series(0, 3)) AS g(j))
            WHERE s + 3600000000 > tus
            GROUP BY user_id, make_timestamp(s)
        """,
        "events_asof_orders": """
            SELECT e.event_id, e.user_id, o.o_orderdate AS order_ts
            FROM events e ASOF JOIN orders o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        # the hash-partitioned plan must produce the identical result
        "events_asof_orders_part": """
            SELECT e.event_id, e.user_id, o.o_orderdate AS order_ts
            FROM events e ASOF JOIN orders o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "events_range_orders": _RANGE_JOIN_SQL,
        "events_range_orders_part": _RANGE_JOIN_SQL,
        "events_topk": """
            SELECT user_id, event_id, value, rk FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id) AS rk
              FROM events)
            WHERE rk <= 3
        """,
        "events_quantiles": """
            SELECT event_type, count(*)::BIGINT AS n,
                   quantile_disc(value, 0.25) AS p25,
                   quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.75) AS p75
            FROM events GROUP BY event_type
        """,
        # the sketch's md5 bottom-k sample replayed as a row_number
        # window; estimates match bit for bit because the sample AND the
        # quantile_disc pick rule are both pure functions of the data
        "events_quantile_sketch": _sql_quantile_sketch(),
        # grouped HLL registers recomputed bit-exactly from the same md5
        "events_user_sketch": _sql_grouped_hll(),
        "events_funnel": _events_funnel_sql(),
        "events_retention": _events_retention_sql(),
        "events_zscores": _events_zscores_sql(),
        "events_sessions": """
            WITH marked AS (
              SELECT user_id, ts,
                CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                     OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            numbered AS (
              SELECT user_id, ts,
                sum(new_session) OVER (
                  PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS session_id
              FROM marked
            )
            SELECT user_id, min(ts) AS session_start,
                   count(*)::BIGINT AS n_events
            FROM numbered GROUP BY user_id, session_id
        """,
        # --- simhash (recomputed from documents, fully independent) ----
        "dedup_simhash": f"""
            WITH {_sql_simhash_cte()}
            SELECT doc_id, simhash FROM sh
        """,
        "dedup_simhash_pairs": f"""
            WITH {_sql_simhash_cte()}
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(('0x' || a.simhash)::UBIGINT,
                                 ('0x' || b.simhash)::UBIGINT))::BIGINT
                     AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(('0x' || a.simhash)::UBIGINT,
                                ('0x' || b.simhash)::UBIGINT)) <= 3
        """,
        "doc_winnow": _sql_winnow(),
        "multimodal_decode": """
            SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
                   md5(text) AS fp,
                   (('0x' || substr(md5(text), 1, 4))::INT % 1920 + 1)::INT
                     AS width,
                   (('0x' || substr(md5(text), 5, 4))::INT % 1080 + 1)::INT
                     AS height
            FROM documents
        """,
        # --- KG pipeline oracles over the exported stage tables --------
        # docs_text: extraction must reproduce the corpus text column
        # byte-for-byte — the SQL side never touches html.
        "kg_docs_text": f"""
            SELECT url, warc_ts, lang, text
            FROM read_parquet('{_CORPUS_GLOB}')
        """,
        "kg_sentences": f"""
            WITH d AS (SELECT url, text FROM read_parquet('{_CORPUS_GLOB}')
                       WHERE lang = 'en'),
            s AS (
              SELECT url,
                     unnest(string_split(text, chr(10))) AS text,
                     generate_subscripts(string_split(text, chr(10)), 1) - 1
                       AS sent_id
              FROM d)
            SELECT url, sent_id::INT AS sent_id, text FROM s
            WHERE text != ''
        """,
        # first-occurrence sentence dedup: one survivor per distinct
        # sentence text, the (url, sent_id)-smallest
        "kg_sentence_dedup": f"""
            WITH d AS (SELECT url, text FROM read_parquet('{_CORPUS_GLOB}')
                       WHERE lang = 'en'),
            s AS (
              SELECT url,
                     unnest(string_split(text, chr(10))) AS text,
                     generate_subscripts(string_split(text, chr(10)), 1) - 1
                       AS sent_id
              FROM d)
            SELECT url, sent_id::INT AS sent_id, text FROM s
            WHERE text != ''
            QUALIFY row_number()
                    OVER (PARTITION BY text ORDER BY url, sent_id) = 1
        """,
        "kg_mentions": f"""
            SELECT url, sent_id, m.surface AS mention, m.mtype AS mtype,
                   m.span_start AS span_start, m.span_end AS span_end
            FROM (SELECT url, sent_id, unnest(mentions) AS m
                  FROM read_parquet('{_EXPORT}/detected/part=*/*.parquet'))
        """,
        # fixed-point invariant: a vocabulary-consistent first pass must
        # survive second-pass type verification unchanged (every second
        # opinion agrees, no disputes fire) — so typed mentions must equal
        # the mentions table exactly; any parser/dispute regression in
        # stages/typecheck.py breaks this value check.  The dispute and
        # fallback paths themselves are pinned by unit tests.
        "kg_typed_mentions": f"""
            SELECT url, sent_id, m.surface AS mention, m.mtype AS mtype,
                   m.span_start AS span_start, m.span_end AS span_end
            FROM (SELECT url, sent_id, unnest(mentions) AS m
                  FROM read_parquet('{_EXPORT}/detected/part=*/*.parquet'))
        """,
        # triple induction re-implemented in SQL: consecutive span-ordered
        # mention pairs; pred = first alphabetic non-stopword token (>1
        # char) strictly between the spans, lowercased, else co_occurs_with
        "kg_triples": f"""
            WITH det AS (SELECT url, sent_id, text, mentions
                         FROM read_parquet('{_EXPORT}/detected/part=*/*.parquet')),
            m AS (SELECT url, sent_id, text, unnest(mentions) AS men FROM det),
            ord AS (
              SELECT url, sent_id, text, men.surface, men.mtype,
                     men.span_start, men.span_end,
                     row_number() OVER (PARTITION BY url, sent_id
                                        ORDER BY men.span_start) AS r
              FROM m),
            pairs AS (
              SELECT a.url, a.sent_id, a.text,
                     a.surface AS subj, a.mtype AS subj_type,
                     a.span_end AS ae, b.span_start AS bs,
                     b.surface AS obj, b.mtype AS obj_type
              FROM ord a JOIN ord b
                ON a.url = b.url AND a.sent_id = b.sent_id AND b.r = a.r + 1),
            scored AS (
              SELECT *, list_filter(
                  string_split(text, ' ')[ae + 1 : bs],
                  x -> length(lower(x)) > 1
                       AND regexp_matches(lower(x), '^[[:alpha:]]+$')
                       AND lower(x) NOT IN ({big_stop_list})
                ) AS cands
              FROM pairs)
            SELECT url, sent_id, subj,
                   CASE WHEN len(cands) > 0 THEN lower(cands[1])
                        ELSE 'co_occurs_with' END AS pred,
                   obj, subj_type, obj_type
            FROM scored
        """,
        "kg_links": f"""
            WITH {_sql_links_cte()}
            SELECT surface_norm, surface_hash, entity_id, canonical, etype,
                   n_mentions
            FROM lnk
        """,
        "kg_nodes": f"""
            WITH {_sql_links_cte()}
            SELECT entity_id, canonical, etype, n_mentions FROM lnk
        """,
        "kg_edges": f"""
            WITH {_sql_edges_cte()}
            SELECT subj_id, pred, obj_id, weight, subj_canonical,
                   obj_canonical
            FROM named
        """,
        "kg_top_edges": f"""
            WITH {_sql_edges_cte()}
            SELECT subj_id, pred, obj_id, weight, subj_canonical,
                   obj_canonical
            FROM named
            ORDER BY weight DESC, subj_id, pred, obj_id
            LIMIT 50
        """,
        "kg_degrees": f"""
            WITH {_sql_edges_cte()},
            ends AS (
              SELECT subj_id AS entity_id, 1 AS n_out, 0 AS n_in,
                     weight AS w_out, 0 AS w_in
              FROM named
              UNION ALL
              SELECT obj_id, 0, 1, 0, weight FROM named)
            SELECT entity_id, sum(n_out)::BIGINT AS n_out,
                   sum(n_in)::BIGINT AS n_in,
                   sum(w_out)::BIGINT AS w_out,
                   sum(w_in)::BIGINT AS w_in
            FROM ends GROUP BY entity_id
        """,
        # temporal edges: the triple induction re-derived in SQL over the
        # exported triples, joined to the corpus pages for warc_ts; the
        # Ray side carries epoch-µs int64 end to end, so min/max match
        # exactly
        "kg_edge_times": f"""
            WITH tr AS (SELECT url, subj, pred, obj
                        FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
            pg AS (SELECT url, epoch_us(warc_ts)::BIGINT AS ts
                   FROM read_parquet('{_CORPUS_GLOB}'))
            SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
                   {_sql_hash64(_sql_norm('obj'))} AS obj_id,
                   min(pg.ts) AS first_seen, max(pg.ts) AS last_seen,
                   count(*)::BIGINT AS weight
            FROM tr JOIN pg USING (url)
            GROUP BY 1, 2, 3
        """,
        # per-entity temporal profile: mentions ⋈ page timestamps, the
        # (entity, page) inner group makes n_pages an exact distinct
        "kg_entity_times": f"""
            WITH mm AS (SELECT url, mention
                        FROM read_parquet('{_EXPORT}/mentions/part=*/*.parquet')),
            pg AS (SELECT url, epoch_us(warc_ts)::BIGINT AS ts
                   FROM read_parquet('{_CORPUS_GLOB}')),
            per AS (
              SELECT {_sql_hash64(_sql_norm('mention'))} AS entity_id,
                     mm.url, count(*)::BIGINT AS n, min(pg.ts) AS ts
              FROM mm JOIN pg USING (url)
              GROUP BY 1, 2)
            SELECT entity_id, min(ts) AS first_seen, max(ts) AS last_seen,
                   sum(n)::BIGINT AS n_mentions,
                   count(*)::BIGINT AS n_pages
            FROM per GROUP BY entity_id
        """,
        # DIRT predicate co-occurrence: distinct typed pairs self-joined
        # under the identical hot-pair cap (2..cap distinct preds)
        "kg_pred_cooc": _pred_cooc_sql(),
        # time-travel snapshot: edge_times filtered at the integer
        # midpoint of the corpus crawl-timestamp span
        "kg_edges_asof": f"""
            WITH tr AS (SELECT url, subj, pred, obj
                        FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
            pg AS (SELECT url, epoch_us(warc_ts)::BIGINT AS ts
                   FROM read_parquet('{_CORPUS_GLOB}')),
            cut AS (SELECT (min(ts) + max(ts)) // 2 AS t FROM pg),
            et AS (
              SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
                     {_sql_hash64(_sql_norm('obj'))} AS obj_id,
                     min(pg.ts) AS first_seen,
                     count(*)::BIGINT AS weight
              FROM tr JOIN pg USING (url)
              GROUP BY 1, 2, 3)
            SELECT subj_id, pred, obj_id, first_seen, weight
            FROM et WHERE first_seen <= (SELECT t FROM cut)
        """,
        # PMI: exact int64 products cast to DOUBLE, one division, ln —
        # the identical op sequence the Ray scorer performs with libm
        # math.log, so the doubles hash-match bit for bit
        "kg_pmi": f"""
            WITH tr AS (SELECT subj, pred, obj
                        FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
            edg AS (
              SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
                     {_sql_hash64(_sql_norm('obj'))} AS obj_id,
                     count(*)::BIGINT AS weight
              FROM tr GROUP BY 1, 2, 3),
            ends AS (
              SELECT subj_id AS entity_id, weight AS w_out, 0 AS w_in
              FROM edg
              UNION ALL
              SELECT obj_id, 0, weight FROM edg),
            degs AS (
              SELECT entity_id, sum(w_out)::BIGINT AS w_out,
                     sum(w_in)::BIGINT AS w_in
              FROM ends GROUP BY entity_id),
            tot AS (SELECT sum(weight)::BIGINT AS w FROM edg)
            SELECT e.subj_id, e.pred, e.obj_id, e.weight,
                   ln((e.weight * t.w)::DOUBLE /
                      (s.w_out * o.w_in)::DOUBLE) AS pmi
            FROM edg e
            CROSS JOIN tot t
            JOIN degs s ON e.subj_id = s.entity_id
            JOIN degs o ON e.obj_id = o.entity_id
        """,
        # schema induction: typed-pair distinct counts rolled up per
        # (subj_type, pred, obj_type) signature
        "kg_schema": f"""
            WITH tr AS (SELECT subj, pred, obj, subj_type, obj_type
                        FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
            pairs AS (
              SELECT subj_type, pred, obj_type,
                     {_sql_hash64(_sql_norm('subj'))} AS subj_id,
                     {_sql_hash64(_sql_norm('obj'))} AS obj_id,
                     count(*)::BIGINT AS n
              FROM tr GROUP BY 1, 2, 3, 4, 5)
            SELECT subj_type, pred, obj_type,
                   sum(n)::BIGINT AS n_triples,
                   count(*)::BIGINT AS n_pairs
            FROM pairs GROUP BY 1, 2, 3
        """,
        # consistency gate: integer-threshold replay of the dominant-
        # signature filter (n * DEN >= pred_total)
        "kg_schema_filter": f"""
            WITH tr AS (SELECT url, sent_id, subj, pred, obj, subj_type,
                               obj_type
                        FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
            pat AS (
              SELECT subj_type, pred, obj_type, count(*)::BIGINT AS n
              FROM tr GROUP BY 1, 2, 3),
            tot AS (SELECT pred, sum(n)::BIGINT AS t FROM pat GROUP BY pred)
            SELECT tr.url, tr.sent_id, tr.subj, tr.pred, tr.obj,
                   tr.subj_type, tr.obj_type
            FROM tr
            JOIN pat USING (subj_type, pred, obj_type)
            JOIN tot USING (pred)
            WHERE pat.n * {_SCHEMA_KEEP_DEN()} >= tot.t
        """,
        # 2-hop paths: identical pivot-cap replay, straight self-join
        "kg_paths": f"""
            WITH tr AS (SELECT subj, pred, obj
                        FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
            edg AS (
              SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
                     {_sql_hash64(_sql_norm('obj'))} AS obj_id,
                     count(*)::BIGINT AS weight
              FROM tr GROUP BY 1, 2, 3),
            ends AS (
              SELECT subj_id AS entity_id, 1 AS n_out, 0 AS n_in FROM edg
              UNION ALL
              SELECT obj_id, 0, 1 FROM edg),
            deg AS (
              SELECT entity_id, sum(n_out)::BIGINT AS n_out,
                     sum(n_in)::BIGINT AS n_in
              FROM ends GROUP BY entity_id),
            piv AS (
              SELECT entity_id FROM deg
              WHERE n_in + n_out <= {_PATH_PIVOT_CAP()}
                AND n_in > 0 AND n_out > 0)
            SELECT e1.subj_id AS a, e1.pred AS p1, e1.obj_id AS b,
                   e2.pred AS p2, e2.obj_id AS c,
                   (e1.weight * e2.weight)::BIGINT AS w
            FROM edg e1
            JOIN piv p ON e1.obj_id = p.entity_id
            JOIN edg e2 ON e2.subj_id = p.entity_id
        """,
        # corrupted-tail negatives: HUGEINT replay of the wrapping mix +
        # row_number node ranking + NOT EXISTS anti on true edges
        "kg_negative_samples": _negatives_sql(),
        # per-node triangle counts: the oracle enumerates id-ordered
        # triangles with two straight self-joins — a formulation
        # independent of the engine's degree-ordered orientation, which
        # must count the identical triangle set
        # fixed-point PageRank: integer mass commutes, so the unrolled
        # integer-op replay hash-matches the distributed result exactly
        "kg_pagerank": _pagerank_sql(),
        "kg_ppr": _ppr_sql(),
        "kg_ppr_bsp": _ppr_sql(),
        "embed_quantize": _quantize_sql(),
        # the BSP plan's integer ops are identical, so its oracle is
        # literally the same unrolled replay
        "kg_pagerank_bsp": _pagerank_sql(),
        # k-core peel as a recursive CTE carrying the surviving edge set
        "kg_kcore": _kcore_sql(),
        # k-truss support peel: same recursive-edge-set discipline, the
        # per-round filter is the inlined 3-self-join triangle rollup
        "kg_ktruss": _ktruss_sql(),
        # SCC: mutual-reachability closure (an algorithm independent of
        # the engine's coloring loop) grouped to min-id components
        "kg_scc": f"""
            WITH RECURSIVE tr AS (SELECT subj, obj
                    FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
            edg AS (
              SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS src,
                     {_sql_hash64(_sql_norm('obj'))} AS dst
              FROM tr),
            nodes AS (SELECT DISTINCT node FROM (
              SELECT src AS node FROM edg UNION ALL SELECT dst FROM edg)),
            dedg AS (SELECT src, dst FROM edg WHERE src != dst),
            reach(src, dst) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT r.src, e.dst
              FROM reach r JOIN dedg e ON e.src = r.dst
            )
            SELECT a.dst AS entity_id, min(a.src) AS scc_id
            FROM reach a
            JOIN reach b ON b.src = a.dst AND b.dst = a.src
            GROUP BY a.dst
        """,
        # BFS min-hop from the top hub, shared depth cap
        "kg_reachability": _bfs_sql(),
        "kg_reachability_bsp": _bfs_sql(),
        # deterministic random walks: HUGEINT replay of the int64 mix
        "kg_random_walks": _walks_sql(),
        # skip-gram pairs: the walk replay self-joined within the window
        "kg_walk_pairs": f"""
            SELECT w1.entity_id AS center, w2.entity_id AS context,
                   count(*)::BIGINT AS n
            FROM ({_walks_sql()}) w1
            JOIN ({_walks_sql()}) w2
              ON w1.start_node = w2.start_node
             AND w1.walk_no = w2.walk_no
             AND abs(w1.step - w2.step) BETWEEN 1 AND 2
            GROUP BY 1, 2
        """,
        # Adamic-Adar: pair CTE + inverse-log fixed-point pivot weights
        "kg_adamic_adar": _adamic_adar_sql(),
        # crawl-wave edge diff: wave replay + FULL OUTER JOIN
        "kg_edge_diff": _edge_diff_sql(),
        # edit-distance alias pairs: injection replay + levenshtein scan
        "kg_alias_pairs": _alias_pairs_sql(),
        # alias clusters: the pair SQL closed by reachability (the same
        # recursive-CTE CC replay as kg_entity_merge)
        "kg_alias_clusters": f"""
            WITH RECURSIVE prs AS (
              SELECT entity_a AS a, entity_b AS b
              FROM ({_alias_pairs_sql()})),
            medges AS (
              SELECT a AS src, b AS dst FROM prs
              UNION
              SELECT b AS src, a AS dst FROM prs),
            reach AS (
              SELECT src AS v, src AS u FROM medges
              UNION
              SELECT r.v, e.dst AS u FROM reach r JOIN medges e
                ON r.u = e.src)
            SELECT v AS entity_id, min(u)::BIGINT AS alias_id
            FROM reach GROUP BY v
        """,
        # synchronous label prop: deterministic voting unrolls exactly
        "kg_communities": _labelprop_sql(),
        "kg_modularity": _modularity_sql(),
        "kg_coloring": _mis_coloring_sql(),
        "kg_betweenness": _betweenness_sql(),
        "kg_triangles": f"""
            WITH tr AS (SELECT subj, pred, obj
                        FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
            edg AS (
              SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS subj_id,
                     {_sql_hash64(_sql_norm('obj'))} AS obj_id
              FROM tr),
            und AS (
              SELECT DISTINCT least(subj_id, obj_id) AS a,
                     greatest(subj_id, obj_id) AS b
              FROM edg WHERE subj_id != obj_id),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM und e1
              JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
              JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
            corners AS (
              SELECT x AS entity_id FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
            SELECT entity_id, count(*)::BIGINT AS n_triangles
            FROM corners GROUP BY entity_id
        """,
        # local clustering coefficient: triangle enumeration + degree
        # left-join replayed in SQL; 2.0·T and d·(d−1) are exact int64s,
        # so the single DOUBLE division hash-matches numpy
        "kg_clustering": f"""
            WITH tr AS (SELECT subj, obj
                        FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet')),
            edg AS (
              SELECT DISTINCT {_sql_hash64(_sql_norm('subj'))} AS subj_id,
                     {_sql_hash64(_sql_norm('obj'))} AS obj_id
              FROM tr),
            und AS (
              SELECT DISTINCT least(subj_id, obj_id) AS a,
                     greatest(subj_id, obj_id) AS b
              FROM edg WHERE subj_id != obj_id),
            deg AS (
              SELECT node, count(*)::BIGINT AS d
              FROM (SELECT a AS node FROM und
                    UNION ALL SELECT b FROM und)
              GROUP BY node),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM und e1
              JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
              JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
            corners AS (
              SELECT x AS entity_id FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri),
            tcnt AS (SELECT entity_id, count(*)::BIGINT AS n_triangles
                     FROM corners GROUP BY entity_id)
            SELECT deg.node AS entity_id, deg.d,
                   coalesce(t.n_triangles, 0)::BIGINT AS n_triangles,
                   (2.0 * coalesce(t.n_triangles, 0)) /
                     (deg.d * (deg.d - 1))::DOUBLE AS coefficient
            FROM deg LEFT JOIN tcnt t ON deg.node = t.entity_id
            WHERE deg.d >= 2
        """,
        # neighbor-Jaccard entity-merge candidates: shared-neighbor pair
        # generation with the identical degree-256 pivot cap; the single
        # DOUBLE division on exact int64 operands hash-matches numpy
        "kg_node_jaccard": node_jaccard_sql,
        # structural entity merge: candidates ≥ 0.5 closed into clusters
        # by the recursive min-reachable-id CTE — the independent ground
        # truth for neighbor_jaccard → connected_components composition
        "kg_entity_merge": f"""
            WITH RECURSIVE prs AS (
              SELECT a, b FROM ({node_jaccard_sql})
              WHERE jaccard >= {ENTITY_MERGE_JACCARD}),
            medges AS (
              SELECT a AS src, b AS dst FROM prs
              UNION
              SELECT b AS src, a AS dst FROM prs),
            reach AS (
              SELECT src AS v, src AS u FROM medges
              UNION
              SELECT r.v, e.dst AS u FROM reach r JOIN medges e
                ON r.u = e.src)
            SELECT v AS entity_id, min(u)::BIGINT AS merged_id
            FROM reach GROUP BY v
        """,
        # incremental merge: the oracle is the BATCH edge derivation —
        # wave-split + re-merge must be observationally identical
        "kg_edges_incremental": f"""
            WITH tr AS (SELECT subj, pred, obj
                        FROM read_parquet('{_EXPORT}/triples/part=*/*.parquet'))
            SELECT {_sql_hash64(_sql_norm('subj'))} AS subj_id, pred,
                   {_sql_hash64(_sql_norm('obj'))} AS obj_id,
                   count(*)::BIGINT AS weight
            FROM tr GROUP BY 1, 2, 3
        """,
        # web-graph edges: anchor extraction + href resolution replayed
        # with the identical RE2 pattern over the decoded corpus HTML
        "cc_outlinks": _sql_outlinks(),
        # keep-newest-crawl: the deterministic snapshot expansion (md5
        # multiplicity) + a row_number window over the same rows
        "cc_latest_snapshot": _sql_latest_snapshot(),
        # per-target anchor profile: both ANCHOR_PATTERN groups zipped
        # by subscript, argmax replayed as a row_number window
        "cc_anchor_texts": _sql_anchor_texts(),
        "cc_anchor_link": _sql_anchor_link(),
        # the anchor-dictionary SQL + one normalize/argmax pass joined
        # onto the links chain on the surface string itself
        "kg_grounding": _kg_grounding_sql(),
        "cc_canonical_urls": _sql_canonical_urls(),
        "cc_url_dedup": _sql_url_dedup(),
        # site-section contraction over the same href-resolution CTE
        "cc_section_graph": _sql_section_graph(),
        # HITS: the same fixed-point integer unroll idea as kg_pagerank
        "kg_hits": _hits_sql(),
        "kg_reciprocity": _reciprocity_sql(),
        "kg_assortativity": _assortativity_sql(),
        "kg_bowtie": _bowtie_sql(),
        "kg_hyperball": _hyperball_sql(),
        "kg_effective_diameter": _effective_diameter_sql(),
        "kg_harmonic": _harmonic_sql(),
        # token-level confusion matrix: predicted BIO reconstructed in SQL
        # from mention spans, truth from the corpus gold table
        "kg_confusion": f"""
            WITH det AS (SELECT url, sent_id, text, mentions
                         FROM read_parquet('{_EXPORT}/detected/part=*/*.parquet')),
            tokens AS (
              SELECT url, sent_id,
                     unnest(generate_series(
                       0, len(string_split(text, ' ')) - 1)) AS pos
              FROM det),
            spans AS (
              SELECT url, sent_id, men.mtype, men.span_start, men.span_end
              FROM (SELECT url, sent_id, unnest(mentions) AS men FROM det)),
            pred AS (
              SELECT t.url, t.sent_id, t.pos,
                     coalesce(
                       CASE WHEN contains(s.mtype, '-') THEN s.mtype
                            WHEN t.pos = s.span_start THEN 'B-' || s.mtype
                            ELSE 'I-' || s.mtype END,
                       'O') AS pred_tag
              FROM tokens t LEFT JOIN spans s
                ON t.url = s.url AND t.sent_id = s.sent_id
               AND t.pos >= s.span_start AND t.pos < s.span_end),
            gold AS (
              SELECT url, sent_id, unnest(bio) AS truth_tag,
                     generate_subscripts(bio, 1) - 1 AS pos
              FROM read_parquet(
                '/tmp/promptner_corpus/{_ORACLE_SF_NAME}/gold/*.parquet'))
            SELECT g.truth_tag AS truth, p.pred_tag AS pred,
                   count(*)::BIGINT AS n
            FROM gold g JOIN pred p
              ON g.url = p.url AND g.sent_id = p.sent_id AND g.pos = p.pos
            GROUP BY 1, 2
        """,
        # span-F1 core: truth spans re-derived in SQL from gold BIO tags
        # (islands technique, B-/dangling-I- semantics matching
        # kernels.bio.bio_entities), predicted spans from exported
        # mentions, exact (type, start, end) match counting
        "kg_f1_counts": _f1_counts_sql(),
        "kg_eval_f1": _f1_summary_sql(),
    }
    # BSP execution-plan twins: bit-identical results to their dataflow
    # counterparts (integer min / vote folds commute — pinned by
    # tests/test_graphbsp.py), so one oracle covers both plans, the same
    # pattern as kg_pagerank_bsp / kg_reachability_bsp above.
    # kg_eval: the P/R/F1 arithmetic replayed in SQL — predicted side =
    # the kg_triples SQL replay (full independent re-derivation from the
    # detected export), reference side = the exported single-process
    # oracle counts; multiset tp = Σ min(n_pred, n_ref); identical
    # left-to-right float expressions (2·p·r/(p+r)).
    _refp = f"{REF_TRIPLES_ROOT}/{_ORACLE_SF_NAME}/triples.parquet"
    out["kg_eval"] = f"""
        WITH predt AS MATERIALIZED ({out["kg_triples"]}),
        pc AS (
          SELECT url, sent_id, subj, pred, obj,
                 count(*)::BIGINT AS n_pred
          FROM predt GROUP BY url, sent_id, subj, pred, obj),
        rc AS (SELECT url, sent_id, subj, pred, obj, n_ref
               FROM read_parquet('{_refp}')),
        tpv AS (
          SELECT COALESCE(sum(least(p.n_pred, r.n_ref)), 0)::BIGINT AS tp
          FROM pc p JOIN rc r
            ON p.url = r.url AND p.sent_id = r.sent_id
           AND p.subj = r.subj AND p.pred = r.pred AND p.obj = r.obj),
        tot AS (
          SELECT (SELECT COALESCE(sum(n_pred), 0)::BIGINT FROM pc) AS np,
                 (SELECT COALESCE(sum(n_ref), 0)::BIGINT FROM rc) AS nr),
        pr AS (
          SELECT CASE WHEN tot.np > 0
                      THEN tpv.tp::DOUBLE / tot.np ELSE 0.0 END AS p,
                 CASE WHEN tot.nr > 0
                      THEN tpv.tp::DOUBLE / tot.nr ELSE 0.0 END AS r,
                 tot.np AS np
          FROM tpv, tot)
        SELECT p AS precision, r AS recall,
               CASE WHEN p + r > 0 THEN 2 * p * r / (p + r)
                    ELSE 0.0 END AS f1,
               np AS n_triples
        FROM pr
    """
    # kg_release: the composed release pipeline re-derived end-to-end in
    # one WITH chain (crawl dedup → gates → content dedup → links →
    # schema filter → edges → fixed-point PageRank → harmonic)
    out["kg_release"] = _release_sql()
    out["dedup_components_bsp"] = out["dedup_components"]
    out["kg_communities_bsp"] = out["kg_communities"]
    out["kg_random_walks_bsp"] = out["kg_random_walks"]
    out["kg_kcore_bsp"] = out["kg_kcore"]
    out["kg_hits_bsp"] = out["kg_hits"]
    out["kg_bowtie_bsp"] = out["kg_bowtie"]
    out["kg_hyperball_bsp"] = out["kg_hyperball"]
    out["kg_harmonic_bsp"] = out["kg_harmonic"]
    out["kg_betweenness_bsp"] = out["kg_betweenness"]
    return out


def _STOPWORDS():
    from promptner_ray.functions.textstats import STOPWORDS

    return STOPWORDS


def _LANG_MARKERS():
    from promptner_ray.functions.textstats import LANG_MARKERS

    return LANG_MARKERS


def _STOPWORD_SET():
    from promptner_ray.kernels.stopwords import STOPWORD_SET

    return STOPWORD_SET


def _BPE_RE_SQL():
    from promptner_ray.functions.textstats import BPE_PRETOKEN_RE

    return BPE_PRETOKEN_RE.replace("'", "''")


def _sql_hash_sample_predicate():
    from promptner_ray.functions.sampling import sql_hash_sample_predicate

    return sql_hash_sample_predicate("doc_id::VARCHAR", 0.25, seed=7)


def _doc_split_sql() -> str:
    from promptner_ray.functions.sampling import sql_split_expr

    return (
        f"SELECT doc_id, source, {sql_split_expr('doc_id::VARCHAR')} "
        "AS split FROM documents"
    )
