"""The composed "web-scale KG release" pipeline: raw crawl pages →
annotated knowledge-graph release, every stage an operator this engine
already ships, chained as ONE streaming driver entry point — no
intermediate exports between stages.

    pages ─ canonical-URL + latest-snapshot dedup (one fused exchange)
          ─ HTML→text extraction (byte-identical per url)
          ─ Gopher + C4 quality gates (streaming filter, zero exchange)
          ─ exact content dedup (digest exchange, collision-safe)
          ─ detection → mentions + triples
          ─ ontology/schema filter on the triples
          ─ links/nodes + weighted edges
          ─ PageRank + harmonic-centrality annotations
            (size-thresholded dataflow/BSP plan selection, `graphauto`)
          → nodes(entity_id, canonical, etype, n_mentions, rank,
                  harmonic), edges(subj_id, pred, obj_id, weight)

Plan notes (the per-stage scale arguments live on each operator):

- The crawl-dedup front fuses "keep the newest snapshot" and "keep one
  page per canonical URL form" into ONE `first_occurrence` exchange
  (order key = (−warc_ts, url) per canonical form) — the raw page
  payload crosses the wire once, which is the floor for any
  content-carrying dedup.
- The quality gates run INSIDE the extraction stream (per-batch filter,
  no exchange); gated pages never reach the model stage — the order
  the RefinedWeb/C4 pipelines use, and the main cost saver at scale.
- The detection output feeds BOTH the mention and the triple explode;
  this in-memory composition pins it once (`materialize()`) — the
  gated+deduped working set, strictly smaller than the corpus.  The
  disk-backed `run_release` replaces that pin with the existing waved,
  manifest-committed parquet hand-off (`kg.run_extraction`), which is
  the 100 TB shape: a killed run resumes from the last committed
  partition and the object store never holds a full stage.
"""

from __future__ import annotations

import pathlib

import pyarrow as pa
import pyarrow.compute as pc

from .kg import (
    KGConfig,
    detected,
    docs_text,
    edges,
    links,
    mentions,
    sentences,
    triples,
)


def _canon_dedup(pages):
    """Fused latest-snapshot + canonical-URL dedup: per canonical URL
    form keep the newest capture (ties: smallest raw url), full rows
    through one digest exchange."""
    from ..functions.dedup import first_occurrence
    from ..functions.urls import canonicalize_urls_batch

    def tag(batch: pa.Table) -> pa.Table:
        if "part" in batch.column_names:
            # the corpus shard id collides with hash_partitioned's
            # internal partition key; the release chain re-buckets on
            # write anyway
            batch = batch.drop_columns(["part"])
        canon = canonicalize_urls_batch(
            pa.table({"url": batch.column("url")})
        )
        neg_ts = pc.negate(
            batch.column("warc_ts").combine_chunks().cast(pa.int64())
        )
        return batch.append_column(
            "canonical_url", canon.column("canonical_url")
        ).append_column("neg_ts", neg_ts)

    kept = first_occurrence(
        pages.map_batches(tag, batch_format="pyarrow"),
        "canonical_url",
        ["neg_ts", "url"],
    )
    return kept.drop_columns(["canonical_url", "neg_ts"])


def _quality_gate(docs):
    """Streaming Gopher + C4 page gate over extracted text — both rule
    sets are per-row batch kernels, so the gate is a filter fused into
    the extraction stream (no exchange, no join-back)."""
    from ..functions.textstats import c4_batch, gopher_batch

    def gate(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        proj = pa.table(
            {"doc_id": batch.column("url"), "text": batch.column("text")}
        )
        keep = pc.and_(
            gopher_batch(proj).column("keep").combine_chunks(),
            c4_batch(proj).column("keep").combine_chunks(),
        )
        return batch.filter(keep)

    return docs.map_batches(gate, batch_format="pyarrow")


def release_graph(
    pages,
    cfg: KGConfig | None = None,
    pr_iters: int = 4,
    hb_iters: int = 4,
    p_hb: int = 4,
):
    """pages → {"nodes": annotated node Dataset, "edges": edge Dataset}.

    See the module docstring for the stage chain; annotations run
    through :mod:`..functions.graphauto`, so the iterative ops pick the
    dataflow plan on small graphs and the BSP actor pool at scale
    without caller involvement."""
    from ..functions import graphauto
    from ..functions.dedup import first_occurrence
    from ..functions.kgschema import schema_filter
    from ..shuffle import local_hash_join
    from ..stages.link import links_to_nodes

    cfg = cfg or KGConfig()
    kept_pages = _canon_dedup(pages)
    docs = _quality_gate(docs_text(kept_pages, cfg))
    docs = first_occurrence(docs, "text", ["url"])  # exact content dedup
    det = detected(sentences(docs, cfg), cfg).materialize()

    filtered = schema_filter(triples(det, cfg))
    nodes = links(mentions(det, cfg)).map_batches(
        links_to_nodes, batch_format="pyarrow"
    )
    edge_tbl = edges(filtered).materialize()

    rank = graphauto.pagerank_auto(edge_tbl, iters=pr_iters)
    harm = graphauto.harmonic_auto(edge_tbl, iters=hb_iters, p=p_hb)

    node_schema = pa.schema(
        [
            ("entity_id", pa.int64()),
            ("canonical", pa.string()),
            ("etype", pa.string()),
            ("n_mentions", pa.int64()),
        ]
    )
    with_rank = local_hash_join(
        nodes,
        rank,
        on=["entity_id"],
        left_schema=node_schema,
        right_schema=pa.schema(
            [("entity_id", pa.int64()), ("rank", pa.float64())]
        ),
        how="left_outer",
    )
    annotated = local_hash_join(
        with_rank,
        harm,
        on=["entity_id"],
        left_schema=node_schema.append(pa.field("rank", pa.float64())),
        right_schema=pa.schema(
            [("entity_id", pa.int64()), ("harmonic", pa.float64())]
        ),
        how="left_outer",
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "entity_id" not in t.column_names:
            return pa.table(
                {
                    "entity_id": pa.array([], type=pa.int64()),
                    "canonical": pa.array([], type=pa.string()),
                    "etype": pa.array([], type=pa.string()),
                    "n_mentions": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.float64()),
                    "harmonic": pa.array([], type=pa.float64()),
                }
            )
        # an entity can drop out of the schema-filtered edge graph (or
        # be a node the annotation op never reached): annotate with 0
        return pa.table(
            {
                "entity_id": t.column("entity_id"),
                "canonical": t.column("canonical"),
                "etype": t.column("etype"),
                "n_mentions": t.column("n_mentions"),
                "rank": t.column("rank").combine_chunks().fill_null(0.0),
                "harmonic": t.column("harmonic")
                .combine_chunks()
                .fill_null(0.0),
            }
        )

    return {
        "nodes": annotated.map_batches(finish, batch_format="pyarrow"),
        "edges": edge_tbl,
    }


def run_release(
    corpus_root: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    cfg: KGConfig | None = None,
    pr_iters: int = 4,
    hb_iters: int = 4,
    p_hb: int = 4,
) -> dict:
    """Disk-backed, resumable release: the extraction half runs through
    :func:`..pipelines.kg.run_extraction` (waved, per-partition lineage
    manifests, kill/resume-safe), then the release graph is built from
    the committed stage tables and written as partitioned parquet with
    a release manifest.  Re-running after a kill skips committed
    extraction partitions and rebuilds only the (cheap, graph-sized)
    release tables."""
    from ..functions import graphauto
    from ..functions.dedup import first_occurrence
    from ..functions.kgschema import schema_filter
    from ..pipelines.kg import (
        _add_bucket_batch,
        _read_parts,
        run_extraction,
    )
    from ..shuffle import local_hash_join
    from ..state import lineage
    from ..stages.link import links_to_nodes

    cfg = cfg or KGConfig()
    out = pathlib.Path(out_dir)
    summary = run_extraction(
        corpus_root,
        out,
        cfg,
        pages_transform=_canon_dedup,
        docs_transform=lambda d: first_occurrence(
            _quality_gate(d), "text", ["url"]
        ),
    )

    filtered = schema_filter(triples_from_parts(_read_parts(out / "detected"), cfg))
    nodes = links(mentions_from_parts(_read_parts(out / "detected"), cfg)).map_batches(
        links_to_nodes, batch_format="pyarrow"
    )
    edge_tbl = edges(filtered).materialize()
    rank = graphauto.pagerank_auto(edge_tbl, iters=pr_iters)
    harm = graphauto.harmonic_auto(edge_tbl, iters=hb_iters, p=p_hb)

    node_schema = pa.schema(
        [
            ("entity_id", pa.int64()),
            ("canonical", pa.string()),
            ("etype", pa.string()),
            ("n_mentions", pa.int64()),
        ]
    )
    annotated = local_hash_join(
        local_hash_join(
            nodes,
            rank,
            on=["entity_id"],
            left_schema=node_schema,
            right_schema=pa.schema(
                [("entity_id", pa.int64()), ("rank", pa.float64())]
            ),
            how="left_outer",
        ),
        harm,
        on=["entity_id"],
        left_schema=node_schema.append(pa.field("rank", pa.float64())),
        right_schema=pa.schema(
            [("entity_id", pa.int64()), ("harmonic", pa.float64())]
        ),
        how="left_outer",
    )
    # Ray's write_parquet APPENDS uniquely-named files; a rebuild must
    # start from empty dirs or re-runs double the release tables (same
    # discipline as kg._clear_uncommitted_parts).  The release manifest
    # is retracted FIRST: a kill between the clear and the write must
    # not leave a marker claiming counts for data that is gone.
    import shutil

    stale = lineage.manifest_dir(out) / "release.json"
    if stale.exists():
        stale.unlink()
    for stage in ("release_nodes", "release_edges"):
        d = out / stage
        if d.is_dir():
            shutil.rmtree(d)
    annotated.map_batches(
        _add_bucket_batch,
        fn_kwargs={"id_col": "entity_id"},
        batch_format="pyarrow",
    ).write_parquet(str(out / "release_nodes"), partition_cols=["bucket"])
    edge_tbl.map_batches(
        _add_bucket_batch,
        fn_kwargs={"id_col": "subj_id"},
        batch_format="pyarrow",
    ).write_parquet(str(out / "release_edges"), partition_cols=["bucket"])
    counters = {
        "stage": "release",
        "nodes": lineage.parquet_rows(out / "release_nodes"),
        "edges": lineage.parquet_rows(out / "release_edges"),
    }
    # release-level commit marker next to the per-partition manifests
    # (its name deliberately does not match the part=*.json glob)
    import json
    import time

    mdir = lineage.manifest_dir(out)
    mdir.mkdir(parents=True, exist_ok=True)
    tmp = mdir / ".release.json.tmp"
    tmp.write_text(
        json.dumps({**counters, "committed_at": time.time()}, indent=1)
    )
    tmp.rename(mdir / "release.json")
    return {**summary, **counters}


def triples_from_parts(det_ds, cfg: KGConfig):
    return triples(det_ds, cfg)


def mentions_from_parts(det_ds, cfg: KGConfig):
    return mentions(det_ds, cfg)
