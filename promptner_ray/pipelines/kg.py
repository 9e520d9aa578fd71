"""End-to-end KG construction pipeline: pages → … → nodes/edges parquet.

Dataset-level builders (composable, each ``Dataset -> Dataset``, all lazy and
streaming) plus the checkpointed driver ``run_kg`` that executes them in
partition waves with per-partition lineage manifests (SURVEY.md §3.4, §4.3).

DAG::

    read_parquet(pages part dirs not yet committed)      # prune at the read
      → extract_text (stateless map_batches, drops html)
      → lang gate (vectorized filter)
      → sentence split (flat batch kernel)
      → MentionDetector (actor pool: prompt render → model → parse → align)
      → mentions explode / triple induction (stateless; no regrouping shuffle)
      → write mentions/, triples/ partitioned by part  + manifest per part
    then one global graph job over committed triples/mentions:
      → two-phase groupby canonicalization → links, nodes
      → two-phase groupby edge dedup/weight → edges
      → broadcast-map edge naming → edges_named
"""

from __future__ import annotations

import pathlib
import re
import time
from dataclasses import dataclass, field

import pyarrow as pa

from ..sources.corpus import N_PARTS, read_pages
from ..stages.detect import MentionDetector
from ..stages.extract import (
    extract_text_batch,
    lang_gate_batch,
    split_sentences_batch,
)
from ..stages.induce import explode_mentions_batch, induce_triples_batch
from ..stages.link import (
    EdgeNamer,
    canonicalize_partition,
    links_to_nodes,
    named_edges_join,
    partial_edge_counts,
    partial_edge_url_counts,
    partial_link_counts,
)
from ..state import lineage

_PART_RE = re.compile(r"/part(\d+)/")


def part_from_url(url: str) -> int:
    m = _PART_RE.search(url)
    return int(m.group(1)) if m else 0


def add_part_batch(batch: pa.Table) -> pa.Table:
    # dictionary-encode first: the regex runs once per DISTINCT url, not
    # per row (sentence/mention/triple batches repeat each url many times)
    import pyarrow.compute as pc

    urls = batch.column("url")
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    d = pc.dictionary_encode(urls)
    per_distinct = pa.array(
        [part_from_url(u) for u in d.dictionary.to_pylist()],
        type=pa.int32(),
    )
    parts = pc.take(per_distinct, d.indices)
    if "part" in batch.column_names:
        batch = batch.drop_columns(["part"])
    return batch.append_column("part", parts)


@dataclass
class KGConfig:
    task: str = "conll"
    lang: str = "en"
    model_kind: str = "stub"
    model_kwargs: dict = field(default_factory=dict)
    chat: bool = False
    # "tasks": detection runs as stateless tasks with per-worker-process
    # cached spec/model (right for millisecond-setup clients: workers are
    # reused across executions, nothing to re-create per run).  "actors":
    # dedicated actor pool (right for heavy clients: local LLM, GPU).
    # "auto" picks tasks for the stub, actors otherwise.
    detect_mode: str = "auto"
    detect_concurrency: int | tuple = 8
    detect_batch_size: int = 128
    wave_size: int = 16
    n_parts: int = N_PARTS
    # Pages blocks carry wide html binary payloads; a tighter block-size
    # target keeps batch × concurrency inside worker heaps and lets
    # backpressure (not OOM) absorb memory pressure (SURVEY.md §7.3).
    target_max_block_size_mb: int | None = 64

    def resolved_detect_mode(self) -> str:
        if self.detect_mode != "auto":
            return self.detect_mode
        return "tasks" if self.model_kind == "stub" else "actors"


# ---------------------------------------------------------------------------
# Dataset -> Dataset builders
# ---------------------------------------------------------------------------

def docs_text(pages, cfg: KGConfig):
    return pages.map_batches(extract_text_batch, batch_format="pyarrow")


def sentences(docs, cfg: KGConfig):
    gated = docs.map_batches(
        lang_gate_batch,
        fn_kwargs={"lang": cfg.lang},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return gated.map_batches(split_sentences_batch, batch_format="pyarrow")


def detected(sents, cfg: KGConfig):
    if cfg.resolved_detect_mode() == "tasks":
        import json

        from ..stages.detect import detect_mentions_batch

        return sents.map_batches(
            detect_mentions_batch,
            fn_kwargs={
                "task": cfg.task,
                "model_kind": cfg.model_kind,
                "chat": cfg.chat,
                "model_kwargs_json": json.dumps(
                    cfg.model_kwargs, sort_keys=True
                ),
            },
            batch_format="pyarrow",
            batch_size=cfg.detect_batch_size,
        )
    return sents.map_batches(
        MentionDetector,
        fn_constructor_kwargs={
            "task": cfg.task,
            "model_kind": cfg.model_kind,
            "model_kwargs": cfg.model_kwargs,
            "chat": cfg.chat,
        },
        batch_format="pyarrow",
        batch_size=cfg.detect_batch_size,
        concurrency=cfg.detect_concurrency,
    )


def mentions(det, cfg: KGConfig):
    return det.map_batches(explode_mentions_batch, batch_format="pyarrow")


def triples(det, cfg: KGConfig):
    return det.map_batches(induce_triples_batch, batch_format="pyarrow")


def links(mentions_ds):
    """Canonicalization: ONE int64-hash-partitioned exchange, all C++.

    ``partial_link_counts`` collapses each block to per-(hash, surface,
    mtype) counts (map-side combine: hot surfaces move as one partial row
    per block, never raw mentions); the exchange partitions on the int64
    ``surface_hash``; ``canonicalize_partition`` then resolves EVERY
    entity of a partition with vectorized grouped sums + lexicographic
    argmax — no per-entity Python, no string shuffle key.
    """
    from ..shuffle import hash_partitioned

    partials = mentions_ds.map_batches(
        partial_link_counts, batch_format="pyarrow"
    )
    return hash_partitioned(
        partials, ["surface_hash"], canonicalize_partition
    )


def edges(triples_ds, num_partitions: int | None = None):
    """Two-level edge dedup/weighting: vectorized map-side combine per
    block, then a hash-partitioned Arrow grouped Sum
    (``shuffle.hash_grouped`` — edge keys are high-cardinality, so the
    per-block C++ combine replaces Ray's row-iterating aggregate).  The
    all-to-all exchange only ever moves (near-)distinct edge rows."""
    from ..shuffle import hash_grouped

    partials = triples_ds.map_batches(
        partial_edge_counts, batch_format="pyarrow"
    )
    return hash_grouped(
        partials,
        ["subj_id", "pred", "obj_id"],
        [("w", "sum")],
        rename={"w_sum": "weight"},
        # partition on the numeric endpoints only — a function of the
        # group key, which is all correctness needs
        hash_cols=["subj_id", "obj_id"],
        num_partitions=num_partitions,
    )


def page_times(pages_ds):
    """pages → (url_key, ts): per-page crawl timestamp keyed by the int64
    url digest (epoch microseconds) — the narrow side of the temporal-edge
    join.  The url STRING never keys an exchange."""
    from ..kernels.cleaning import surface_hash64

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = batch.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        d = pc.dictionary_encode(urls)
        per_distinct = pa.array(
            [surface_hash64(u) for u in d.dictionary.to_pylist()],
            type=pa.int64(),
        )
        keys = pc.take(per_distinct, d.indices)
        return pa.table(
            {
                "url_key": keys,
                "ts": batch.column("warc_ts")
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
            }
        )

    return pages_ds.select_columns(["url", "warc_ts"]).map_batches(
        fn, batch_format="pyarrow"
    )


# Page-timestamp tables up to this many rows broadcast as two sorted
# int64 arrays (16 B/page → ≤ 64 MB in the object store); larger crawls
# take the distributed join path.
PAGE_TS_BROADCAST_MAX = 4_000_000


def _with_page_ts(partials, pages_ds, left_schema, num_partitions):
    """Attach ``ts`` to url_key-carrying partial rows.

    Size-thresholded switch (the edge-naming idiom): under
    ``PAGE_TS_BROADCAST_MAX`` pages the (url_key, ts) table broadcasts
    once as two sorted arrays and each batch does a vectorized
    searchsorted — no exchange at all (the url_key-keyed
    ``local_hash_join`` moved every partial row through a sort exchange
    and dominated the temporal ops at bench scale: 17.7 s of
    entity_times' 24 s for 786k pages / 4.7M partials).  Crawls over the
    threshold fall back to that distributed join.
    """
    import numpy as np

    from ..shuffle import local_hash_join

    if pages_ds.count() <= PAGE_TS_BROADCAST_MAX:
        import ray

        pt = page_times(pages_ds).to_pandas()
        order = np.argsort(pt["url_key"].to_numpy())
        keys_ref = ray.put(pt["url_key"].to_numpy()[order])
        ts_ref = ray.put(pt["ts"].to_numpy()[order])

        def add_ts(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return batch.append_column(
                    "ts", pa.array([], type=pa.int64())
                )
            keys = ray.get(keys_ref)
            ts = ray.get(ts_ref)
            uk = batch.column("url_key").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(keys, uk)
            idx[idx >= len(keys)] = 0
            hit = keys[idx] == uk  # inner-join semantics on misses
            out = batch.append_column(
                "ts", pa.array(ts[idx], type=pa.int64())
            )
            return out if hit.all() else out.filter(pa.array(hit))

        return partials.map_batches(add_ts, batch_format="pyarrow")

    return local_hash_join(
        partials,
        page_times(pages_ds),
        on=["url_key"],
        left_schema=left_schema,
        right_schema=pa.schema(
            [("url_key", pa.int64()), ("ts", pa.int64())]
        ),
        how="inner",
        num_partitions=num_partitions,
    )


def edge_times(triples_ds, pages_ds, num_partitions: int | None = None):
    """Temporal edge attributes: (subj_id, pred, obj_id, first_seen,
    last_seen, weight) — the crawl-time span over which the corpus
    asserts each edge (``warc_ts`` of the earliest and latest page whose
    text yields the triple).  The temporal-KG face of the input table's
    timestamp column.

    Plan: map-side combine of triples to per-(page, edge) counts
    (:func:`~..stages.link.partial_edge_url_counts` — a page re-asserting
    an edge many times leaves the block as one row), the size-switched
    page-timestamp attach (:func:`_with_page_ts`: broadcast lookup under
    the threshold, url-digest join above it), then a hash-partitioned
    grouped Min/Max/Sum on the edge key.  Timestamps stay int64 epoch-µs
    end to end.
    """
    from ..shuffle import hash_grouped, local_hash_join, sized_partitions

    if num_partitions is None:
        # triples arrive from a cached stage export (metadata count)
        num_partitions = sized_partitions(triples_ds.count(), None)
    partials = triples_ds.map_batches(
        partial_edge_url_counts, batch_format="pyarrow"
    )
    joined = _with_page_ts(
        partials,
        pages_ds,
        pa.schema(
            [
                ("url_key", pa.int64()),
                ("subj_id", pa.int64()),
                ("pred", pa.string()),
                ("obj_id", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
        num_partitions,
    )
    return hash_grouped(
        joined,
        ["subj_id", "pred", "obj_id"],
        [("ts", "min"), ("ts", "max"), ("n", "sum")],
        rename={
            "ts_min": "first_seen",
            "ts_max": "last_seen",
            "n_sum": "weight",
        },
        hash_cols=["subj_id", "obj_id"],
        num_partitions=num_partitions,
    )


def entity_times(mentions_ds, pages_ds, num_partitions: int | None = None):
    """Per-entity temporal profile: (entity_id, first_seen, last_seen,
    n_mentions, n_pages) — when the crawl first/last asserted each
    entity and how broadly (distinct pages) it is attested.  The
    entity-level companion of :func:`edge_times`; feeds staleness
    scoring and crawl-diff triage.

    Plan: map-side combine of mentions to per-(page, entity) counts,
    the size-switched page-timestamp attach (:func:`_with_page_ts`),
    then TWO grouped exchanges — (entity, page) first so ``n_pages`` is
    an exact distinct-page count, entity rollup second.  Timestamps
    stay int64 epoch-µs end to end.
    """
    import pyarrow.compute as pc

    from ..kernels.cleaning import surface_hash64
    from ..shuffle import hash_grouped, sized_partitions
    from ..stages.link import _hash_ids

    if num_partitions is None:
        num_partitions = sized_partitions(mentions_ds.count(), None)

    def partials(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "url_key": pa.array([], type=pa.int64()),
                    "entity_id": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        urls = batch.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        d = pc.dictionary_encode(urls)
        keys = pa.array(
            [surface_hash64(u) for u in d.dictionary.to_pylist()],
            type=pa.int64(),
        )
        tbl = pa.table(
            {
                "url_key": pc.take(keys, d.indices),
                "entity_id": _hash_ids(batch.column("mention")),
            }
        )
        out = tbl.group_by(["url_key", "entity_id"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "url_key": out.column("url_key"),
                "entity_id": out.column("entity_id"),
                "n": out.column("count_all").cast(pa.int64()),
            }
        )

    joined = _with_page_ts(
        mentions_ds.map_batches(partials, batch_format="pyarrow"),
        pages_ds,
        pa.schema(
            [
                ("url_key", pa.int64()),
                ("entity_id", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
        num_partitions,
    )
    per_page = hash_grouped(
        joined,
        ["entity_id", "url_key"],
        [("n", "sum"), ("ts", "min")],
        rename={"n_sum": "n", "ts_min": "ts"},
        num_partitions=num_partitions,
    )
    return hash_grouped(
        per_page,
        ["entity_id"],
        [("ts", "min"), ("ts", "max"), ("n", "sum"), ([], "count_all")],
        rename={
            "ts_min": "first_seen",
            "ts_max": "last_seen",
            "n_sum": "n_mentions",
            "count_all": "n_pages",
        },
        num_partitions=num_partitions,
    )


def merge_edge_tables(*edge_tables, num_partitions: int | None = None):
    """Incremental-crawl merge: edge tables built from separately
    processed waves (monthly Common-Crawl segments, incremental
    re-crawls) re-aggregate into the single global table.

    Edge weights are counts — associative and commutative under sum — so
    waves may be merged in any order and grouping and the result is
    EXACTLY the single-batch table (the oracle for the incremental query
    is the plain batch SQL).  One union + one hash-partitioned grouped
    Sum; each wave's table is already per-wave-distinct, so the exchange
    moves at most |waves| rows per distinct edge.
    """
    from ..shuffle import hash_grouped

    ds = edge_tables[0]
    for other in edge_tables[1:]:
        ds = ds.union(other)
    return hash_grouped(
        ds,
        ["subj_id", "pred", "obj_id"],
        [("weight", "sum")],
        rename={"weight_sum": "weight"},
        hash_cols=["subj_id", "obj_id"],
        num_partitions=num_partitions,
    )


def edge_diff(old_edges, new_edges, num_partitions: int | None = None):
    """Between-crawl edge diff — (subj_id, pred, obj_id, w_old, w_new,
    delta) for every edge whose weight CHANGED between two waves (new
    edges: w_old = 0; vanished edges: w_new = 0; unchanged edges are
    dropped).  The incremental-maintenance companion of
    :func:`merge_edge_tables`: what a re-crawl actually changed, the
    input for cache invalidation and downstream re-scoring.

    Plan: both sides key on (subj_id, pred-digest, obj_id) — the string
    predicate never keys an exchange — through two padded left-outer
    ``local_hash_join`` passes (new⟕old for new/changed rows, old⟕new
    filtered to misses for vanished rows).  Edge tables are already
    distinct per wave, so each join moves ≤ one row per edge per side.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..kernels.cleaning import surface_hash64
    from ..shuffle import local_hash_join

    def prep(t: pa.Table) -> pa.Table:
        preds = t.column("pred")
        if isinstance(preds, pa.ChunkedArray):
            preds = preds.combine_chunks()
        d = pc.dictionary_encode(preds)
        pk = pa.array(
            [surface_hash64(p) for p in d.dictionary.to_pylist()],
            type=pa.int64(),
        )
        return pa.table(
            {
                "subj_id": t.column("subj_id").cast(pa.int64()),
                "pk": pc.take(pk, d.indices),
                "obj_id": t.column("obj_id").cast(pa.int64()),
                "pred": preds,
                "w": t.column("weight").cast(pa.int64()),
            }
        )

    keys = ["subj_id", "pk", "obj_id"]
    full = pa.schema(
        [
            ("subj_id", pa.int64()),
            ("pk", pa.int64()),
            ("obj_id", pa.int64()),
            ("pred", pa.string()),
            ("w", pa.int64()),
        ]
    )
    slim = pa.schema(
        [
            ("subj_id", pa.int64()),
            ("pk", pa.int64()),
            ("obj_id", pa.int64()),
            ("w2", pa.int64()),
        ]
    )
    old_p = old_edges.map_batches(prep, batch_format="pyarrow")
    new_p = new_edges.map_batches(prep, batch_format="pyarrow")

    def slim_of(ds):
        return ds.map_batches(
            lambda t: pa.table(
                {
                    "subj_id": t.column("subj_id"),
                    "pk": t.column("pk"),
                    "obj_id": t.column("obj_id"),
                    "w2": t.column("w"),
                }
            ),
            batch_format="pyarrow",
        )

    changed = local_hash_join(
        new_p,
        slim_of(old_p),
        on=keys,
        left_schema=full,
        right_schema=slim,
        how="left_outer",
        num_partitions=num_partitions,
    )
    vanished = local_hash_join(
        old_p,
        slim_of(new_p),
        on=keys,
        left_schema=full,
        right_schema=slim,
        how="left_outer",
        num_partitions=num_partitions,
    )

    def finish(new_side: bool):
        def fn(t: pa.Table) -> pa.Table:
            w = t.column("w").to_numpy(zero_copy_only=False)
            other = (
                t.column("w2").fill_null(-1).to_numpy(zero_copy_only=False)
            )
            if new_side:
                w_new, w_old = w, np.maximum(other, 0)
                keep = w_new != w_old
            else:
                # old side contributes ONLY edges absent from the new
                # wave (present-on-both rows were handled by the new
                # side — emitting them here would double-count)
                keep = other == -1
                w_old, w_new = w, np.zeros(len(w), dtype=np.int64)
            return pa.table(
                {
                    "subj_id": pa.array(
                        t.column("subj_id").to_numpy(zero_copy_only=False)[
                            keep
                        ],
                        type=pa.int64(),
                    ),
                    "pred": t.column("pred").filter(pa.array(keep)),
                    "obj_id": pa.array(
                        t.column("obj_id").to_numpy(zero_copy_only=False)[
                            keep
                        ],
                        type=pa.int64(),
                    ),
                    "w_old": pa.array(w_old[keep], type=pa.int64()),
                    "w_new": pa.array(w_new[keep], type=pa.int64()),
                    "delta": pa.array(
                        (w_new - w_old)[keep], type=pa.int64()
                    ),
                }
            )

        return fn

    return changed.map_batches(
        finish(True), batch_format="pyarrow"
    ).union(vanished.map_batches(finish(False), batch_format="pyarrow"))


def named_edges(edges_ds, nodes_by_id_ref):
    return edges_ds.map_batches(
        EdgeNamer,
        fn_constructor_kwargs={"names_ref": nodes_by_id_ref},
        batch_format="pyarrow",
        concurrency=2,
    )


# ---------------------------------------------------------------------------
# Checkpointed driver
# ---------------------------------------------------------------------------

def run_extraction(
    corpus_root: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    cfg: KGConfig | None = None,
    max_waves: int | None = None,
    pages_transform=None,
    docs_transform=None,
) -> dict:
    """Waved, resumable extraction: pages → mentions/ + triples/ (+manifests).

    Each wave covers ``cfg.wave_size`` uncommitted partitions in ONE streaming
    Dataset job; manifests commit per partition after the wave's parquet is on
    disk.  ``max_waves`` bounds the run (used by the kill/resume test).

    ``pages_transform`` / ``docs_transform`` are optional Dataset→Dataset
    hooks applied to the raw pages / the extracted docs of each wave —
    the seam the release pipeline (:mod:`.release`) uses to fuse crawl
    dedup and quality gates into the extraction stream.  NOTE their
    scope is PER WAVE: a dedup transform sees one wave's partitions, so
    cross-wave duplicates survive here (the corpus partitioner buckets
    by url hash, so same-url snapshots co-locate; canonical-FORM
    collisions across buckets do not).  The single-job
    ``release.release_graph`` runs the same dedup as one global
    exchange."""
    cfg = cfg or KGConfig()
    if cfg.target_max_block_size_mb:
        from ray.data.context import DataContext

        DataContext.get_current().target_max_block_size = (
            cfg.target_max_block_size_mb * 1024 * 1024
        )
    if not (pathlib.Path(corpus_root) / "pages").is_dir():
        raise FileNotFoundError(
            f"no pages table under {corpus_root!s} (expected <root>/pages/part=*)"
        )
    out = pathlib.Path(out_dir)
    done = lineage.committed_parts(out)
    all_parts = set(range(cfg.n_parts))
    todo = sorted(all_parts - done)
    waves = [
        todo[i : i + cfg.wave_size] for i in range(0, len(todo), cfg.wave_size)
    ]
    if max_waves is not None:
        waves = waves[:max_waves]
    summary = {"parts_done_before": len(done), "waves": 0, "parts_committed": 0}
    for wave in waves:
        t0 = time.monotonic()
        # A kill mid-wave leaves orphan parquet under uncommitted part dirs
        # (the manifest is the commit marker; Ray's write_parquet APPENDS
        # uniquely-named files and never deletes).  Clear every uncommitted
        # part dir in this wave before reprocessing so resume can't
        # double-count rows.
        _clear_uncommitted_parts(out, wave)
        skip = all_parts - set(wave)
        pages = read_pages(
            corpus_root,
            exclude_parts=skip,
            # prune the oracle `text` column at the read: html alone feeds
            # extraction, and text duplicates its payload through the
            # object store
            columns=["url", "warc_ts", "html", "lang"],
        )
        if pages is None:
            # No input files for any partition of this wave: the partitions
            # are trivially complete — commit empty manifests so resume
            # never re-scans them.
            for part in wave:
                lineage.write_manifest(
                    out,
                    part,
                    {
                        "stage": "extraction",
                        "docs_in": 0,
                        "sentences": 0,
                        "mentions": 0,
                        "triples": 0,
                        "wall_s_wave": 0.0,
                    },
                )
                summary["parts_committed"] += 1
            summary["waves"] += 1
            continue
        if pages_transform is not None:
            pages = pages_transform(pages)
        docs = docs_text(pages, cfg)
        if docs_transform is not None:
            docs = docs_transform(docs)
        det = detected(sentences(docs, cfg), cfg).map_batches(
            add_part_batch, batch_format="pyarrow"
        )
        # One pass over the wave: sentence-level rows are written, then the
        # cheap mention/triple explosions read them back (disk-backed reuse
        # beats recomputing the model stage twice).
        det_dir = out / "detected"
        det.write_parquet(str(det_dir), partition_cols=["part"])
        det_on_disk = _read_parts(det_dir, wave)
        mentions(det_on_disk, cfg).map_batches(
            add_part_batch, batch_format="pyarrow"
        ).write_parquet(str(out / "mentions"), partition_cols=["part"])
        triples(_read_parts(det_dir, wave), cfg).map_batches(
            add_part_batch, batch_format="pyarrow"
        ).write_parquet(str(out / "triples"), partition_cols=["part"])
        wall = time.monotonic() - t0
        for part in wave:
            counters = {
                "stage": "extraction",
                "docs_in": lineage.parquet_rows(
                    pathlib.Path(corpus_root) / "pages" / f"part={part}"
                ),
                "sentences": lineage.parquet_rows(det_dir / f"part={part}"),
                "mentions": lineage.parquet_rows(
                    out / "mentions" / f"part={part}"
                ),
                "triples": lineage.parquet_rows(
                    out / "triples" / f"part={part}"
                ),
                "wall_s_wave": wall,
            }
            lineage.write_manifest(out, part, counters)
            summary["parts_committed"] += 1
        summary["waves"] += 1
    return summary


def _clear_uncommitted_parts(out: pathlib.Path, parts: list[int]) -> None:
    import shutil

    for stage in ("detected", "mentions", "triples"):
        for part in parts:
            d = out / stage / f"part={part}"
            if d.is_dir():
                shutil.rmtree(d)


def _read_parts(root: pathlib.Path, parts: list[int] | None = None):
    import ray

    dirs = sorted(pathlib.Path(root).glob("part=*"))
    if parts is not None:
        keep = {int(d.name.split("=", 1)[1]) for d in dirs} & set(parts)
        dirs = [d for d in dirs if int(d.name.split("=", 1)[1]) in keep]
    files = [str(f) for d in dirs for f in sorted(d.rglob("*.parquet"))]
    return ray.data.read_parquet(files)


N_GRAPH_BUCKETS = 16


def _add_bucket_batch(batch: pa.Table, id_col: str) -> pa.Table:
    """Stable id-hash bucket column: the graph tables' output-partition key
    (no giant single files; a failed/re-run graph job can skip or diff
    buckets, and downstream readers can prune by entity range)."""
    import numpy as np

    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    bucket = (ids % N_GRAPH_BUCKETS + N_GRAPH_BUCKETS) % N_GRAPH_BUCKETS
    if "bucket" in batch.column_names:
        batch = batch.drop_columns(["bucket"])
    return batch.append_column(
        "bucket", pa.array(bucket.astype("int32"), type=pa.int32())
    )


# Above this many node rows the id→canonical dict stops being "small side":
# edge naming switches from broadcast map to a hash-shuffle join.  ~10M rows
# ≈ a few hundred MB of dict on every worker — the sensible single-node
# ceiling; multi-node deployments should size it to worker heap.
BROADCAST_NODES_MAX_ROWS = 10_000_000


def run_graph(
    out_dir: str | pathlib.Path,
    broadcast_nodes_max_rows: int = BROADCAST_NODES_MAX_ROWS,
) -> dict:
    """Global graph job over all committed partitions: links/nodes/edges.

    Edge naming is size-thresholded: nodes tables up to
    ``broadcast_nodes_max_rows`` are broadcast (``ray.put`` once, dict
    lookup per batch); larger ones go through the hash-shuffle
    :func:`named_edges_join` so no worker ever holds the whole table.
    """
    import ray

    out = pathlib.Path(out_dir)
    links_ds = links(_read_parts(out / "mentions"))
    links_ds.map_batches(
        _add_bucket_batch, fn_kwargs={"id_col": "entity_id"},
        batch_format="pyarrow",
    ).write_parquet(str(out / "links"), partition_cols=["bucket"])
    nodes_ds = _read_parts_flat(out / "links").map_batches(
        links_to_nodes, batch_format="pyarrow"
    )
    nodes_ds.map_batches(
        _add_bucket_batch, fn_kwargs={"id_col": "entity_id"},
        batch_format="pyarrow",
    ).write_parquet(str(out / "nodes"), partition_cols=["bucket"])

    edges_ds = edges(_read_parts(out / "triples"))
    edges_ds.write_parquet(str(out / "edges_raw"))

    n_nodes = lineage.parquet_rows(out / "nodes")  # footer-only count
    if n_nodes <= broadcast_nodes_max_rows:
        nodes_df = (
            _read_parts_flat(out / "nodes")
            .select_columns(["entity_id", "canonical"])
            .to_pandas()  # under the broadcast threshold by the check above
        )
        names = dict(zip(nodes_df["entity_id"], nodes_df["canonical"]))
        names_ref = ray.put(names)
        named = named_edges(_read_parts_flat(out / "edges_raw"), names_ref)
    else:
        named = named_edges_join(
            _read_parts_flat(out / "edges_raw"),
            _read_parts_flat(out / "nodes"),
        )
    named.map_batches(
        _add_bucket_batch, fn_kwargs={"id_col": "subj_id"},
        batch_format="pyarrow",
    ).write_parquet(str(out / "edges"), partition_cols=["bucket"])
    return {
        "links": lineage.parquet_rows(out / "links"),
        "nodes": lineage.parquet_rows(out / "nodes"),
        "edges": lineage.parquet_rows(out / "edges"),
        "edge_naming": "broadcast" if n_nodes <= broadcast_nodes_max_rows else "join",
    }


def _read_parts_flat(root: pathlib.Path):
    import ray

    return ray.data.read_parquet(str(root))


def run_kg(
    corpus_root: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    cfg: KGConfig | None = None,
) -> dict:
    s1 = run_extraction(corpus_root, out_dir, cfg)
    s2 = run_graph(out_dir)
    return {**s1, **s2}
