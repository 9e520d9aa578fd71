"""Materialized KG-table export: the SQL-oracle input surface.

``ensure_kg_export`` runs the checkpointed KG pipeline ONCE per
scale-factor directory and leaves its stage tables (``detected``,
``mentions``, ``triples``, ``links``, ``nodes``, ``edges``) as plain
parquet under ``/tmp/promptner_kg/<sf>/`` so an independent engine
(DuckDB in the driver's correctness gate) can recompute each downstream
stage from the previous stage's table and value-check the Ray results:

- sentences/docs_text check against the corpus ``pages`` table itself;
- triple induction, canonicalization and edge naming are re-implemented
  in pure SQL over the exported upstream tables
  (``__ray_entry__.oracle_sql``), giving stage-level independent oracles;
- the detection stage itself is pinned by the 882-row reference
  conformance replay and the deterministic-stub e2e equality tests.

Idempotent + cached: keyed on the corpus meta, like the corpus itself.
"""

from __future__ import annotations

import json
import pathlib

EXPORT_ROOT = pathlib.Path("/tmp/promptner_kg")
EXPORT_VERSION = 1


def kg_export_dir(sf_dir: str) -> pathlib.Path:
    return EXPORT_ROOT / pathlib.Path(sf_dir).name


def ensure_kg_export(sf_dir: str) -> pathlib.Path:
    """Run extraction + graph once for ``sf_dir``'s synthetic corpus and
    return the export root.  Requires an initialised Ray (the driver owns
    the session; this never calls ``ray.init``)."""
    from ..sources.corpus import ensure_corpus
    from .kg import KGConfig, run_extraction, run_graph

    name = pathlib.Path(sf_dir).name
    # mirror __ray_entry__'s corpus sizing
    n_docs = {"sf0.001": 96, "sf0.01": 192, "sf0.1": 768}.get(name, 192)
    corpus_root = ensure_corpus(
        pathlib.Path("/tmp/promptner_corpus") / name,
        n_docs=n_docs,
        seed=42,
        sf_dir=sf_dir,
    )
    out = kg_export_dir(sf_dir)
    meta_path = out / "meta.json"
    meta = {
        "corpus": str(corpus_root),
        "corpus_meta": json.loads(
            (pathlib.Path(corpus_root) / "meta.json").read_text()
        ),
        "version": EXPORT_VERSION,
    }
    if meta_path.exists() and json.loads(meta_path.read_text()) == meta:
        return out
    import shutil

    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    cfg = KGConfig(detect_concurrency=(1, 8), wave_size=64)
    run_extraction(corpus_root, out, cfg)
    run_graph(out)
    meta_path.write_text(json.dumps(meta))
    return out
