"""Synthetic pages-corpus source: distributed, deterministic, partitioned.

Generates the Common-Crawl-style ``pages`` table (+ ``gold_sentences``) as a
Ray Data pipeline: ``ray.data.range(n_docs)`` → actor-pool ``map_batches``
(the filler corpus from the driver's ``documents.parquet`` is ``ray.put``
ONCE and resolved per actor in ``__init__``, never shipped per batch) →
``write_parquet(partition_cols=["part"])`` so the KG pipeline can prune
committed partitions at the read.
"""

from __future__ import annotations

import json
import pathlib

import pyarrow as pa

from .. import synth
from ..schemas import GOLD_SENTENCES, PAGES

N_PARTS = 64


class _PageBatchBuilder:
    """Actor: resolves the broadcast filler corpus once, builds page rows."""

    def __init__(self, seed: int, corpus_ref, gold: bool, n_docs: int) -> None:
        import ray

        langs, fillers = ray.get(corpus_ref)
        self.seed = seed
        self.langs = langs
        self.fillers = fillers
        self.gold = gold
        self.n_docs = n_docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        indices = batch.column("id").to_pylist()
        pages, gold = synth.pages_batch(
            indices, self.seed, self.langs, self.fillers, n_docs=self.n_docs
        )
        if self.gold:
            tbl = pa.Table.from_pylist(gold, schema=GOLD_SENTENCES)
        else:
            tbl = pa.Table.from_pylist(pages, schema=PAGES)
            parts = [synth.part_for(i, self.n_docs, N_PARTS) for i in indices]
            tbl = tbl.append_column("part", pa.array(parts, type=pa.int32()))
        return tbl


def _load_filler(sf_dir: str) -> tuple[list[str], list[list[str]]]:
    """Langs + tokenized filler texts from the driver's documents table."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text", "lang"]
    )
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang").to_pylist()
    return langs, [t.split(" ") for t in texts]


def build_pages_dataset(
    n_docs: int,
    seed: int = 42,
    sf_dir: str = "/root/testdata/sf0.001",
    gold: bool = False,
    override_num_blocks: int | None = None,
):
    import ray

    langs, fillers = _load_filler(sf_dir)
    corpus_ref = ray.put((langs, fillers))
    # Cap block count: each (block × part) intersection becomes one parquet
    # file, and thousands of tiny files stall the read-side metadata path.
    blocks = override_num_blocks or max(8, min(256, n_docs // 1024))
    return ray.data.range(n_docs, override_num_blocks=blocks).map_batches(
        _PageBatchBuilder,
        fn_constructor_kwargs={
            "seed": seed,
            "corpus_ref": corpus_ref,
            "gold": gold,
            "n_docs": n_docs,
        },
        batch_format="pyarrow",
        concurrency=4,
    )


def ensure_corpus(
    corpus_dir: str | pathlib.Path,
    n_docs: int,
    seed: int = 42,
    sf_dir: str = "/root/testdata/sf0.001",
) -> pathlib.Path:
    """Generate (or reuse) a pages+gold corpus under ``corpus_dir``.

    Idempotent: skipped when a meta.json with identical parameters exists.
    Returns the corpus root (contains ``pages/`` hive-partitioned by part,
    and ``gold/``).
    """
    root = pathlib.Path(corpus_dir)
    meta_path = root / "meta.json"
    meta = {"n_docs": n_docs, "seed": seed, "sf_dir": sf_dir, "version": 5}
    if meta_path.exists() and json.loads(meta_path.read_text()) == meta:
        return root
    import shutil

    if root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True)
    build_pages_dataset(n_docs, seed, sf_dir, gold=False).write_parquet(
        str(root / "pages"), partition_cols=["part"]
    )
    build_pages_dataset(n_docs, seed, sf_dir, gold=True).write_parquet(
        str(root / "gold")
    )
    meta_path.write_text(json.dumps(meta))
    return root


def read_pages(
    corpus_root: str | pathlib.Path,
    exclude_parts: set[int] | None = None,
    columns: list[str] | None = None,
):
    """Read the pages table, pruning committed partitions at the read.

    ``exclude_parts`` removes whole hive directories from the file list —
    committed work is never re-read, let alone re-processed.
    """
    import ray

    pages_dir = pathlib.Path(corpus_root) / "pages"
    part_dirs = sorted(pages_dir.glob("part=*"))
    if exclude_parts:
        part_dirs = [
            d
            for d in part_dirs
            if int(d.name.split("=", 1)[1]) not in exclude_parts
        ]
    files = [str(f) for d in part_dirs for f in sorted(d.rglob("*.parquet"))]
    if not files:
        return None
    return ray.data.read_parquet(files, columns=columns)
