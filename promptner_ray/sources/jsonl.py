"""JSONL source/sink for webtext-style document dumps.

Common-Crawl derivatives (C4, RefinedWeb, Dolma, …) ship documents as
gzip'd JSONL; this source maps such dumps onto the engine's ``documents``
schema.  Reading rides ``ray.data.read_json`` (newline-delimited JSON is
its native format, parallel per file / per block — at corpus scale the
file is the parallelism unit, exactly like the parquet path); columns
are then projected/renamed to the engine contract.  The sink writes
newline-delimited JSON via ``Dataset.write_json``.
"""

from __future__ import annotations

import pyarrow as pa

DOCUMENTS_COLUMNS = ("doc_id", "text", "lang")


def read_docs_jsonl(
    paths: list[str] | str,
    text_key: str = "text",
    id_key: str = "doc_id",
    lang_key: str = "lang",
):
    """JSONL file(s) → Dataset with the documents contract columns.

    Missing ``lang`` fields become ``"und"``; the id column is cast to
    int64 when numeric (webtext dumps vary between int ids and string
    ids — string ids are preserved as-is).
    """
    import ray

    ds = ray.data.read_json(paths)

    def project(batch: pa.Table) -> pa.Table:
        cols: dict = {}
        ids = batch.column(id_key)
        if pa.types.is_integer(ids.type):
            ids = ids.cast(pa.int64())
        cols["doc_id"] = ids
        cols["text"] = batch.column(text_key).cast(pa.string())
        if lang_key in batch.column_names:
            cols["lang"] = batch.column(lang_key).cast(pa.string())
        else:
            cols["lang"] = pa.array(["und"] * len(batch), type=pa.string())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def write_docs_jsonl(docs, path: str) -> None:
    """documents-shaped Dataset → newline-delimited JSON under ``path``."""
    docs.write_json(path)
