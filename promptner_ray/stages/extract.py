"""Stateless batch stages: HTML→text extraction, language gate, sentence split.

All three are ``map_batches`` transforms over ``batch_format="pyarrow"``
blocks.  They are stateless pure tasks (no actor pool needed — reference had
no state here either; SURVEY.md §2.3).  The html column is dropped as soon as
text is extracted so the wide binary payload never flows further down the
pipeline (SURVEY.md §7.3 "wide binary rows").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.textextract import extract_text


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, lang, …) → docs_text(url, warc_ts, lang, text).

    The input ``text`` column (when present — it is the synthesis oracle) is
    NOT read here; extraction works from ``html`` alone.
    """
    html_col = batch.column("html")
    texts = [extract_text(v) for v in html_col.to_pylist()]
    return pa.table(
        {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def lang_gate_batch(batch: pa.Table, lang: str = "en") -> pa.Table:
    """Keep only rows in the target language (vectorized filter)."""
    return batch.filter(pc.equal(batch.column("lang"), lang))


def split_sentences_batch(batch: pa.Table) -> pa.Table:
    """docs_text → sentences(url, sent_id, text): explode on newline.

    Documents' text lines are the sentence unit (synthesis joins sentences
    with "\\n"; the reference operates on single sentences already).
    Vectorized: Arrow ``split_pattern`` + offset-driven repeat of the
    parent url, numpy-derived per-line ids, then a vectorized
    empty-line filter.
    """
    import numpy as np

    lines = pc.split_pattern(batch.column("text"), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    offsets = np.asarray(lines.offsets)
    counts = offsets[1:] - offsets[:-1]
    parent_idx = pa.array(
        np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    )
    # per-line ordinal within its document = global pos − its list start
    sent_ids = np.arange(offsets[-1] - offsets[0], dtype=np.int32) - np.repeat(
        (offsets[:-1] - offsets[0]).astype(np.int32), counts
    )
    tbl = pa.table(
        {
            "url": pc.take(batch.column("url"), parent_idx),
            "sent_id": pa.array(sent_ids, type=pa.int32()),
            "text": lines.values,
        }
    )
    return tbl.filter(pc.not_equal(tbl.column("text"), ""))
