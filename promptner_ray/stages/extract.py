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
    with "\\n"; the reference operates on single sentences already).  Pure
    Python split over the column, emitted as flat Arrow arrays.
    """
    urls: list[str] = []
    sent_ids: list[int] = []
    texts: list[str] = []
    for url, text in zip(
        batch.column("url").to_pylist(), batch.column("text").to_pylist()
    ):
        for i, line in enumerate(text.split("\n")):
            if line:
                urls.append(url)
                sent_ids.append(i)
                texts.append(line)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "sent_id": pa.array(sent_ids, type=pa.int32()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
