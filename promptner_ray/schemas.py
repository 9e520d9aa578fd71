"""Explicit Arrow schemas — single source of truth for every engine table.

The reference keeps its column contracts implicit in per-function code
(reference ``data.py:87`` etc.); here every table is an enforced
``pyarrow.Schema``.  See SURVEY.md §1.2 for the mapping.
"""

from __future__ import annotations

import pyarrow as pa

# Input table per BASELINE.json input_hint: Common-Crawl-style pages.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

DOCS_TEXT = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("text", pa.string()),
    ]
)

SENTENCES = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("text", pa.string()),
    ]
)

MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("mention", pa.string()),
        ("mtype", pa.string()),
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
    ]
)

TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("subj_type", pa.string()),
        ("obj_type", pa.string()),
    ]
)

LINKS = pa.schema(
    [
        ("surface_norm", pa.string()),
        ("surface_hash", pa.int64()),
        ("entity_id", pa.int64()),
        ("canonical", pa.string()),
        ("etype", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)

NODES = pa.schema(
    [
        ("entity_id", pa.int64()),
        ("canonical", pa.string()),
        ("etype", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)

EDGES = pa.schema(
    [
        ("subj_id", pa.int64()),
        ("pred", pa.string()),
        ("obj_id", pa.int64()),
        ("weight", pa.int64()),
    ]
)

GOLD_SENTENCES = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int32()),
        ("text", pa.string()),
        ("surfaces", pa.list_(pa.string())),
        ("types", pa.list_(pa.string())),
        ("bio", pa.list_(pa.string())),
    ]
)
