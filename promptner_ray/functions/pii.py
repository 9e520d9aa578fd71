"""PII redaction over a text column — a first-class pretraining-corpus
pass (emails, SSNs, phone numbers, IPv4 addresses → typed placeholder
tokens, with per-category match counts).

Every pattern is RE2 syntax, which BOTH execution engines here share:
``pyarrow.compute.replace_substring_regex`` (the Ray-side kernel) and
DuckDB's ``regexp_replace`` (the oracle twin) — so the SQL check is
bit-identical, not merely similar.  Redaction is one fused vectorized
``map_batches`` pass: for each category in a FIXED order the kernel
counts matches on the current string, then rewrites; later patterns see
earlier placeholders (which contain no digits, so no false feeding).

Scale notes: stateless per-row transform — no shuffle, no state, RE2
runs linear-time; the pass streams at full parallelism and the only
caveat at 100 TB is output amplification of the count columns (3 int64
per row — negligible).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, placeholder) — applied IN ORDER.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "[PHONE]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
)


def redact_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append ``<column>_redacted`` plus ``n_<category>`` counts."""
    cur = batch.column(column)
    counts = {}
    for name, pattern, token in PII_PATTERNS:
        counts[f"n_{name}"] = pc.count_substring_regex(cur, pattern).cast(
            pa.int64()
        )
        cur = pc.replace_substring_regex(cur, pattern, token)
    out = batch.append_column(f"{column}_redacted", cur)
    for cname, arr in counts.items():
        out = out.append_column(cname, arr)
    return out


def redact_pii(ds, column: str = "text"):
    """Dataset → same rows + ``<column>_redacted`` and per-category
    ``n_email / n_ssn / n_phone / n_ipv4`` columns."""
    return ds.map_batches(
        redact_batch, fn_kwargs={"column": column}, batch_format="pyarrow"
    )


def inject_synthetic_pii_batch(
    batch: pa.Table, column: str = "text"
) -> pa.Table:
    """Append ``<column>_pii`` = text + one synthetic email / phone /
    SSN / IPv4, each a pure integer-arithmetic function of ``doc_id``.

    The sandbox corpus contains no real PII, which would make an oracle
    check of :func:`redact_pii` a trivial identity; injecting the SAME
    deterministic strings on the Ray side and in :func:`sql_inject_expr`
    makes the redaction comparison exercise every pattern on every row.
    """
    import pandas as pd

    did = batch.column("doc_id").to_numpy(zero_copy_only=False)
    d = pd.Series(did).astype(str)
    a = pd.Series(100 + did % 900).astype(str)
    b = pd.Series(10 + did % 90).astype(str)
    c = pd.Series(1000 + did % 9000).astype(str)
    ip = pd.Series(did % 256).astype(str)
    j = pd.Series(did % 100).astype(str)
    extra = (
        " contact user" + d + "@example.com, call (" + a + ") 555-" + c
        + ", ssn " + a + "-" + b + "-" + c + ", host 10.0." + ip + "." + j
    )
    text = pd.Series(batch.column(column).to_pylist(), dtype=object)
    return batch.append_column(
        f"{column}_pii", pa.array((text + extra).tolist(), type=pa.string())
    )


def sql_inject_expr(column: str = "text") -> str:
    """DuckDB twin of :func:`inject_synthetic_pii_batch`."""
    return (
        f"{column} || ' contact user' || doc_id::VARCHAR || "
        "'@example.com, call (' || (100 + doc_id % 900)::VARCHAR || "
        "') 555-' || (1000 + doc_id % 9000)::VARCHAR || ', ssn ' || "
        "(100 + doc_id % 900)::VARCHAR || '-' || "
        "(10 + doc_id % 90)::VARCHAR || '-' || "
        "(1000 + doc_id % 9000)::VARCHAR || ', host 10.0.' || "
        "(doc_id % 256)::VARCHAR || '.' || (doc_id % 100)::VARCHAR"
    )


def sql_redact_exprs(column: str = "text") -> tuple[str, list[str]]:
    """DuckDB twins: (redacted-text expression, [count expressions]) in
    the same category order.  Counts use ``len(string_split_regex)-1``
    on the progressively redacted string, mirroring the kernel."""
    cur = column
    count_exprs = []
    for name, pattern, token in PII_PATTERNS:
        lit = pattern.replace("'", "''")
        count_exprs.append(
            f"(len(string_split_regex({cur}, '{lit}')) - 1)::BIGINT"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{lit}', '{token}', 'g')"
    return cur, count_exprs
