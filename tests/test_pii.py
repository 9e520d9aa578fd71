"""PII redaction: kernel semantics on crafted strings and bit-parity of
the pyarrow(RE2) kernel with its DuckDB(RE2) oracle twin."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa


TRICKY = [
    "mail me at jo.doe+x@ex-ample.co.uk or root@10.2.3.4 now",
    "ssn 123-45-6789 phone (415) 555-1234 alt 415.555.9999 ip 255.255.255.0",
    "no pii here",
    "a@b.io c@d.org 999-88-7777 999-88-7777",
    "",
]


def test_redact_batch_semantics():
    from promptner_ray.functions.pii import redact_batch

    t = pa.table({"doc_id": list(range(len(TRICKY))), "text": TRICKY})
    out = redact_batch(t).to_pandas()
    assert out.loc[0, "text_redacted"] == (
        "mail me at [EMAIL] or root@[IP] now"
    )
    assert out.loc[1, "text_redacted"] == (
        "ssn [SSN] phone [PHONE] alt [PHONE] ip [IP]"
    )
    assert out.loc[1, ["n_email", "n_ssn", "n_phone", "n_ipv4"]].tolist() == [
        0, 1, 2, 1,
    ]
    assert out.loc[2, "text_redacted"] == "no pii here"
    assert out.loc[3, ["n_email", "n_ssn"]].tolist() == [2, 2]


def test_redact_matches_duckdb_twin():
    from promptner_ray.functions.pii import redact_batch, sql_redact_exprs

    t = pa.table({"doc_id": list(range(len(TRICKY))), "text": TRICKY})
    got = redact_batch(t).to_pandas()[
        ["doc_id", "text_redacted", "n_email", "n_ssn", "n_phone", "n_ipv4"]
    ]
    red, counts = sql_redact_exprs()
    con = duckdb.connect()
    con.register("docs", t)
    want = con.execute(
        f"SELECT doc_id, {red} AS text_redacted, {', '.join(counts)} "
        "FROM docs"
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_injection_matches_duckdb_twin():
    from promptner_ray.functions.pii import (
        inject_synthetic_pii_batch,
        sql_inject_expr,
    )

    t = pa.table(
        {"doc_id": [0, 7, 255, 899, 12345], "text": ["a", "b", "c", "d", "e"]}
    )
    got = inject_synthetic_pii_batch(t).to_pandas()[["doc_id", "text_pii"]]
    con = duckdb.connect()
    con.register("docs", t)
    want = con.execute(
        f"SELECT doc_id, {sql_inject_expr('text')} AS text_pii FROM docs"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every injected row must trip every category exactly once
    from promptner_ray.functions.pii import redact_batch

    red = redact_batch(
        pa.Table.from_pandas(got), column="text_pii"
    ).to_pandas()
    for c in ("n_email", "n_ssn", "n_phone", "n_ipv4"):
        assert (red[c] == 1).all(), c
