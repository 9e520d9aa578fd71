"""Benchmark decontamination: flag training docs that overlap an eval set.

The standard pretraining hygiene pass (GPT-3 appendix C, The Pile):
any training document sharing a word n-gram with a held-out benchmark
document is contaminated and must be dropped (or at least flagged)
before training, otherwise eval numbers are memorization.

Physical plan — the benchmark side is an eval set, tiny by nature
(MMLU + HellaSwag + every common benchmark ≈ MBs against a 100 TB
corpus), so this is the canonical broadcast-small-side shape:

1. distinct benchmark n-gram digests computed distributed (per-block
   distinct → one hash-partitioned Arrow distinct — only digest rows
   cross the exchange), collected once, ``ray.put`` once;
2. the corpus streams through a map-ONLY membership probe (no shuffle
   of the corpus at all): per doc, distinct n-grams → md5 digests →
   set-membership count against the broadcast set.

For a pathological benchmark too large to broadcast, the identical
semantics are ``shuffle.local_hash_join(corpus_grams, bench_grams,
how="semi")`` + a grouped count — that variant exchanges every corpus
n-gram and is deliberately NOT the default.

Digests are md5-hex so the DuckDB oracle (``md5(array_to_string(...))``
membership over the same split) reproduces them byte-for-byte; at
100 TB the md5 inner loop would swap for a vectorized 64-bit hash, as
with the MinHash/shingle family (see ``dedup`` module docstring).

In this sandbox there is no separate benchmark table, so the eval set
is carved deterministically out of ``documents`` itself:
``doc_id % mod == rem`` (SQL-expressible, stable across runs).  n-grams
are strict full windows — documents shorter than ``n`` tokens
contribute nothing (mirrors ``generate_series`` emptiness in SQL).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

NGRAM_N = 3
BENCH_MOD = 10
BENCH_REM = 7


def _doc_gram_digests(text: str, n: int) -> set[str]:
    """Distinct md5-hex digests of the doc's full word n-grams."""
    toks = text.split(" ")
    return {
        hashlib.md5(" ".join(toks[i : i + n]).encode("utf-8")).hexdigest()
        for i in range(len(toks) - n + 1)
    }


def _bench_mask(batch: pa.Table, mod: int, rem: int, invert: bool) -> pa.Table:
    ids = batch.column("doc_id")
    m = pc.equal(pc.subtract(ids, pc.multiply(pc.divide(ids, mod), mod)), rem)
    return batch.filter(pc.invert(m) if invert else m)


def _gram_rows_batch(batch: pa.Table, n: int) -> pa.Table:
    """docs → one row per distinct (within-block) n-gram digest."""
    grams: set[str] = set()
    for text in batch.column("text").to_pylist():
        grams.update(_doc_gram_digests(text, n))
    return pa.table({"g": pa.array(sorted(grams), type=pa.string())})


def benchmark_gram_ref(
    docs, n: int = NGRAM_N, mod: int = BENCH_MOD, rem: int = BENCH_REM
):
    """Distinct n-gram digest set of the benchmark slice, in the object
    store (``ray.put``) — resolved once per probe actor, never per batch.

    No exchange: blocks emit their distinct digests and the driver
    unions them.  Driver bytes are bounded by the final broadcast set
    (the benchmark is MBs against a 100 TB corpus — the premise of this
    plan), so a distributed distinct before the collect would only add
    a shuffle to dedupe the ≤ #blocks-fold overlap."""
    import ray

    bench = docs.map_batches(
        _bench_mask,
        fn_kwargs={"mod": mod, "rem": rem, "invert": False},
        batch_format="pyarrow",
    )
    rows = bench.map_batches(
        _gram_rows_batch, fn_kwargs={"n": n}, batch_format="pyarrow"
    ).take_all()
    return ray.put(frozenset(r["g"] for r in rows))


class _ContamProbe:
    """Stateful map stage: benchmark digest set resolved once per actor."""

    def __init__(self, bench_ref, n: int):
        import ray

        self.bench: frozenset[str] = ray.get(bench_ref)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        hits: list[int] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            k = len(self.bench & _doc_gram_digests(text, self.n))
            if k:
                doc_ids.append(doc_id)
                hits.append(k)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "n_hit": pa.array(hits, type=pa.int64()),
            }
        )


def contaminated_docs(
    docs,
    n: int = NGRAM_N,
    mod: int = BENCH_MOD,
    rem: int = BENCH_REM,
    concurrency=None,
):
    """documents → (doc_id, n_hit): training docs (the non-benchmark
    slice) sharing ≥1 word n-gram with any benchmark doc, with the count
    of distinct shared n-grams.  Map-only over the corpus."""
    if concurrency is None:
        import ray

        cpus = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        concurrency = (1, max(2, cpus // 2))
    bench_ref = benchmark_gram_ref(docs, n=n, mod=mod, rem=rem)
    train = docs.map_batches(
        _bench_mask,
        fn_kwargs={"mod": mod, "rem": rem, "invert": True},
        batch_format="pyarrow",
    )
    return train.map_batches(
        _ContamProbe,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def decontaminate(
    docs,
    n: int = NGRAM_N,
    mod: int = BENCH_MOD,
    rem: int = BENCH_REM,
    num_partitions: int | None = None,
):
    """documents → surviving (doc_id,) training rows: the anti-join of
    the training slice against :func:`contaminated_docs` — the table a
    downstream tokenizer reads.  The anti side is the contaminated id
    list (a small fraction of the corpus); the exchange is
    ``shuffle.local_hash_join`` on int64 ids, no join actors."""
    from ..shuffle import local_hash_join

    train_ids = docs.map_batches(
        lambda t: _bench_mask(t, mod, rem, True).select(["doc_id"]),
        batch_format="pyarrow",
    )
    bad = contaminated_docs(docs, n=n, mod=mod, rem=rem).select_columns(
        ["doc_id"]
    )
    return local_hash_join(
        train_ids,
        bad,
        on=["doc_id"],
        left_schema=pa.schema([("doc_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64())]),
        how="anti",
        num_partitions=num_partitions,
    )


# ---------------------------------------------------------------------------
# Cross-wave n-gram novelty: how much of each new doc the corpus has seen
# ---------------------------------------------------------------------------

def _gram_key_rows_batch(batch: pa.Table, n: int = NGRAM_N) -> pa.Table:
    """docs → one row per (doc_id, distinct gram digest, per-doc gram
    count).  Vectorized windows (``dedup._doc_shingles_vec``, same
    shorter-than-n whole-text fallback as the SQL shingles CTE); the
    digest is the signed big-endian md5 int64 (``_sql_hash64``'s twin)
    so BOTH engines join on the identical key."""
    from .dedup import _doc_shingles_vec, _md5_key64

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "gkey": pa.array([], type=pa.int64()),
            "tot": pa.array([], type=pa.int64()),
        }
    )
    if len(batch) == 0:
        return empty
    ids, grams = _doc_shingles_vec(batch, n)
    if len(ids) == 0:
        return empty
    cache: dict[str, int] = {}
    keys = [
        cache.get(g) or cache.setdefault(g, _md5_key64(g))
        for g in grams.to_pylist()
    ]
    uniq, inv, cnt = np.unique(ids, return_inverse=True, return_counts=True)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "gkey": pa.array(keys, type=pa.int64()),
            "tot": pa.array(cnt[inv], type=pa.int64()),
        }
    )


def novelty_scores(prior_docs, new_docs, n: int = NGRAM_N):
    """new_docs → (doc_id, n_grams, n_seen, novelty): the fraction of
    each new doc's distinct word n-grams UNSEEN in the prior corpus —
    the memorization-risk / freshness metric of a continuous ingestion
    pipeline (novelty 0 = the corpus already contains every phrase of
    this doc; 1 = entirely new text).

    Unlike :func:`contaminated_docs` (whose benchmark side is small by
    premise and broadcast), the prior side here is HALF THE CORPUS, so
    the overlap check is a distributed int64 semi-join against the
    prior wave's distinct gram digests — per-worker memory O(block) at
    any corpus size.  The novelty division runs on identical integers
    in both engines, so the float column is hash-exact.
    """
    from ..shuffle import hash_grouped, local_hash_join, sized_partitions

    rows = new_docs.map_batches(
        _gram_key_rows_batch, fn_kwargs={"n": n}, batch_format="pyarrow"
    ).materialize()  # consumed by the totals pass AND the semi-join
    # both waves are the same order of magnitude — size every exchange
    # from the (already materialized, free to count) new-wave gram rows
    parts = sized_partitions(rows.count(), None)
    g0 = hash_grouped(
        prior_docs.map_batches(
            _gram_key_rows_batch, fn_kwargs={"n": n}, batch_format="pyarrow"
        ).map_batches(lambda t: t.select(["gkey"]), batch_format="pyarrow"),
        ["gkey"],
        [],
        num_partitions=parts,
    )
    totals = hash_grouped(
        rows.map_batches(
            lambda t: t.select(["doc_id", "tot"]), batch_format="pyarrow"
        ),
        ["doc_id", "tot"],
        [],
        hash_cols=["doc_id"],
        num_partitions=parts,
    )
    seen_rows = local_hash_join(
        rows,
        g0,
        on=["gkey"],
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("gkey", pa.int64()),
             ("tot", pa.int64())]
        ),
        right_schema=pa.schema([("gkey", pa.int64())]),
        how="semi",
        num_partitions=parts,
    )
    seen = hash_grouped(
        seen_rows.map_batches(
            lambda t: t.select(["doc_id"]), batch_format="pyarrow"
        ),
        ["doc_id"],
        [([], "count_all")],
        rename={"count_all": "n_seen"},
        num_partitions=parts,
    )
    joined = local_hash_join(
        totals,
        seen,
        on=["doc_id"],
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("tot", pa.int64())]
        ),
        right_schema=pa.schema(
            [("doc_id", pa.int64()), ("n_seen", pa.int64())]
        ),
        how="left_outer",
        num_partitions=parts,
    )

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "doc_id" not in t.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_grams": pa.array([], type=pa.int64()),
                    "n_seen": pa.array([], type=pa.int64()),
                    "novelty": pa.array([], type=pa.float64()),
                }
            )
        tot = t.column("tot").to_numpy(zero_copy_only=False)
        seen_np = pc.fill_null(
            t.column("n_seen").combine_chunks(), 0
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(tot, type=pa.int64()),
                "n_seen": pa.array(seen_np, type=pa.int64()),
                "novelty": pa.array(
                    1.0 - seen_np.astype(np.float64) / tot.astype(np.float64),
                    type=pa.float64(),
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
