"""Composed training-data cleaning pipeline (C4-style) over ``documents``.

The standard webtext cleaning recipe as ONE streaming plan — the shape a
100 TB pretraining-corpus pass actually takes:

1. per-doc feature pass (single fused ``map_batches``): content hash,
   quality gates (length / punctuation / stopword ratios,
   reference-free heuristics per :mod:`..functions.textstats`),
   language ID;
2. exact-dedup keeper selection: hash-partitioned grouped Min over the
   int64 content digest (``shuffle.hash_grouped`` — one row per distinct
   text crosses the exchange);
3. an int64-keyed hash join of the feature rows against the keeper
   table, keeping rows that (a) ARE their content's keeper, (b) pass
   the quality gates, (c) match the target language.

No broadcast of anything corpus-sized; the only all-to-all moves one row
per distinct content hash plus the join exchange.  Output: one row per
surviving document with its features — the table a tokenizer/sharder
would consume next.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import (
    LANG_MARKERS,
    LANG_PRIORITY,
    PUNCT_RE,
    STOPWORDS,
    _per_row_member_counts,
    _split_tokens,
)

_FEATURE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("fp_key", pa.int64()),
        ("n_tokens", pa.int64()),
        ("lang_pred", pa.string()),
        ("passes", pa.bool_()),
    ]
)


def doc_features_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, fp_key, n_tokens, lang_pred, passes): every
    per-doc signal the cleaning decision needs, in one pass."""
    if len(batch) == 0:
        return _FEATURE_SCHEMA.empty_table()
    flat, offsets = _split_tokens(batch)
    n_tokens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    text_col = batch.column("text")
    n_chars = pc.utf8_length(text_col).cast(pa.int64()).to_numpy()
    stripped = pc.replace_substring_regex(text_col, PUNCT_RE, "")
    n_punct = n_chars - pc.utf8_length(stripped).cast(pa.int64()).to_numpy()
    n_stop = _per_row_member_counts(flat, offsets, STOPWORDS)
    punct_ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
    stop_ratio = np.where(n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0)
    passes = (
        (n_tokens >= 5)
        & (n_tokens <= 5000)
        & (punct_ratio < 0.3)
        & (stop_ratio < 0.5)
    )
    scores = {
        lang: _per_row_member_counts(flat, offsets, markers)
        for lang, markers in LANG_MARKERS.items()
    }
    n = len(batch)
    preds = np.full(n, "und", dtype=object)
    best = np.zeros(n, dtype=np.int64)
    for lang in reversed(LANG_PRIORITY):
        s = scores[lang]
        take = (s >= best) & (s > 0)
        preds[take] = lang
        best = np.maximum(best, s)
    fp_keys = [
        int.from_bytes(
            hashlib.md5(t.encode("utf-8")).digest()[:8], "big", signed=True
        )
        for t in text_col.to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "fp_key": pa.array(fp_keys, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "lang_pred": pa.array(preds.tolist(), type=pa.string()),
            "passes": pa.array(passes, type=pa.bool_()),
        }
    )


def clean_corpus(docs, lang: str = "en", num_partitions: int | None = None):
    """documents → surviving (doc_id, n_tokens, lang_pred) rows."""
    from ..shuffle import hash_grouped, local_hash_join, sized_partitions

    if num_partitions is None:
        # every exchange here moves ≤ one row per doc; a parquet-backed
        # count is metadata-only, so sizing the plan to the corpus is
        # free (tiny inputs take the n=1 fast path)
        num_partitions = sized_partitions(docs.count(), None)
    feats = docs.map_batches(doc_features_batch, batch_format="pyarrow")
    keepers = hash_grouped(
        feats.select_columns(["fp_key", "doc_id"]),
        ["fp_key"],
        [("doc_id", "min")],
        rename={"doc_id_min": "keeper_id"},
        num_partitions=num_partitions,
    )
    # local_hash_join, NOT Dataset.join: keepers comes out of map_groups,
    # whose empty output blocks are zero-column (Ray 2.49); when the
    # distinct-fp count is small relative to the partition count, a
    # native-join partition can consist only of those blocks and the
    # Acero join aborts for lack of the key field.
    joined = local_hash_join(
        feats,
        keepers,
        on=["fp_key"],
        left_schema=pa.schema(list(_FEATURE_SCHEMA)),
        right_schema=pa.schema(
            [("fp_key", pa.int64()), ("keeper_id", pa.int64())]
        ),
        how="inner",
        num_partitions=num_partitions,
    )

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.equal(batch.column("doc_id"), batch.column("keeper_id")),
                batch.column("passes"),
            ),
            pc.equal(batch.column("lang_pred"), lang),
        )
        kept = batch.filter(mask)
        return kept.select(["doc_id", "n_tokens", "lang_pred"])

    return joined.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# full curation recipe: C4 gates + Gopher repetition + MinHash near-dedup
# ---------------------------------------------------------------------------

CURATE_TOP_TOKEN_MAX = 0.12
CURATE_DUP2_MAX = 0.2


def curation_features_batch(batch: pa.Table) -> pa.Table:
    """One fused per-doc feature pass: the C4 signals of
    :func:`doc_features_batch` plus the Gopher repetition fractions —
    a single scan of the text column feeds every gate downstream."""
    from ..functions.textstats import repetition_stats_batch

    base = doc_features_batch(batch)
    reps = repetition_stats_batch(batch)
    return base.append_column(
        "top_token_frac", reps.column("top_token_frac")
    ).append_column("dup_2gram_frac", reps.column("dup_2gram_frac"))


def curate_corpus(
    docs,
    lang: str = "en",
    top_token_max: float = CURATE_TOP_TOKEN_MAX,
    dup2_max: float = CURATE_DUP2_MAX,
    num_partitions: int | None = None,
):
    """documents → curated survivor rows: the full modern pretraining
    recipe as ONE streaming plan.

    Stages (all previously oracle-proven in isolation, composed here):

    1. fused feature pass (quality gates, language ID, content hash,
       repetition fractions) — one scan, no shuffle;
    2. exact-dedup keeper selection (grouped Min over the int64 digest;
       one row per distinct text crosses the exchange);
    3. gate filter: keeper ∧ quality ∧ language ∧ Gopher repetition;
    4. MinHash near-dedup WITHIN the gated survivors (LSH pairs →
       distributed connected components → anti-join of cluster
       non-keepers) — near-dups of already-dropped docs don't kill
       survivors.

    Everything exchanged is int64-keyed; no broadcast of anything
    corpus-sized; all joins are ``shuffle.local_hash_join`` (tagged
    union + one hash exchange + per-partition C++ join — no Ray join
    aggregator actors, so chaining them never deadlocks a small
    session).  The gated survivor manifest (5 narrow scalar columns,
    no text) feeds two consumers — the near-dedup pass and the final
    anti-join — so it is pinned to the (spillable) object store once
    instead of re-running the feature/keeper lineage twice.  Output:
    (doc_id, n_tokens, lang_pred, top_token_frac, dup_2gram_frac) —
    the shard manifest a tokenizer consumes.
    """
    from ..functions.dedup import minhash_lsh_pairs
    from ..functions.graphops import connected_components
    from ..shuffle import hash_grouped, local_hash_join, sized_partitions

    if num_partitions is None:
        # same sizing rule as clean_corpus — all exchanges are ≤ one
        # row per doc, and a parquet count is free
        num_partitions = sized_partitions(docs.count(), None)
    feats = docs.map_batches(curation_features_batch, batch_format="pyarrow")
    keepers = hash_grouped(
        feats.select_columns(["fp_key", "doc_id"]),
        ["fp_key"],
        [("doc_id", "min")],
        rename={"doc_id_min": "keeper_id"},
        num_partitions=num_partitions,
    )
    feature_schema = pa.schema(
        list(_FEATURE_SCHEMA)
        + [
            ("top_token_frac", pa.float64()),
            ("dup_2gram_frac", pa.float64()),
        ]
    )
    joined = local_hash_join(
        feats,
        keepers,
        on=["fp_key"],
        left_schema=feature_schema,
        right_schema=pa.schema(
            [("fp_key", pa.int64()), ("keeper_id", pa.int64())]
        ),
        how="inner",
        num_partitions=num_partitions,
    )

    out_cols = [
        "doc_id",
        "n_tokens",
        "lang_pred",
        "top_token_frac",
        "dup_2gram_frac",
    ]

    def gate(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.and_(
                    pc.equal(
                        batch.column("doc_id"), batch.column("keeper_id")
                    ),
                    batch.column("passes"),
                ),
                pc.equal(batch.column("lang_pred"), lang),
            ),
            pc.and_(
                pc.less(batch.column("top_token_frac"), top_token_max),
                pc.less(batch.column("dup_2gram_frac"), dup2_max),
            ),
        )
        return batch.filter(mask).select(out_cols)

    surv = joined.map_batches(gate, batch_format="pyarrow").materialize()
    surv_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("lang_pred", pa.string()),
            ("top_token_frac", pa.float64()),
            ("dup_2gram_frac", pa.float64()),
        ]
    )
    sdocs = local_hash_join(
        docs.select_columns(["doc_id", "text"]),
        surv.select_columns(["doc_id"]),
        on=["doc_id"],
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string())]
        ),
        right_schema=pa.schema([("doc_id", pa.int64())]),
        how="semi",
        num_partitions=num_partitions,
    )
    comps = connected_components(
        minhash_lsh_pairs(sdocs), num_partitions=num_partitions
    )

    def to_losers(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("doc_id"), t.column("component")))
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64())})

    losers = comps.map_batches(to_losers, batch_format="pyarrow")
    return local_hash_join(
        surv,
        losers,
        on=["doc_id"],
        left_schema=surv_schema,
        right_schema=pa.schema([("doc_id", pa.int64())]),
        how="anti",
        num_partitions=num_partitions,
    )
