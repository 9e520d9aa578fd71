"""Feature-hashing (hashing-trick) term-frequency vectorizer.

``hashed_tf`` maps each document's tokens into a fixed number of buckets
by content hash and counts per-bucket occurrences — the standard
unbounded-vocabulary featurizer (Weinberger et al. 2009): no vocabulary
build pass, no driver state, embarrassingly parallel, output width fixed
regardless of corpus size.  The feature column feeds the repo's
similarity/ANN operators (:mod:`.similarity`) — text → vector → near-dup
in one streaming plan.

Buckets are emitted as WIDE int64 columns (``b0…b{D-1}``) rather than a
list column: counts are exact integers, so the DuckDB oracle (same md5
bucket expression, ``SUM(CASE)`` pivot) compares bit-exactly with no
list-formatting ambiguity.

Per-batch cost: one md5 per DISTINCT token per batch (cached dict), then
a single C-level grouped count over (row, bucket) — no Python loop over
token instances.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .textstats import _split_tokens

DIM = 8


def _bucket_of(token: str, dim: int) -> int:
    return (
        int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")
        % dim
    )


def hashed_tf_batch(batch: pa.Table, dim: int = DIM) -> pa.Table:
    """documents → (doc_id, b0…b{dim-1}) hashed term-frequency counts."""
    n = len(batch)
    if n == 0:
        cols = {"doc_id": pa.array([], type=pa.int64())}
        for b in range(dim):
            cols[f"b{b}"] = pa.array([], type=pa.int64())
        return pa.table(cols)
    flat, offsets = _split_tokens(batch)
    row_ids = np.repeat(np.arange(n), np.diff(offsets))
    toks = flat.to_numpy(zero_copy_only=False)
    cache = {t: _bucket_of(t, dim) for t in set(toks.tolist())}
    buckets = np.fromiter(
        (cache[t] for t in toks.tolist()), dtype=np.int64, count=len(toks)
    )
    counts = np.zeros((n, dim), dtype=np.int64)
    np.add.at(counts, (row_ids, buckets), 1)
    cols = {"doc_id": batch.column("doc_id").cast(pa.int64())}
    for b in range(dim):
        cols[f"b{b}"] = pa.array(counts[:, b], type=pa.int64())
    return pa.table(cols)


def hashed_tf(docs, dim: int = DIM):
    """Dataset of documents → hashed-TF feature table (stateless pass)."""
    return docs.map_batches(
        hashed_tf_batch, fn_kwargs={"dim": dim}, batch_format="pyarrow"
    )


def classifier_weights(dim: int = DIM) -> list[int]:
    """Deterministic integer weight vector: first md5 byte of ``w:{b}``
    centered at zero.  Stands in for trained fasttext/logistic weights —
    the *serving* plan (broadcast small weights, vectorized dot per
    batch, no shuffle) is identical whatever the weights' provenance;
    integer weights keep the score exact so the DuckDB twin (same
    weights inlined as literals) compares bit-for-bit, with no
    float-summation-order ambiguity."""
    return [
        hashlib.md5(f"w:{b}".encode("utf-8")).digest()[0] - 128
        for b in range(dim)
    ]


def linear_score_batch(
    batch: pa.Table, weights: list[int] | None = None, dim: int = DIM
) -> pa.Table:
    """documents → (doc_id, score, keep): hashed-TF features dotted with
    the weight vector; ``keep`` is the positive-margin decision."""
    w = np.asarray(weights if weights is not None else classifier_weights(dim),
                   dtype=np.int64)
    tf = hashed_tf_batch(batch, dim=len(w))
    counts = np.column_stack(
        [tf.column(f"b{b}").to_numpy(zero_copy_only=False) for b in range(len(w))]
    ) if len(tf) else np.zeros((0, len(w)), dtype=np.int64)
    score = counts @ w
    return pa.table(
        {
            "doc_id": tf.column("doc_id"),
            "score": pa.array(score, type=pa.int64()),
            "keep": pa.array(score > 0, type=pa.bool_()),
        }
    )


def linear_score(docs, dim: int = DIM):
    """Model-scoring pass: fixed (broadcast) linear weights over hashed
    TF — the shape of every learned quality/toxicity filter at corpus
    scale: stateless map, no exchange, weights shipped once per task."""
    return docs.map_batches(
        linear_score_batch, fn_kwargs={"dim": dim}, batch_format="pyarrow"
    )


def sql_linear_score(dim: int = DIM) -> str:
    """DuckDB twin of :func:`linear_score`: same md5 buckets, the same
    integer weights inlined as literals."""
    w = classifier_weights(dim)
    bucket = "('0x' || substr(md5(w), 1, 16))::UBIGINT % " + str(dim)
    terms = " + ".join(
        f"sum(CASE WHEN bkt = {b} THEN {w[b]} ELSE 0 END)" for b in range(dim)
    )
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents),
        bk AS (SELECT doc_id, {bucket} AS bkt FROM tok),
        sc AS (SELECT doc_id, ({terms})::BIGINT AS score
               FROM bk GROUP BY doc_id)
        SELECT doc_id, score, score > 0 AS keep FROM sc
    """


def sql_hashed_tf(dim: int = DIM) -> str:
    """DuckDB twin: identical md5 bucket assignment + ``SUM(CASE)`` pivot."""
    bucket = "('0x' || substr(md5(w), 1, 16))::UBIGINT % " + str(dim)
    sums = ", ".join(
        f"sum(CASE WHEN bkt = {b} THEN 1 ELSE 0 END)::BIGINT AS b{b}"
        for b in range(dim)
    )
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents),
        bk AS (SELECT doc_id, {bucket} AS bkt FROM tok)
        SELECT doc_id, {sums} FROM bk GROUP BY doc_id
    """


def corpus_df(docs, dim: int = DIM) -> tuple[int, list[int]]:
    """(n_docs, per-bucket document frequency) — a constant-size reduce.

    Per block: one row of ``dim + 1`` partial counts (docs in block,
    docs with bucket b non-zero); Ray's native ``sum`` folds the rows.
    The reduction volume is ``dim`` integers per block at any corpus
    size — the same shape as the sketch reduces (:mod:`.sketch`)."""

    def partial(batch: pa.Table) -> pa.Table:
        tf = hashed_tf_batch(batch, dim=dim)
        cols = {"n_docs": pa.array([len(tf)], type=pa.int64())}
        for b in range(dim):
            nz = int(
                np.count_nonzero(
                    tf.column(f"b{b}").to_numpy(zero_copy_only=False)
                )
            )
            cols[f"df{b}"] = pa.array([nz], type=pa.int64())
        return pa.table(cols)

    agg = docs.map_batches(partial, batch_format="pyarrow").sum(
        ["n_docs"] + [f"df{b}" for b in range(dim)]
    )
    return int(agg["sum(n_docs)"]), [
        int(agg[f"sum(df{b})"]) for b in range(dim)
    ]


def tfidf(docs, dim: int = DIM):
    """documents → (doc_id, t0…t{dim-1}) smoothed TF-IDF weights:
    ``tf_b · ln((N+1)/(df_b+1))``.

    Two streaming passes: a constant-size DF reduce (the only global
    state — ``dim`` scalars, shipped to every task as literals), then a
    stateless weighting map.  No shuffle at any corpus size.  The idf
    scalars use ``math.log`` (libm), which DuckDB's ``ln`` reproduces
    bit-for-bit on the same doubles, so the float output is
    oracle-exact, not merely close."""
    import math

    n, dfs = corpus_df(docs, dim=dim)
    idf = np.array(
        [math.log((n + 1.0) / (df + 1.0)) for df in dfs], dtype=np.float64
    )

    def weight(batch: pa.Table) -> pa.Table:
        tf = hashed_tf_batch(batch, dim=dim)
        cols = {"doc_id": tf.column("doc_id")}
        for b in range(dim):
            counts = tf.column(f"b{b}").to_numpy(zero_copy_only=False)
            cols[f"t{b}"] = pa.array(
                counts.astype(np.float64) * idf[b], type=pa.float64()
            )
        return pa.table(cols)

    return docs.map_batches(weight, batch_format="pyarrow")


def sql_tfidf(dim: int = DIM) -> str:
    """DuckDB twin of :func:`tfidf`: same buckets, same smoothed idf."""
    weights = ", ".join(
        f"(b{b} * ln((SELECT (count(*) + 1.0)::DOUBLE FROM documents) / "
        f"(df.df{b} + 1.0)))::DOUBLE AS t{b}"
        for b in range(dim)
    )
    dfs = ", ".join(
        f"sum(CASE WHEN b{b} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{b}"
        for b in range(dim)
    )
    return f"""
        WITH tf AS ({sql_hashed_tf(dim)}),
        df AS (SELECT {dfs} FROM tf)
        SELECT doc_id, {weights} FROM tf, df
    """


def corpus_bucket_totals(docs, dim: int = DIM) -> tuple[int, list[int]]:
    """(total token count, per-bucket occurrence totals) — the unigram
    "LM training" pass over the hashed vocabulary: a constant-size
    reduce exactly like :func:`corpus_df`, but counting occurrences."""

    def partial(batch: pa.Table) -> pa.Table:
        tf = hashed_tf_batch(batch, dim=dim)
        cols = {}
        total = 0
        for b in range(dim):
            s = int(
                tf.column(f"b{b}").to_numpy(zero_copy_only=False).sum()
            ) if len(tf) else 0
            cols[f"c{b}"] = pa.array([s], type=pa.int64())
            total += s
        cols["total"] = pa.array([total], type=pa.int64())
        return pa.table(cols)

    agg = docs.map_batches(partial, batch_format="pyarrow").sum(
        [f"c{b}" for b in range(dim)] + ["total"]
    )
    return int(agg["sum(total)"]), [int(agg[f"sum(c{b})"]) for b in range(dim)]


def lm_score(docs, dim: int = DIM):
    """documents → (doc_id, n_tokens, logprob, avg_logprob): unigram
    language-model quality score over the hashed vocabulary — the shape
    of CCNet's perplexity filter with the n-gram LM replaced by the
    corpus's own unigram distribution over ``dim`` hash buckets.

    Two streaming passes: the constant-size count reduce ("training"),
    then a stateless scoring map with the ``dim`` log-probabilities
    shipped as literals.  The hashed vocabulary is what makes this
    corpus-size-independent: a real 10^8-type vocabulary would need a
    broadcast table, a 2^16-bucket hash needs 512 KB however large the
    corpus.  Floats are oracle-EXACT: the per-doc sum accumulates
    bucket-by-bucket in fixed order, matching SQL's left-associative
    ``+`` chain, and ``math.log`` ≡ DuckDB ``ln`` on equal doubles."""
    import math

    total, counts = corpus_bucket_totals(docs, dim=dim)
    logp = [
        math.log(c / total) if c > 0 and total > 0 else 0.0 for c in counts
    ]

    def score(batch: pa.Table) -> pa.Table:
        tf = hashed_tf_batch(batch, dim=dim)
        mat = [
            tf.column(f"b{b}").to_numpy(zero_copy_only=False)
            for b in range(dim)
        ]
        n_tokens = np.zeros(len(tf), dtype=np.int64)
        for col in mat:
            n_tokens += col
        acc = np.zeros(len(tf), dtype=np.float64)
        for b in range(dim):  # fixed order == SQL's left-assoc sum
            acc = acc + mat[b].astype(np.float64) * logp[b]
        avg = np.where(n_tokens > 0, acc / np.maximum(n_tokens, 1), 0.0)
        return pa.table(
            {
                "doc_id": tf.column("doc_id"),
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "logprob": pa.array(acc, type=pa.float64()),
                "avg_logprob": pa.array(avg, type=pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def sql_lm_score(dim: int = DIM) -> str:
    """DuckDB twin of :func:`lm_score`: same buckets, same fixed-order
    float accumulation."""
    lp = ", ".join(
        f"CASE WHEN sum(b{b}) > 0 AND sum(b0"
        + "".join(f" + b{j}" for j in range(1, dim))
        + f") > 0 THEN ln(sum(b{b})::DOUBLE / sum(b0"
        + "".join(f" + b{j}" for j in range(1, dim))
        + f")::DOUBLE) ELSE 0.0 END AS lp{b}"
        for b in range(dim)
    )
    ntok = " + ".join(f"b{b}" for b in range(dim))
    acc = " + ".join(f"b{b} * lp{b}" for b in range(dim))
    return f"""
        WITH tf AS ({sql_hashed_tf(dim)}),
        lm AS (SELECT {lp} FROM tf)
        SELECT doc_id, ({ntok})::BIGINT AS n_tokens,
               ({acc})::DOUBLE AS logprob,
               CASE WHEN {ntok} > 0
                    THEN ({acc}) / ({ntok})::DOUBLE ELSE 0.0 END
                 AS avg_logprob
        FROM tf, lm
    """


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

DSIR_TARGET_LANG = "en"
DSIR_KEEP_K = 100


def dsir_scores(docs, dim: int = DIM, target_lang: str = DSIR_TARGET_LANG):
    """documents → (doc_id, n_tokens, log_ratio, avg_log_ratio): hashed
    n-gram importance weights ``log p_target − log p_raw`` — Data
    Selection via Importance Resampling (DSIR, Xie et al. 2023) with
    the feature distributions estimated as hashed UNIGRAM LMs (the
    paper's hashed-ngram estimator at n=1).  ``p_target`` trains on the
    docs whose ``lang`` equals ``target_lang``; ``p_raw`` on the whole
    corpus.

    Three streaming passes, each reducing to ``dim`` scalars (two LM
    "trainings", then a stateless scoring map with the per-bucket log
    ratios shipped as literals) — no shuffle, no broadcast table, the
    same corpus-size-independent shape as :func:`lm_score`.  Buckets
    unseen in either distribution contribute 0 (the engine's explicit
    smoothing rule, mirrored by the SQL twin's CASE).  Floats are
    oracle-EXACT: fixed-order accumulation + libm ``log`` ≡ DuckDB
    ``ln``.
    """
    import math

    import pyarrow.compute as pc

    target = docs.map_batches(
        lambda t, lang=target_lang: t.filter(
            pc.equal(t.column("lang"), lang)
        ),
        batch_format="pyarrow",
    )
    t_total, t_counts = corpus_bucket_totals(target, dim=dim)
    r_total, r_counts = corpus_bucket_totals(docs, dim=dim)
    logr = [
        (math.log(tc / t_total) - math.log(rc / r_total))
        if tc > 0 and t_total > 0 and rc > 0 and r_total > 0
        else 0.0
        for tc, rc in zip(t_counts, r_counts)
    ]

    def score(batch: pa.Table) -> pa.Table:
        tf = hashed_tf_batch(batch, dim=dim)
        mat = [
            tf.column(f"b{b}").to_numpy(zero_copy_only=False)
            for b in range(dim)
        ]
        n_tokens = np.zeros(len(tf), dtype=np.int64)
        for col in mat:
            n_tokens += col
        acc = np.zeros(len(tf), dtype=np.float64)
        for b in range(dim):  # fixed order == SQL's left-assoc sum
            acc = acc + mat[b].astype(np.float64) * logr[b]
        avg = np.where(n_tokens > 0, acc / np.maximum(n_tokens, 1), 0.0)
        return pa.table(
            {
                "doc_id": tf.column("doc_id"),
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "log_ratio": pa.array(acc, type=pa.float64()),
                "avg_log_ratio": pa.array(avg, type=pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_select(docs, k: int = DSIR_KEEP_K, dim: int = DIM,
                target_lang: str = DSIR_TARGET_LANG):
    """documents → the ``k`` most target-like docs by DSIR weight
    (avg_log_ratio DESC, doc_id ASC — deterministic, so the SQL twin is
    a plain ORDER BY ... LIMIT).  Selection is a per-block partial
    top-k then one tiny merge (``n_blocks × k`` rows through a
    ``repartition(1)``) — the same no-sort pattern as
    ``similarity.knn_topk``; nothing corpus-sized moves."""

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        avg = t.column("avg_log_ratio").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -avg))[:k]
        return t.take(pa.array(np.sort(order), type=pa.int64()))

    scored = dsir_scores(docs, dim=dim, target_lang=target_lang)
    return (
        scored.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    )


def sql_dsir_scores(dim: int = DIM,
                    target_lang: str = DSIR_TARGET_LANG) -> str:
    """DuckDB twin of :func:`dsir_scores`: same buckets, same CASE
    smoothing, same fixed-order float accumulation."""
    csum = ", ".join(f"sum(b{b})::BIGINT AS c{b}" for b in range(dim))
    tot = "sum(" + " + ".join(f"b{b}" for b in range(dim)) + ")::BIGINT"
    w = ", ".join(
        f"CASE WHEN tgt.c{b} > 0 AND tgt.total > 0"
        f" AND raw.c{b} > 0 AND raw.total > 0"
        f" THEN ln(tgt.c{b}::DOUBLE / tgt.total::DOUBLE)"
        f" - ln(raw.c{b}::DOUBLE / raw.total::DOUBLE)"
        f" ELSE 0.0 END AS w{b}"
        for b in range(dim)
    )
    ntok = " + ".join(f"b{b}" for b in range(dim))
    acc = " + ".join(f"b{b} * w{b}" for b in range(dim))
    return f"""
        WITH tf AS ({sql_hashed_tf(dim)}),
        tgt AS (SELECT {csum}, {tot} AS total
                FROM tf JOIN documents USING (doc_id)
                WHERE lang = '{target_lang}'),
        raw AS (SELECT {csum}, {tot} AS total FROM tf),
        w AS (SELECT {w} FROM tgt, raw)
        SELECT doc_id, ({ntok})::BIGINT AS n_tokens,
               ({acc})::DOUBLE AS log_ratio,
               CASE WHEN {ntok} > 0
                    THEN ({acc}) / ({ntok})::DOUBLE ELSE 0.0 END
                 AS avg_log_ratio
        FROM tf, w
    """


def sql_dsir_select(k: int = DSIR_KEEP_K, dim: int = DIM,
                    target_lang: str = DSIR_TARGET_LANG) -> str:
    """DuckDB twin of :func:`dsir_select`: the scores are bit-exact, so
    the deterministic (avg DESC, doc_id ASC) top-k is a plain LIMIT."""
    return f"""
        SELECT * FROM ({sql_dsir_scores(dim, target_lang)})
        ORDER BY avg_log_ratio DESC, doc_id ASC LIMIT {k}
    """


def _dsir_gumbel_key(doc_id: int, log_ratio: float) -> float:
    """Deterministic Gumbel-perturbed key: ``log w + G`` where
    ``G = −ln(−ln(u))`` and ``u ∈ (0,1)`` derives from md5 of the doc
    id.  Every step is bit-identical in DuckDB: the md5-prefix integer
    mod ``2⁵³−1`` (+1) is exact, division by 2⁵³ is exact (power-of-two
    denominator), and libm ``log`` ≡ DuckDB ``ln`` on equal doubles
    (``np.log``'s SIMD path differs in the last ulp — hence the scalar
    loop; one call per DOC, not per token)."""
    import math

    h = int.from_bytes(
        hashlib.md5(f"dsir:{doc_id}".encode("utf-8")).digest()[:8], "big"
    )
    u = (h % ((1 << 53) - 1) + 1) / float(1 << 53)
    return log_ratio + (-math.log(-math.log(u)))


def dsir_sample(docs, k: int = DSIR_KEEP_K, dim: int = DIM,
                target_lang: str = DSIR_TARGET_LANG):
    """documents → k docs drawn by Gumbel-top-k importance resampling —
    the paper-faithful DSIR sampler (sampling WITHOUT replacement with
    probability ∝ exp(log w), via the Gumbel-max trick), made
    deterministic by deriving the Gumbel noise from md5(doc_id) so the
    SQL twin is a plain ORDER BY.

    Same plan shape as :func:`dsir_select`: the scoring map appends the
    perturbed key, a per-block partial top-k keeps ``k`` candidates per
    block, and one tiny merge finishes — nothing corpus-sized moves and
    every float is bit-exact cross-engine."""

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        lr = t.column("log_ratio").to_pylist()
        key = [_dsir_gumbel_key(i, r) for i, r in zip(ids, lr)]
        return t.append_column("key", pa.array(key, type=pa.float64()))

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        key = t.column("key").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[:k]
        return t.take(pa.array(np.sort(order), type=pa.int64()))

    scored = dsir_scores(docs, dim=dim, target_lang=target_lang)
    return (
        scored.map_batches(add_key, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    )


def sql_dsir_sample(k: int = DSIR_KEEP_K, dim: int = DIM,
                    target_lang: str = DSIR_TARGET_LANG) -> str:
    """DuckDB twin of :func:`dsir_sample`: the identical md5-derived
    Gumbel key (integer mod + exact power-of-two division + ln chain),
    then ORDER BY key DESC, doc_id LIMIT k."""
    u = (
        "((('0x' || substr(md5('dsir:' || doc_id::VARCHAR), 1, 16))"
        "::UBIGINT % 9007199254740991::UBIGINT + 1)::DOUBLE"
        " / 9007199254740992.0)"
    )
    return f"""
        WITH s AS ({sql_dsir_scores(dim, target_lang)})
        SELECT doc_id, n_tokens, log_ratio, avg_log_ratio,
               (log_ratio + (-ln(-ln({u}))))::DOUBLE AS key
        FROM s
        ORDER BY key DESC, doc_id ASC LIMIT {k}
    """


# ---------------------------------------------------------------------------
# CCNet-style per-language perplexity bucketing (head / middle / tail)
# ---------------------------------------------------------------------------

CCNET_BUCKETS = ("tail", "middle", "head")


def _float_to_ordered_u64(scores: np.ndarray) -> np.ndarray:
    """IEEE-754 double → uint64 whose unsigned order equals float order
    (the classic radix-sort key transform: flip all bits of negatives,
    flip only the sign bit of non-negatives)."""
    b = scores.astype(np.float64).view(np.uint64)
    sign = b >> np.uint64(63)
    return np.where(sign == 1, ~b, b | np.uint64(1 << 63))


def _ordered_u64_to_float(u: int) -> float:
    if u & (1 << 63):
        b = u ^ (1 << 63)
    else:
        b = (~u) & 0xFFFFFFFFFFFFFFFF
    return float(np.array([b], dtype=np.uint64).view(np.float64)[0])


def grouped_order_stats(proj, targets: list[tuple[int, int, int]]) -> list[int]:
    """Exact k-th smallest per group by distributed radix refinement.

    ``proj``: Dataset of (gk: int64 group key, u: int64 holding the
    order-mapped uint64 of the value).  ``targets``: (tid, gk, k) with
    1-based rank ``k``.  Returns the selected ordered-uint64 per target
    (same order as ``targets``).

    Four passes over the projection, one 16-bit window of the key per
    pass: each pass histograms the window for rows matching every
    target's already-fixed high bits (per-block numpy combine →
    ``hash_grouped`` sum → ≤ |targets|·65536-row driver reduce), then
    fixes the window's bits and re-bases the remaining rank.  After the
    last window the full 64-bit key IS the k-th value — no per-group
    value set ever lands on one worker, which is what makes per-language
    quantiles safe when one language is 90% of a 100 TB corpus (the
    grouped_quantiles operator's per-key-fits-one-partition contract
    does not hold there).
    """
    from ..shuffle import hash_grouped

    prefixes = {tid: 0 for tid, _, _ in targets}
    rank_left = {tid: k for tid, _, k in targets}
    tids = [t[0] for t in targets]
    gks = {tid: gk for tid, gk, _ in targets}

    for shift in (48, 32, 16, 0):
        snap_pref = dict(prefixes)
        snap_left = dict(rank_left)
        high = shift + 16

        def hist(batch: pa.Table, shift=shift, high=high,
                 snap=snap_pref) -> pa.Table:
            out_t, out_b, out_c = [], [], []
            if len(batch):
                gk_col = batch.column("gk").to_numpy(zero_copy_only=False)
                u = batch.column("u").to_numpy(
                    zero_copy_only=False
                ).view(np.uint64)
                for tid in tids:
                    mask = gk_col == gks[tid]
                    if high < 64:
                        mask = mask & (
                            (u >> np.uint64(high))
                            == np.uint64(snap[tid] >> high)
                        )
                    if not mask.any():
                        continue
                    w = (u[mask] >> np.uint64(shift)) & np.uint64(0xFFFF)
                    bucket, cnt = np.unique(
                        w.astype(np.int64), return_counts=True
                    )
                    out_t.append(np.full(len(bucket), tid, dtype=np.int64))
                    out_b.append(bucket)
                    out_c.append(cnt.astype(np.int64))
            cat = (
                lambda xs: np.concatenate(xs)
                if xs
                else np.array([], dtype=np.int64)
            )
            return pa.table(
                {
                    "tid": pa.array(cat(out_t), type=pa.int64()),
                    "bucket": pa.array(cat(out_b), type=pa.int64()),
                    "cnt": pa.array(cat(out_c), type=pa.int64()),
                }
            )

        combined = hash_grouped(
            proj.map_batches(hist, batch_format="pyarrow"),
            ["tid", "bucket"],
            [("cnt", "sum")],
            rename={"cnt_sum": "cnt"},
        ).take_all()
        by_tid: dict[int, list[tuple[int, int]]] = {t: [] for t in tids}
        for r in combined:
            by_tid[r["tid"]].append((r["bucket"], r["cnt"]))
        for tid in tids:
            cum = 0
            for bucket, cnt in sorted(by_tid[tid]):
                if snap_left[tid] <= cum + cnt:
                    prefixes[tid] = snap_pref[tid] | (bucket << shift)
                    rank_left[tid] = snap_left[tid] - cum
                    break
                cum += cnt
            else:
                raise ValueError(
                    f"grouped_order_stats: rank {snap_left[tid]} exceeds "
                    f"group size for target {tid}"
                )
    return [prefixes[tid] for tid in tids]


def ccnet_buckets(docs, dim: int = DIM):
    """documents → (doc_id, lang, score, bucket): CCNet's per-language
    head/middle/tail split on the unigram-LM quality score
    (:func:`lm_score`'s ``avg_logprob``; higher = more typical = lower
    perplexity = ``head``).  Thresholds are the EXACT per-language
    tercile order statistics (ranks ⌈n/3⌉ and ⌈2n/3⌉ ascending), found
    by :func:`grouped_order_stats` — the whole plan exchanges only
    constant-size histograms, so a 90%-one-language corpus costs the
    same as a balanced one.  The bucket is a pure function of (score,
    thresholds): deterministic under ties at any parallelism, and the
    DuckDB twin (row_number replay) hash-matches bit for bit because the
    scores themselves are oracle-exact.
    """
    import math

    from ..kernels.cleaning import surface_hash64

    total, counts = corpus_bucket_totals(docs, dim=dim)
    logp = [
        math.log(c / total) if c > 0 and total > 0 else 0.0 for c in counts
    ]

    def score_fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tf = hashed_tf_batch(batch, dim=dim)
        n = len(tf)
        n_tokens = np.zeros(n, dtype=np.int64)
        acc = np.zeros(n, dtype=np.float64)
        mats = [
            tf.column(f"b{b}").to_numpy(zero_copy_only=False)
            for b in range(dim)
        ]
        for col in mats:
            n_tokens += col
        for b in range(dim):  # fixed order == SQL's left-assoc sum
            acc = acc + mats[b].astype(np.float64) * logp[b]
        avg = np.where(n_tokens > 0, acc / np.maximum(n_tokens, 1), 0.0)
        langs = batch.column("lang")
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        d = pc.dictionary_encode(langs)
        uniq = pa.array(
            [surface_hash64(s) for s in d.dictionary.to_pylist()],
            type=pa.int64(),
        )
        return pa.table(
            {
                "doc_id": tf.column("doc_id"),
                "lang": langs,
                "gk": pc.take(uniq, d.indices),
                "score": pa.array(avg, type=pa.float64()),
            }
        )

    # Narrow scored projection, materialized ONCE: the selection makes 4
    # passes, and re-running the scoring map per pass would recompute
    # hashed-TF 4×.  This is a ~28 B/row int projection — 3-4 orders of
    # magnitude under the text column the module's no-materialize rule
    # protects (1e9 docs ≈ 28 GB across the cluster's object store).
    scored = docs.map_batches(score_fn, batch_format="pyarrow").materialize()

    def to_proj(t: pa.Table) -> pa.Table:
        s = t.column("score").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gk": t.column("gk"),
                "u": pa.array(
                    _float_to_ordered_u64(s).view(np.int64), type=pa.int64()
                ),
            }
        )

    proj = scored.map_batches(to_proj, batch_format="pyarrow")

    lang_counts: dict[str, int] = {}
    lang_gk: dict[str, int] = {}
    for r in (
        scored.map_batches(
            lambda t: t.select(["lang", "gk"])
            .group_by(["lang", "gk"])
            .aggregate([([], "count_all")]),
            batch_format="pyarrow",
        ).take_all()
    ):  # ≤ |langs| rows per block — constant-size
        lang_counts[r["lang"]] = lang_counts.get(r["lang"], 0) + r["count_all"]
        lang_gk[r["lang"]] = r["gk"]

    targets = []
    order = []
    for i, (lang, n) in enumerate(sorted(lang_counts.items())):
        targets.append((2 * i, lang_gk[lang], (n + 2) // 3))
        targets.append((2 * i + 1, lang_gk[lang], (2 * n + 2) // 3))
        order.append(lang)
    sel = grouped_order_stats(proj, targets)
    thresholds = {
        lang: (
            _ordered_u64_to_float(sel[2 * i]),
            _ordered_u64_to_float(sel[2 * i + 1]),
        )
        for i, lang in enumerate(order)
    }

    def assign(t: pa.Table) -> pa.Table:
        s = t.column("score").to_numpy(zero_copy_only=False)
        langs = t.column("lang").to_pylist()
        t1 = np.fromiter(
            (thresholds[x][0] for x in langs), dtype=np.float64, count=len(s)
        )
        t2 = np.fromiter(
            (thresholds[x][1] for x in langs), dtype=np.float64, count=len(s)
        )
        bucket = np.where(s <= t1, "tail", np.where(s <= t2, "middle", "head"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "score": t.column("score"),
                "bucket": pa.array(bucket.astype(object), type=pa.string()),
            }
        )

    return scored.map_batches(assign, batch_format="pyarrow")


def sql_ccnet_buckets(dim: int = DIM) -> str:
    """DuckDB twin of :func:`ccnet_buckets`: identical scores
    (``sql_lm_score``), thresholds via row_number order statistics at
    ranks ⌈n/3⌉ / ⌈2n/3⌉, identical CASE comparisons."""
    return f"""
        WITH lm AS ({sql_lm_score(dim)}),
        s AS (SELECT d.doc_id, d.lang, lm.avg_logprob AS score
              FROM lm JOIN documents d USING (doc_id)),
        n AS (SELECT lang, count(*)::BIGINT AS n FROM s GROUP BY lang),
        r AS (SELECT lang, score,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY score) AS rk
              FROM s),
        t AS (SELECT r.lang,
                     max(CASE WHEN rk = (n.n + 2) // 3
                              THEN score END) AS t1,
                     max(CASE WHEN rk = (2 * n.n + 2) // 3
                              THEN score END) AS t2
              FROM r JOIN n USING (lang) GROUP BY r.lang)
        SELECT s.doc_id, s.lang, s.score,
               CASE WHEN s.score <= t.t1 THEN 'tail'
                    WHEN s.score <= t.t2 THEN 'middle'
                    ELSE 'head' END AS bucket
        FROM s JOIN t USING (lang)
    """


# ---------------------------------------------------------------------------
# distributed quality-classifier TRAINING (logistic regression, the
# DataComp/CCNet "train a fasttext-style filter on the corpus" stage)
# ---------------------------------------------------------------------------

TRAIN_ROUNDS = 6
TRAIN_LR = 0.01
#: per-sample gradients quantize to 2^-24 fixed point before the global
#: sum, so the reduction is COMMUTATIVE int64 arithmetic — the PageRank
#: fixed-point-mass discipline applied to SGD (full-batch deterministic
#: gradient descent; "stochastic" ordering would be parallelism-
#: dependent, which is exactly what this engine refuses to ship)
GRAD_Q = float(1 << 24)


def _label_and_features_batch(batch: pa.Table, dim: int) -> pa.Table:
    """documents → (doc_id, y, b0..b{dim-1}): hashed-TF features + the
    training label (y = 1.0 for English pages — the corpus's own
    language column, the classic "seed set vs rest" quality-classifier
    setup)."""
    tf = hashed_tf_batch(batch, dim=dim)
    y = [
        1.0 if lang == "en" else 0.0
        for lang in batch.column("lang").to_pylist()
    ]
    cols = {"doc_id": tf.column("doc_id"), "y": pa.array(y, type=pa.float64())}
    for b in range(dim):
        cols[f"b{b}"] = tf.column(f"b{b}")
    return pa.table(cols)


def _grad_partial_batch(batch: pa.Table, w: list, dim: int) -> pa.Table:
    """One block's quantized-gradient partial: per row the logistic
    error ``p_err = σ(x·w) − y`` (margin accumulated LEFT-TO-RIGHT over
    the dim columns, σ via libm ``math.exp`` — both replayed verbatim
    by the SQL twin), then per coordinate ``floor((p_err·x_b)·Q)``
    summed over the block.  Emits ONE row (k=0, g0..g{dim-1})."""
    import math

    cols = {"k": pa.array([0], type=pa.int64())}
    if len(batch) == 0:
        for b in range(dim):
            cols[f"g{b}"] = pa.array([0], type=pa.int64())
        cols["lf"] = pa.array([0], type=pa.int64())
        return pa.table(cols)
    x = np.column_stack(
        [
            batch.column(f"b{b}").to_numpy(zero_copy_only=False)
            for b in range(dim)
        ]
    ).astype(np.float64)
    yv = batch.column("y").to_numpy(zero_copy_only=False)
    m = x[:, 0] * w[0]
    for b in range(1, dim):
        m = m + x[:, b] * w[b]
    # libm exp row-by-row: numpy's SIMD exp can differ from DuckDB's
    # libm by 1 ulp, which would break the bit-exact float contract
    p = np.fromiter(
        (1.0 / (1.0 + math.exp(-v)) for v in m),
        dtype=np.float64,
        count=len(m),
    )
    perr = p - yv
    for b in range(dim):
        g = np.floor((perr * x[:, b]) * GRAD_Q).astype(np.int64)
        cols[f"g{b}"] = pa.array([int(g.sum())], type=pa.int64())
    # the round's training loss in the SAME pass (pre-update weights):
    # per-row −ln(p or 1−p), floor-quantized so the global sum commutes
    lf = sum(
        math.floor(
            -math.log(max(pi if yi == 1.0 else 1.0 - pi, 1e-308))
            * GRAD_Q
        )
        for pi, yi in zip(p, yv)
    )
    cols["lf"] = pa.array([int(lf)], type=pa.int64())
    return pa.table(cols)


def train_linear_classifier(
    docs,
    n_rounds: int = TRAIN_ROUNDS,
    lr: float = TRAIN_LR,
    dim: int = DIM,
    num_partitions: int | None = None,
):
    """documents → (round, w0..w{dim-1}): ``n_rounds`` of full-batch
    deterministic logistic-regression training over hashed-TF features
    — the "train your own quality filter on the corpus" stage of a
    DataComp/CCNet-style pipeline, as a distributed iterative loop in
    the BPE-trainer shape:

    - the corpus collapses ONCE into the (doc_id, y, features) table
      (materialized — row-count × (dim+2) ints, columnar-narrow; at
      10^12 docs a disk-backed hand-off replaces the pin, the same
      trade the release pipeline documents);
    - each round is one streaming pass emitting ONE quantized-gradient
      partial row per block plus a single tiny CHECKED int64 exchange
      (``hash_grouped(checked=True)`` — a gradient sum leaving int64
      raises instead of wrapping);
    - the weight update runs on the driver over dim scalars and ships
      to the next round as a task literal — never a broadcast table.

    Every float expression (margin accumulation order, libm σ, the
    ``w − lr·((g/Q)/n)`` update) is replayed verbatim by
    :func:`sql_train_linear_classifier`, so the weight trajectory is
    bit-exact against DuckDB."""
    import ray.data

    from ..shuffle import hash_grouped

    feats = docs.map_batches(
        _label_and_features_batch,
        fn_kwargs={"dim": dim},
        batch_format="pyarrow",
    ).materialize()
    n = feats.count()
    w = [0.0] * dim
    rows = []
    for r in range(n_rounds):
        partial = feats.map_batches(
            _grad_partial_batch,
            fn_kwargs={"w": list(w), "dim": dim},
            batch_format="pyarrow",
        )
        total = hash_grouped(
            partial,
            ["k"],
            [(f"g{b}", "sum") for b in range(dim)] + [("lf", "sum")],
            rename={
                **{f"g{b}_sum": f"g{b}" for b in range(dim)},
                "lf_sum": "lf",
            },
            num_partitions=1,
            checked=True,
        ).take_all()[0]
        loss = (int(total["lf"]) / GRAD_Q) / n
        w = [
            w[b] - lr * ((int(total[f"g{b}"]) / GRAD_Q) / n)
            for b in range(dim)
        ]
        rows.append((r, loss, list(w)))
    cols = {
        "round": pa.array([r for r, _, _ in rows], type=pa.int64()),
        "loss": pa.array([lv for _, lv, _ in rows], type=pa.float64()),
    }
    for b in range(dim):
        cols[f"w{b}"] = pa.array(
            [wv[b] for _, _, wv in rows], type=pa.float64()
        )
    return ray.data.from_arrow(pa.table(cols))


def sql_train_linear_classifier(
    n_rounds: int = TRAIN_ROUNDS, lr: float = TRAIN_LR, dim: int = DIM
) -> str:
    """DuckDB twin of :func:`train_linear_classifier`: the feature
    table once, then per round one error CTE (identical left-to-right
    margin + ``1/(1+exp(−m))``), dim quantized-gradient sums, and the
    identical update expression — weights bit-exact per round."""
    margin = " + ".join(f"f.b{b} * w.w{b}" for b in range(dim))
    parts = [
        f"""f AS MATERIALIZED (
          SELECT t.*, CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM ({sql_hashed_tf(dim)}) t
          JOIN documents d USING (doc_id))""",
        """nn AS (SELECT count(*)::BIGINT AS n FROM f)""",
        "w0 AS (SELECT "
        + ", ".join(f"0.0 AS w{b}" for b in range(dim))
        + ")",
    ]
    for r in range(n_rounds):
        parts.append(
            f"""p{r} AS MATERIALIZED (
          SELECT f.*, 1.0 / (1.0 + exp(-({margin}))) AS p
          FROM f, w{r} w)"""
        )
        gsums = ", ".join(
            f"sum(floor(((p - y) * b{b}) * {GRAD_Q!r}))::BIGINT AS g{b}"
            for b in range(dim)
        )
        parts.append(
            f"""g{r} AS (SELECT {gsums},
          sum(floor(-ln(greatest(
                CASE WHEN y = 1.0 THEN p ELSE 1.0 - p END,
                1e-308)) * {GRAD_Q!r}))::BIGINT AS lf
          FROM p{r})"""
        )
        upd = ", ".join(
            f"w.w{b} - {lr!r} * ((g.g{b} / {GRAD_Q!r}) / nn.n) AS w{b}"
            for b in range(dim)
        )
        parts.append(
            f"""w{r + 1} AS (SELECT (g.lf / {GRAD_Q!r}) / nn.n AS loss,
          {upd}
          FROM w{r} w, g{r} g, nn)"""
        )
    out = "\n          UNION ALL ".join(
        f"SELECT {r}::BIGINT AS round, * FROM w{r + 1}"
        for r in range(n_rounds)
    )
    return "\n        WITH " + ",\n        ".join(parts) + f"\n        {out}\n    "


def score_with_trained(
    docs,
    n_rounds: int = TRAIN_ROUNDS,
    lr: float = TRAIN_LR,
    dim: int = DIM,
):
    """documents → (doc_id, prob, keep): the full learned-filter loop —
    train the logistic quality classifier on the corpus
    (:func:`train_linear_classifier`), then score every document with
    the FINAL weights in one exchange-free streaming pass (weights ship
    as a task literal; σ via libm ``math.exp`` row-wise, the same float
    contract as training).  ``keep = prob > 0.5`` is the filter
    decision a curation pipeline acts on."""
    import math

    trained = train_linear_classifier(
        docs, n_rounds=n_rounds, lr=lr, dim=dim
    ).take_all()
    last = max(trained, key=lambda r: r["round"])
    w = [float(last[f"w{b}"]) for b in range(dim)]

    def score(batch: pa.Table) -> pa.Table:
        tf = hashed_tf_batch(batch, dim=dim)
        if len(tf) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "prob": pa.array([], type=pa.float64()),
                    "keep": pa.array([], type=pa.bool_()),
                }
            )
        x = np.column_stack(
            [
                tf.column(f"b{b}").to_numpy(zero_copy_only=False)
                for b in range(dim)
            ]
        ).astype(np.float64)
        m = x[:, 0] * w[0]
        for b in range(1, dim):
            m = m + x[:, b] * w[b]
        prob = np.fromiter(
            (1.0 / (1.0 + math.exp(-v)) for v in m),
            dtype=np.float64,
            count=len(m),
        )
        return pa.table(
            {
                "doc_id": tf.column("doc_id"),
                "prob": pa.array(prob, type=pa.float64()),
                "keep": pa.array(prob > 0.5, type=pa.bool_()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def sql_score_with_trained(
    n_rounds: int = TRAIN_ROUNDS, lr: float = TRAIN_LR, dim: int = DIM
) -> str:
    """DuckDB twin of :func:`score_with_trained`: the training chain's
    final weight CTE joined (1-row cross) onto the hashed-TF table,
    identical margin order and σ."""
    train = sql_train_linear_classifier(n_rounds=n_rounds, lr=lr, dim=dim)
    # reuse the training WITH chain by nesting it: its SELECT returns
    # (round, loss, w0..) — take the final round's weights
    margin = " + ".join(f"t.b{b} * w.w{b}" for b in range(dim))
    return f"""
        WITH trained AS MATERIALIZED ({train}),
        wfin AS (SELECT * FROM trained
                 ORDER BY round DESC LIMIT 1),
        sc AS (
          SELECT t.doc_id,
                 1.0 / (1.0 + exp(-({margin}))) AS prob
          FROM ({sql_hashed_tf(dim)}) t, wfin w)
        SELECT doc_id, prob, prob > 0.5 AS keep FROM sc
    """
