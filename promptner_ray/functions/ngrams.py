"""Corpus-level n-gram statistics: global counts and top-k.

The building block behind contamination audits, boilerplate detection
(a 3-gram appearing in 10% of pages is chrome, not content) and
classical LM estimation.  At 100 TB the naive plan — explode every
window and shuffle the strings — moves more bytes than the corpus
itself; this plan never ships a gram that a block has already counted:

1. **map-side combine** — per block, explode windows and collapse them
   with one vectorized ``pa.Table.group_by``: what leaves the block is
   one (gram, partial-count) row per *distinct-in-block* gram, the
   classic combiner that shrinks the exchange by the in-block repeat
   factor (boilerplate-heavy web text: 5-50×);
2. **hash-partitioned sum** — ``shuffle.hash_grouped`` on an int64
   blake2b digest of the gram (the string key never drives the
   exchange machinery), one C++ group_by per partition;
3. (top-k only) **per-partition candidate cut** — every global top-k
   gram is a top-k gram of whichever partition holds it, so each
   partition's block emits only its local top-k and the final exact
   ``sort().limit()`` sees ≤ partitions × k rows — constant driver
   work at any corpus size.

Windows are strict full n-token windows over ``text.split(" ")`` —
identical to the decontamination module — so the DuckDB oracle is a
plain ``generate_series``-windowed GROUP BY.  Tie-break for top-k is
the total order (count DESC, gram ASC) on BOTH sides.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

NGRAM_N = 3
TOP_K = 50


def _gram_count_batch(batch: pa.Table, n: int) -> pa.Table:
    """Block combiner: every full n-gram window occurrence, collapsed to
    (gram, n, g_key) with one vectorized group_by; g_key is computed
    only per distinct-in-block gram.

    Window construction is Arrow-native: the windows over the flattened
    token stream are ``binary_join_element_wise`` of ``n`` shifted
    slices, masked to positions whose whole window stays inside one
    document — no per-window Python."""
    import numpy as np
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "gram": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "g_key": pa.array([], type=pa.int64()),
        }
    )
    if len(batch) == 0:
        return empty
    tok_lists = pc.split_pattern(batch.column("text").combine_chunks(), " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    flat = tok_lists.values
    if len(flat) < n:
        return empty
    offsets = np.asarray(tok_lists.offsets).astype(np.int64)
    counts = offsets[1:] - offsets[:-1]
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    total = len(flat)
    # window start positions whose last token is still in the same doc
    pos = np.arange(total - n + 1)
    valid = parent[pos] == parent[pos + n - 1]
    starts = pos[valid]
    if len(starts) == 0:
        return empty
    parts = [
        pc.take(flat, pa.array(starts + j, type=pa.int64()))
        for j in range(n)
    ]
    gram_arr = parts[0] if n == 1 else pc.binary_join_element_wise(
        *parts, " "
    )
    local = (
        pa.table({"gram": gram_arr})
        .group_by(["gram"])
        .aggregate([([], "count_all")])
    )
    keys = [
        int.from_bytes(
            hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(),
            "big",
            signed=True,
        )
        for g in local.column("gram").to_pylist()
    ]
    return pa.table(
        {
            "gram": local.column("gram"),
            "n": local.column("count_all").cast(pa.int64()),
            "g_key": pa.array(keys, type=pa.int64()),
        }
    )


def ngram_counts(docs, n: int = NGRAM_N, num_partitions: int | None = None):
    """documents → (gram, n): global occurrence count of every full
    word n-gram window (repeats within a doc count each time)."""
    from ..shuffle import hash_grouped

    partial = docs.map_batches(
        _gram_count_batch, fn_kwargs={"n": n}, batch_format="pyarrow"
    )
    return hash_grouped(
        partial,
        ["gram"],
        [("n", "sum")],
        rename={"n_sum": "n"},
        hash_cols=["g_key"],
        num_partitions=num_partitions,
    )


def _topk_cut_batch(batch: pa.Table, k: int) -> pa.Table:
    """Local candidate cut: the global top-k under (n DESC, gram ASC) is
    a subset of each batch's top-k, so emitting only those k rows keeps
    the final exact sort constant-size."""
    if len(batch) <= k:
        return batch
    idx = pc.sort_indices(
        batch,
        sort_keys=[("n", "descending"), ("gram", "ascending")],
    )
    return batch.take(idx[:k])


def top_ngrams(
    docs,
    n: int = NGRAM_N,
    k: int = TOP_K,
    num_partitions: int | None = None,
):
    """documents → the k most frequent word n-grams, exact, under the
    total order (count DESC, gram ASC)."""
    counts = ngram_counts(docs, n=n, num_partitions=num_partitions)
    cut = counts.map_batches(
        _topk_cut_batch, fn_kwargs={"k": k}, batch_format="pyarrow"
    )
    return cut.sort(["n", "gram"], descending=[True, False]).limit(k)


def token_counts_salted(
    docs,
    n_salts: int = 8,
    sample_fraction: float = 0.02,
    threshold_frac: float = 0.01,
    num_partitions: int | None = None,
):
    """documents → (gram, n) exact global token counts, via the DYNAMIC
    salted-shuffle plan for Zipf-skewed keys:

    1. **candidate discovery** — deterministic hash-sample of documents
       (:func:`..sampling.hash_sample`), distinct tokens to the driver
       (bounded by the sample's vocabulary; any truly hot token appears
       in a 2% sample with near-certainty);
    2. **hot detection** — one streaming count-min pass over the FULL
       token stream (:func:`..sketch.hot_keys`): candidates whose
       estimated frequency exceeds ``threshold_frac`` of all tokens
       become the hot set — no exact count, no extra shuffle;
    3. **salted aggregate** — the per-block combine from
       :func:`ngram_counts` (n=1), then
       :func:`..shuffle.salted_grouped`: hot tokens' partials split
       across ``n_salts`` sub-groups before the final merge.

    The result equals :func:`ngram_counts` ``(n=1)`` exactly — salting
    changes the physical fan-in only — so the same GROUP BY oracle
    value-checks this plan end to end.
    """
    import pyarrow.compute as pc

    from ..shuffle import salted_grouped
    from .sampling import hash_sample
    from .sketch import hot_keys
    from .textstats import explode_tokens_batch

    # 1. candidate vocabulary from a deterministic document sample
    def distinct_tokens(batch: pa.Table) -> pa.Table:
        t = explode_tokens_batch(batch)
        return pa.table(
            {"token": pc.unique(t.column("token").combine_chunks())}
        )

    cand = sorted(
        set(
            hash_sample(docs, key="doc_id", fraction=sample_fraction, seed=13)
            .map_batches(distinct_tokens, batch_format="pyarrow")
            .to_pandas()["token"]  # ≤ sample vocabulary: small by design
        )
    )
    # 2. sketch-estimated hot set over the full token stream
    tokens = docs.map_batches(explode_tokens_batch, batch_format="pyarrow")
    hot = hot_keys(tokens, "token", cand, threshold_frac=threshold_frac)
    # 3. per-block combine, then the salted two-stage merge
    partial = docs.map_batches(
        _gram_count_batch, fn_kwargs={"n": 1}, batch_format="pyarrow"
    )
    return salted_grouped(
        partial,
        ["gram"],
        [("n", "sum")],
        hot=hot,
        n_salts=n_salts,
        rename={"n_sum": "n"},
        hash_cols=["g_key"],
        num_partitions=num_partitions,
    )


BPE_EOW = "</w>"
BPE_N_MERGES = 8


def _bpe_pair_batch(batch: pa.Table) -> pa.Table:
    """(word, n) vocabulary rows → (sym_a, sym_b, n, p_key) adjacent
    symbol-pair partials — the statistic one BPE merge iteration ranks
    (Sennrich et al. 2016): each word is its character sequence plus the
    ``</w>`` end-of-word marker, and every adjacent pair contributes the
    word's corpus count.

    Vectorized as a loop over character POSITIONS (bounded by the
    longest in-batch word, ~dozens), not words: two scalar-offset slice
    kernels per position over the whole word column.  Work here is per
    DISTINCT word — the corpus-sized stream was already collapsed by the
    word-count exchange upstream."""
    import numpy as np

    empty = pa.table(
        {
            "sym_a": pa.array([], type=pa.string()),
            "sym_b": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "p_key": pa.array([], type=pa.int64()),
        }
    )
    if len(batch) == 0:
        return empty
    words = batch.column("gram").combine_chunks()
    counts = batch.column("n").combine_chunks()
    lengths = pc.utf8_length(words).to_numpy(zero_copy_only=False)
    max_len = int(lengths.max()) if len(lengths) else 0
    parts_a, parts_b, parts_n = [], [], []
    for p in range(max_len - 1):
        mask = pa.array(lengths > p + 1)
        w = words.filter(mask)
        parts_a.append(pc.utf8_slice_codeunits(w, start=p, stop=p + 1))
        parts_b.append(pc.utf8_slice_codeunits(w, start=p + 1, stop=p + 2))
        parts_n.append(counts.filter(mask))
    # end-of-word pair: (last char, </w>) for every non-empty word
    mask = pa.array(lengths > 0)
    w = words.filter(mask)
    last = pc.utf8_slice_codeunits(w, start=-1, stop=2**30)
    parts_a.append(last)
    parts_b.append(pa.array([BPE_EOW] * len(w), type=pa.string()))
    parts_n.append(counts.filter(mask))
    tbl = pa.table(
        {
            "sym_a": pa.concat_arrays(
                [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
                 for x in parts_a]
            ),
            "sym_b": pa.concat_arrays(
                [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
                 for x in parts_b]
            ),
            "n": pa.concat_arrays(
                [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
                 for x in parts_n]
            ),
        }
    )
    local = tbl.group_by(["sym_a", "sym_b"]).aggregate([("n", "sum")])
    keys = [
        int.from_bytes(
            hashlib.blake2b(
                f"{a}\x1f{b}".encode("utf-8"), digest_size=8
            ).digest(),
            "big",
            signed=True,
        )
        for a, b in zip(
            local.column("sym_a").to_pylist(),
            local.column("sym_b").to_pylist(),
        )
    ]
    return pa.table(
        {
            "sym_a": local.column("sym_a"),
            "sym_b": local.column("sym_b"),
            "n": local.column("n_sum"),
            "p_key": pa.array(keys, type=pa.int64()),
        }
    )


def bpe_pair_counts(docs, num_partitions: int | None = None):
    """documents → (sym_a, sym_b, n): corpus-weighted adjacent
    symbol-pair counts over the initial BPE symbol sequences (characters
    + ``</w>``) — the exact statistic whose argmax is the first BPE
    merge (Sennrich et al. 2016), i.e. one iteration of distributed
    tokenizer training.

    Scale shape: the corpus-sized token stream collapses in the existing
    word-count exchange (map-side combine → digest-keyed Sum), pair
    explosion then costs O(vocabulary · word length) — independent of
    corpus size — and the final exchange carries at most
    ``symbol-alphabet²`` rows.  Oracled by a plain two-level GROUP BY.
    """
    from ..shuffle import hash_grouped

    vocab = ngram_counts(docs, n=1, num_partitions=num_partitions)
    partial = vocab.map_batches(_bpe_pair_batch, batch_format="pyarrow")
    return hash_grouped(
        partial,
        ["sym_a", "sym_b"],
        [("n", "sum")],
        rename={"n_sum": "n"},
        hash_cols=["p_key"],
        num_partitions=num_partitions,
    )


def sql_bpe_pairs() -> str:
    """DuckDB twin of :func:`bpe_pair_counts`: word counts → per-position
    character pairs + the ``</w>`` end-of-word pair → SUM of word counts."""
    return f"""
        WITH wc AS (
          SELECT w AS word, count(*)::BIGINT AS n
          FROM (SELECT unnest(string_split(text, ' ')) AS w
                FROM documents)
          GROUP BY w),
        pairs AS (
          SELECT substring(word, i, 1) AS sym_a,
                 substring(word, i + 1, 1) AS sym_b, n
          FROM (SELECT word, n,
                       unnest(generate_series(1, length(word) - 1)) AS i
                FROM wc)
          UNION ALL
          SELECT substring(word, length(word), 1), '{BPE_EOW}', n
          FROM wc WHERE length(word) > 0)
        SELECT sym_a, sym_b, sum(n)::BIGINT AS n
        FROM pairs GROUP BY sym_a, sym_b
    """


def _sql_bpe_chain(n_merges: int, final_syms: bool) -> list[str]:
    """Shared CTE chain for the BPE twins: word counts, per-round pair
    census (``p{r}``) + argmax rule (``r{r}``), and the greedy merge
    rewrite as a RECURSIVE positional scan (``scan{r}`` → ``s{r+1}``).
    ``final_syms=True`` extends the rewrite through the last adopted
    rule so ``s{n_merges}`` (the fully-merged symbol tables the ENCODE
    pass consumes) exists; the trainer itself only needs rules, so it
    stops one rewrite earlier."""
    parts = [
        """wc AS (
          SELECT w AS word, count(*)::BIGINT AS n
          FROM (SELECT unnest(string_split(text, ' ')) AS w
                FROM documents)
          WHERE w != '' GROUP BY w)""",
        f"""s0 AS MATERIALIZED (
          SELECT word, n,
                 list_append(string_split(word, ''), '{BPE_EOW}') AS syms
          FROM wc)""",
    ]
    for r in range(n_merges):
        parts.append(f"""p{r} AS MATERIALIZED (
          SELECT syms[i] AS sym_a, syms[i + 1] AS sym_b,
                 sum(n)::BIGINT AS n
          FROM (SELECT syms, n,
                       unnest(generate_series(1, len(syms) - 1)) AS i
                FROM s{r})
          GROUP BY 1, 2)""")
        parts.append(f"""r{r} AS MATERIALIZED (
          SELECT sym_a AS a, sym_b AS b, n FROM p{r}
          ORDER BY n DESC, sym_a ASC, sym_b ASC LIMIT 1)""")
        if final_syms or r + 1 < n_merges:
            parts.append(f"""scan{r} AS (
          SELECT word, n, syms, 1 AS i, []::VARCHAR[] AS acc FROM s{r}
          UNION ALL
          SELECT sc.word, sc.n, sc.syms,
                 CASE WHEN sc.i < len(sc.syms) AND sc.syms[sc.i] = r.a
                           AND sc.syms[sc.i + 1] = r.b
                      THEN sc.i + 2 ELSE sc.i + 1 END,
                 CASE WHEN sc.i < len(sc.syms) AND sc.syms[sc.i] = r.a
                           AND sc.syms[sc.i + 1] = r.b
                      THEN list_append(sc.acc, r.a || r.b)
                      ELSE list_append(sc.acc, sc.syms[sc.i]) END
          FROM scan{r} sc, r{r} r WHERE sc.i <= len(sc.syms))""")
            parts.append(f"""s{r + 1} AS MATERIALIZED (
          SELECT word, n, acc AS syms FROM scan{r}
          WHERE i > len(syms))""")
    return parts


def sql_bpe_merges(n_merges: int = 8) -> str:
    """DuckDB twin of :func:`bpe_merges` — the full training loop
    UNROLLED: per round r, pair counts over the current symbol tables
    (``p{r}``), the identical (n DESC, sym_a ASC, sym_b ASC) argmax
    (``r{r}``), and the left-to-right non-overlapping merge rewrite as a
    RECURSIVE CTE that walks each word's symbol list exactly like
    ``_word_symbols`` (``scan{r}`` — one state row per word per scan
    position, accumulator list carried in the recursion).  A plain
    string ``replace()`` replay is NOT equivalent: the separator shared
    by consecutive matches makes replace skip the greedy scan's second
    merge in runs like ``a a a a`` — hence the positional recursion.
    Empty words (consecutive-space artifacts) are excluded: their symbol
    sequence is the bare end-of-word marker, contributing zero pairs in
    every round on both sides."""
    parts = _sql_bpe_chain(n_merges, final_syms=False)
    out = "\n          UNION ALL ".join(
        f"SELECT {r}::BIGINT AS step, a AS sym_a, b AS sym_b, n FROM r{r}"
        for r in range(n_merges)
    )
    return (
        "\n        WITH RECURSIVE " + ",\n        ".join(parts)
        + f"\n        {out}\n    "
    )


def sql_bpe_encode(n_merges: int = 8) -> str:
    """DuckDB twin of :func:`bpe_train_encode`: the training chain
    extended through the final rewrite (``s{n_merges}`` = symbols per
    word under all adopted rules), then per-doc word counts joined onto
    per-word token counts — ``n_tokens_bpe = Σ_word c_doc(word) ·
    len(syms(word))``.  Empty words are excluded on both sides."""
    parts = _sql_bpe_chain(n_merges, final_syms=True)
    parts.append(
        """dw AS (
          SELECT doc_id, w AS word, count(*)::BIGINT AS c
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents)
          WHERE w != '' GROUP BY doc_id, w)"""
    )
    parts.append(
        f"""wl AS (SELECT word, len(syms)::BIGINT AS n_toks
          FROM s{n_merges})"""
    )
    return (
        "\n        WITH RECURSIVE " + ",\n        ".join(parts)
        + """
        SELECT dw.doc_id, sum(dw.c * wl.n_toks)::BIGINT AS n_tokens_bpe
        FROM dw JOIN wl USING (word)
        GROUP BY dw.doc_id
    """
    )


def bpe_encode(docs, merges: list[tuple[str, str]], num_partitions=None):
    """documents → (doc_id, n_tokens_bpe): per-document token count
    under a TRAINED merge list — the tokenizer-aware token census a
    training-data pipeline budgets with (sequence packing, cost
    estimates, per-source token accounting), replacing the
    whitespace-proxy ``doc_token_stats`` number with the real thing.

    Stateless streaming map, ZERO exchanges: the merge list is a
    handful of rules shipped as a task literal; each block tokenizes
    its distinct-in-block words once (memo keyed by word — web text
    repeats words heavily, so the per-row cost is a dict hit) and sums
    ``count · len(symbols(word))`` per doc.  Empty words
    (consecutive-space artifacts) are excluded, matching the trainer's
    vocabulary."""
    merges = [tuple(m) for m in merges]

    def enc(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens_bpe": pa.array([], type=pa.int64()),
                }
            )
        memo: dict[str, int] = {}
        out = []
        for text in batch.column("text").to_pylist():
            n = 0
            for w in text.split(" "):
                if not w:
                    continue
                k = memo.get(w)
                if k is None:
                    k = len(_word_symbols(w, merges))
                    memo[w] = k
                n += k
            out.append(n)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens_bpe": pa.array(out, type=pa.int64()),
            }
        )

    return docs.map_batches(enc, batch_format="pyarrow")


def bpe_train_encode(
    docs, n_merges: int = BPE_N_MERGES, num_partitions=None
):
    """Train ``n_merges`` BPE rules on the corpus, then encode the same
    corpus under them (train + one extra streaming pass).  The merge
    list lands on the driver by construction (it IS the trainer's
    output); the encode pass is exchange-free."""
    rules = bpe_merges(docs, n_merges=n_merges, num_partitions=num_partitions)
    merges = [
        (r["sym_a"], r["sym_b"])
        for r in sorted(rules.take_all(), key=lambda r: r["step"])
    ]
    return bpe_encode(docs, merges, num_partitions=num_partitions)


COOC_WINDOW = 2
COOC_MIN_COUNT = 5


def _cooc_pair_batch(batch: pa.Table, window: int) -> pa.Table:
    """Block combiner for word co-occurrence: every (token, token+d)
    window pair for d = 1..window that stays inside one document,
    canonicalized to unordered byte order, collapsed per block with one
    group_by.  Digest keys for the two sides ride along so the
    downstream unigram joins and the pair exchange never key on
    strings."""
    import numpy as np

    empty = pa.table(
        {
            "word_a": pa.array([], type=pa.string()),
            "word_b": pa.array([], type=pa.string()),
            "c": pa.array([], type=pa.int64()),
            "a_key": pa.array([], type=pa.int64()),
            "b_key": pa.array([], type=pa.int64()),
        }
    )
    if len(batch) == 0:
        return empty
    tok_lists = pc.split_pattern(batch.column("text").combine_chunks(), " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    flat = tok_lists.values
    offsets = np.asarray(tok_lists.offsets).astype(np.int64)
    counts = offsets[1:] - offsets[:-1]
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    total = len(flat)
    parts_a, parts_b = [], []
    for d in range(1, window + 1):
        if total <= d:
            break
        pos = np.arange(total - d)
        valid = parent[pos] == parent[pos + d]
        starts = pos[valid]
        if len(starts) == 0:
            continue
        a = pc.take(flat, pa.array(starts, type=pa.int64()))
        b = pc.take(flat, pa.array(starts + d, type=pa.int64()))
        lo = pc.if_else(pc.less_equal(a, b), a, b)
        hi = pc.if_else(pc.less_equal(a, b), b, a)
        parts_a.append(lo)
        parts_b.append(hi)
    if not parts_a:
        return empty
    local = (
        pa.table(
            {
                "word_a": pa.concat_arrays(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                     else x for x in parts_a]
                ),
                "word_b": pa.concat_arrays(
                    [x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                     else x for x in parts_b]
                ),
            }
        )
        .group_by(["word_a", "word_b"])
        .aggregate([([], "count_all")])
    )

    def digest(s: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
            "big",
            signed=True,
        )

    wa = local.column("word_a").to_pylist()
    wb = local.column("word_b").to_pylist()
    return pa.table(
        {
            "word_a": local.column("word_a"),
            "word_b": local.column("word_b"),
            "c": local.column("count_all").cast(pa.int64()),
            "a_key": pa.array([digest(w) for w in wa], type=pa.int64()),
            "b_key": pa.array([digest(w) for w in wb], type=pa.int64()),
        }
    )


def cooc_pmi(
    docs,
    window: int = COOC_WINDOW,
    min_count: int = COOC_MIN_COUNT,
    num_partitions: int | None = None,
):
    """documents → (word_a, word_b, n_pairs, pmi): pointwise mutual
    information of unordered word pairs co-occurring within ``window``
    tokens — the association statistic word-embedding pipelines
    (word2vec SGNS ≈ shifted-PMI factorization; GloVe) and collocation
    miners consume.

        pmi = ln( (c·N·N) / (P·n_a·n_b) )

    with N total tokens, P total window pairs, n_x unigram counts.

    Scale shape: pair windows collapse map-side per block (the n-gram
    combiner pattern) before ONE digest-keyed exchange; unigram counts
    arrive via the existing word-count exchange and join onto the pair
    table through two padded int64 joins (vocabulary-sized, never
    broadcast) — each join carries the vocabulary word and rechecks it
    against word_a/word_b post-join, so an 8-byte digest collision
    cannot attach the wrong unigram count (collision-safe like
    ``dedup.first_occurrence``); N and P are two driver scalars.  The float is one fixed
    mul/div chain + libm ``ln`` per distinct count triple — bit-exact
    vs the SQL twin.  ``min_count`` gates AFTER the global sum (exact),
    bounding output the way production collocation tables do."""
    import math

    import numpy as np

    from ..shuffle import hash_grouped, local_hash_join

    # materialized: each table feeds BOTH a driver-scalar sum and a
    # join — without the pin the full corpus explode would execute twice
    pairs = hash_grouped(
        docs.map_batches(
            _cooc_pair_batch,
            fn_kwargs={"window": window},
            batch_format="pyarrow",
        ),
        ["word_a", "word_b", "a_key", "b_key"],
        [("c", "sum")],
        rename={"c_sum": "c"},
        hash_cols=["a_key", "b_key"],
        num_partitions=num_partitions,
    ).materialize()
    vocab = ngram_counts(
        docs, n=1, num_partitions=num_partitions
    ).materialize()

    def keyed(col_key: str, col_n: str, col_gram: str):
        def fn(t: pa.Table) -> pa.Table:
            grams = t.column("gram").to_pylist()
            keys = [
                int.from_bytes(
                    hashlib.blake2b(
                        g.encode("utf-8"), digest_size=8
                    ).digest(),
                    "big",
                    signed=True,
                )
                for g in grams
            ]
            return pa.table(
                {
                    col_key: pa.array(keys, type=pa.int64()),
                    col_n: t.column("n"),
                    # the word itself rides along so the join can recheck
                    # equality — a digest collision must not attach a
                    # colliding word's count (value-regroup discipline,
                    # same as dedup.first_occurrence)
                    col_gram: t.column("gram"),
                }
            )

        return fn

    def recheck(word_col: str, gram_col: str):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc_

            if len(t) == 0 or word_col not in t.column_names:
                return t
            kept = t.filter(
                pc_.equal(t.column(word_col), t.column(gram_col))
            )
            return kept.drop_columns([gram_col])

        return fn

    n_tokens = int(vocab.sum("n"))
    total_pairs = int(pairs.sum("c")) if n_tokens else 0
    pair_schema = pa.schema(
        [
            ("word_a", pa.string()),
            ("word_b", pa.string()),
            ("a_key", pa.int64()),
            ("b_key", pa.int64()),
            ("c", pa.int64()),
        ]
    )
    j1 = local_hash_join(
        pairs,
        vocab.map_batches(
            keyed("a_key", "n_a", "gram_a"), batch_format="pyarrow"
        ),
        on=["a_key"],
        left_schema=pair_schema,
        right_schema=pa.schema(
            [
                ("a_key", pa.int64()),
                ("n_a", pa.int64()),
                ("gram_a", pa.string()),
            ]
        ),
        how="inner",
        num_partitions=num_partitions,
    ).map_batches(recheck("word_a", "gram_a"), batch_format="pyarrow")
    j2 = local_hash_join(
        j1,
        vocab.map_batches(
            keyed("b_key", "n_b", "gram_b"), batch_format="pyarrow"
        ),
        on=["b_key"],
        left_schema=pair_schema.append(pa.field("n_a", pa.int64())),
        right_schema=pa.schema(
            [
                ("b_key", pa.int64()),
                ("n_b", pa.int64()),
                ("gram_b", pa.string()),
            ]
        ),
        how="inner",
        num_partitions=num_partitions,
    ).map_batches(recheck("word_b", "gram_b"), batch_format="pyarrow")

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "word_a": pa.array([], type=pa.string()),
                "word_b": pa.array([], type=pa.string()),
                "n_pairs": pa.array([], type=pa.int64()),
                "pmi": pa.array([], type=pa.float64()),
            }
        )
        if len(t) == 0 or "word_a" not in t.column_names:
            return empty
        import pyarrow.compute as pc_

        t = t.filter(pc_.greater_equal(t.column("c"), min_count))
        if len(t) == 0:
            return empty
        c = t.column("c").to_pylist()
        na = t.column("n_a").to_pylist()
        nb = t.column("n_b").to_pylist()
        cache: dict = {}
        pmi = np.empty(len(c), dtype=np.float64)
        for i, key in enumerate(zip(c, na, nb)):
            v = cache.get(key)
            if v is None:
                # fixed op order mirrored by the SQL twin:
                # ((c·N)·N) / ((P·na)·nb), then libm ln
                v = math.log(
                    float(key[0])
                    * float(n_tokens)
                    * float(n_tokens)
                    / (
                        float(total_pairs)
                        * float(key[1])
                        * float(key[2])
                    )
                )
                cache[key] = v
            pmi[i] = v
        return pa.table(
            {
                "word_a": t.column("word_a"),
                "word_b": t.column("word_b"),
                "n_pairs": t.column("c"),
                "pmi": pa.array(pmi, type=pa.float64()),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow")


def sql_cooc_pmi(
    window: int = COOC_WINDOW, min_count: int = COOC_MIN_COUNT
) -> str:
    """DuckDB twin of :func:`cooc_pmi` (identical windows, identical
    float op order)."""
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS ts
                FROM documents)),
        uni AS (SELECT w AS word, count(*)::BIGINT AS n
                FROM toks GROUP BY w),
        nn AS (SELECT sum(n)::BIGINT AS n FROM uni),
        pairs AS (
          SELECT least(t1.w, t2.w) AS word_a,
                 greatest(t1.w, t2.w) AS word_b,
                 count(*)::BIGINT AS c
          FROM toks t1
          JOIN toks t2 ON t2.doc_id = t1.doc_id
                      AND t2.i > t1.i AND t2.i <= t1.i + {window}
          GROUP BY 1, 2),
        pp AS (SELECT sum(c)::BIGINT AS p FROM pairs)
        SELECT p.word_a, p.word_b, p.c AS n_pairs,
               ln((p.c::DOUBLE * nn.n::DOUBLE * nn.n::DOUBLE)
                  / (pp.p::DOUBLE * ua.n::DOUBLE * ub.n::DOUBLE)) AS pmi
        FROM pairs p
        JOIN uni ua ON ua.word = p.word_a
        JOIN uni ub ON ub.word = p.word_b, nn, pp
        WHERE p.c >= {min_count}
    """



def _word_symbols(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """chars + ``</w>``, with ``merges`` applied IN ORDER (each merge is
    one left-to-right non-overlapping scan — the Sennrich et al. 2016
    training-side replay)."""
    syms = list(word) + [BPE_EOW]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_merges(docs, n_merges: int = BPE_N_MERGES, num_partitions=None):
    """documents → the first ``n_merges`` BPE merge rules
    (step, sym_a, sym_b, n) — distributed tokenizer TRAINING (Sennrich
    et al. 2016), not just one pair census: per round, count adjacent
    symbol pairs weighted by word frequency, adopt the (n DESC, sym_a
    ASC, sym_b ASC) argmax, rewrite the vocabulary, repeat.

    Scale shape: the corpus collapses ONCE into the distinct-word count
    table (the word-count exchange); every training round then touches
    only the vocabulary — per-block pair counting with map-side combine,
    one digest-keyed Sum whose key space is bounded by the (current)
    symbol alphabet squared, and ONE driver-side row (the argmax rule,
    via sort().limit(1) over the tiny pair table).  Driver state is the
    merge list itself — exactly what a tokenizer trainer must
    materialize.  Iterative and driver-coordinated, so there is no SQL
    twin; correctness is pinned by a single-process reference BPE in
    tests (and round 1's pair table is oracled via `doc_bpe_pairs`)."""
    from ..shuffle import hash_grouped

    vocab = ngram_counts(docs, n=1, num_partitions=num_partitions)
    vocab = vocab.materialize()
    merges: list[tuple[str, str]] = []
    out_rows: list[tuple[int, str, str, int]] = []

    def pair_partial(t: pa.Table, merges_now) -> pa.Table:
        empty = pa.table(
            {
                "sym_a": pa.array([], type=pa.string()),
                "sym_b": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "p_key": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        counts: dict[tuple[str, str], int] = {}
        for word, n in zip(
            t.column("gram").to_pylist(), t.column("n").to_pylist()
        ):
            syms = _word_symbols(word, merges_now)
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                counts[key] = counts.get(key, 0) + n
        if not counts:
            return empty
        ks = list(counts)
        keys = [
            int.from_bytes(
                hashlib.blake2b(
                    f"{a}\x1f{b}".encode("utf-8"), digest_size=8
                ).digest(),
                "big",
                signed=True,
            )
            for a, b in ks
        ]
        return pa.table(
            {
                "sym_a": pa.array([a for a, _ in ks], type=pa.string()),
                "sym_b": pa.array([b for _, b in ks], type=pa.string()),
                "n": pa.array([counts[k] for k in ks], type=pa.int64()),
                "p_key": pa.array(keys, type=pa.int64()),
            }
        )

    for step in range(n_merges):
        merges_now = list(merges)
        pairs = hash_grouped(
            vocab.map_batches(
                lambda t, m=merges_now: pair_partial(t, m),
                batch_format="pyarrow",
            ),
            ["sym_a", "sym_b"],
            [("n", "sum")],
            rename={"n_sum": "n"},
            hash_cols=["p_key"],
            num_partitions=num_partitions,
        )
        top = pairs.sort(
            ["n", "sym_a", "sym_b"], descending=[True, False, False]
        ).limit(1).take_all()
        if not top:
            break
        rule = top[0]
        merges.append((rule["sym_a"], rule["sym_b"]))
        out_rows.append(
            (step, rule["sym_a"], rule["sym_b"], int(rule["n"]))
        )
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "step": pa.array(
                    [r[0] for r in out_rows], type=pa.int64()
                ),
                "sym_a": pa.array([r[1] for r in out_rows]),
                "sym_b": pa.array([r[2] for r in out_rows]),
                "n": pa.array([r[3] for r in out_rows], type=pa.int64()),
            }
        )
    )
