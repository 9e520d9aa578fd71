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
