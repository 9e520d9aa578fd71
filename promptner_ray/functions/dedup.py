"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data dedup suite over the ``documents`` table.  Physical plans are
Arrow-native end to end: candidate pairs come from hash self-joins on the
blocking key (shingle / LSH band bucket / SimHash chunk), pair counting and
keep-first selection use Ray Data's native grouped aggregates
(``groupby([...]).count() / .aggregate(Min, Sum)`` — C++ kernels, no
per-group Python), and per-doc attributes needed at scoring time (shingle
set sizes) ride on the posting rows through the join — no broadcast state
anywhere in the module.

Hashing is md5-hex so the DuckDB oracle (md5 + lexicographic min over
VARCHAR) reproduces signatures exactly.  At 100 TB scale the md5 inner loop
would swap for a vectorized 64-bit hash (xxhash/np); the banding/bucketing
plan is unchanged — md5 is the conformance-friendly default.

Shingle convention (mirrored in SQL): word 3-grams over the single-space
token split; documents shorter than 3 tokens contribute their whole token
list as one shingle.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SHINGLE_N = 3


def _pair_join_partitions() -> int:
    """Join partitions sized to the cluster: aggregator actors reserve
    0.125 CPU per partition and dedup plans run a join PLUS hash-shuffle
    aggregations concurrently — a fixed large constant starves small
    sessions' task CPUs (observed deadlock at 4 CPUs with 16 partitions).
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus // 2)


def shingle_set(text: str, n: int = SHINGLE_N) -> set[str]:
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))
    }


def _rename(ds, mapping: dict[str, str]):
    return ds.rename_columns(mapping)


# ---------------------------------------------------------------------------
# Exact dedup: first (min doc_id) per content hash
# ---------------------------------------------------------------------------

def exact_partial_batch(batch: pa.Table) -> pa.Table:
    """Map-side combine: (fp, min doc_id, count) per block.

    ``fp_key`` is the hex hash reinterpreted as int64 — the numeric
    partition key for the downstream ``shuffle.hash_grouped`` exchange
    (the string column stays the output/group key).
    """
    agg: dict[str, list[int]] = {}
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        fp = hashlib.md5(text.encode("utf-8")).hexdigest()
        cur = agg.get(fp)
        if cur is None:
            agg[fp] = [doc_id, 1]
        else:
            cur[0] = min(cur[0], doc_id)
            cur[1] += 1
    return pa.table(
        {
            "fp": pa.array(list(agg.keys()), type=pa.string()),
            "fp_key": pa.array(
                [int(k[:16], 16) - (1 << 63) for k in agg.keys()],
                type=pa.int64(),
            ),
            "doc_id": pa.array([v[0] for v in agg.values()], type=pa.int64()),
            "n_dups": pa.array([v[1] for v in agg.values()], type=pa.int64()),
        }
    )


def exact_dedup(docs):
    """documents → (fp, doc_id=keeper, n_dups): one row per distinct text.

    Map-side combine then a hash-partitioned Arrow grouped Min/Sum
    (``shuffle.hash_grouped`` — keys are high-cardinality content hashes,
    so the per-block C++ combine beats Ray's row-iterating aggregate) —
    the exchange moves one row per distinct hash per block, never raw rows.
    """
    from ..shuffle import hash_grouped

    partials = docs.map_batches(exact_partial_batch, batch_format="pyarrow")
    return hash_grouped(
        partials,
        ["fp"],
        [("doc_id", "min"), ("n_dups", "sum")],
        rename={"doc_id_min": "doc_id", "n_dups_sum": "n_dups"},
        hash_cols=["fp_key"],
    )


# ---------------------------------------------------------------------------
# Candidate pairs via hash self-join on a blocking key
# ---------------------------------------------------------------------------

def _self_join_pairs(
    keyed,
    key: str,
    num_partitions: int | None = None,
    carry: tuple[str, ...] = (),
):
    """(key, doc_id[, carry...]) rows → ordered candidate pairs
    (doc_a < doc_b[, {c}_a, {c}_b per carried column]).

    Arrow hash join on the blocking key; the a<b filter is a vectorized
    kernel.  Replaces per-group Python pair loops.  ``carry`` columns
    (per-doc attributes riding on the posting rows, e.g. set sizes)
    come out duplicated per side — the no-broadcast way to get both
    docs' attributes onto each pair row.
    """
    if num_partitions is None:
        num_partitions = _pair_join_partitions()
    joined = keyed.join(
        keyed,
        join_type="inner",
        num_partitions=num_partitions,
        on=(key,),
        left_suffix="",
        right_suffix="_r",
    )

    def keep_ordered(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch.column("doc_id"), batch.column("doc_id_r"))
        kept = batch.filter(mask)
        cols = {
            "doc_a": kept.column("doc_id"),
            "doc_b": kept.column("doc_id_r"),
        }
        for c in carry:
            cols[f"{c}_a"] = kept.column(c)
            cols[f"{c}_b"] = kept.column(f"{c}_r")
        return pa.table(cols)

    return joined.map_batches(keep_ordered, batch_format="pyarrow")


def _distinct_pairs(pairs):
    """Distinct (doc_a, doc_b): hash-partition by pair, Arrow-distinct per
    block (empty aggregate list = distinct keys)."""
    from ..shuffle import hash_grouped

    return hash_grouped(pairs, ["doc_a", "doc_b"], [])


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact, inverted-index plan)
# ---------------------------------------------------------------------------

def shingle_rows_batch(batch: pa.Table) -> pa.Table:
    """documents → one row per (doc_id, distinct shingle); vectorized
    window construction (``_doc_shingles_vec``)."""
    ids, grams = _doc_shingles_vec(batch)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "s": grams,
        }
    )


def _hash64(s: str) -> int:
    """Signed 64-bit shingle hash (int64-friendly join/lookup key)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
        "big",
        signed=True,
    )


def _shingle_hash_rows_batch(batch: pa.Table) -> pa.Table:
    """documents → one row per (doc_id, distinct shingle hash, doc size).

    Windows come vectorized; the blake2b digest runs once per
    distinct-in-block shingle VALUE (cached) — near-dup blocks repeat
    shingles heavily, so the digest loop is far smaller than the row
    count.  ``sz`` is the doc's distinct-shingle count, computable
    in-block because each doc's whole text is a single input row; the
    posting self-join carries it to the pair rows so the union size
    never needs a driver-side lookup."""
    ids, grams = _doc_shingles_vec(batch)
    cache: dict[str, int] = {}
    hashes = [
        cache.get(s) or cache.setdefault(s, _hash64(s))
        for s in grams.to_pylist()
    ]
    if len(ids):
        # postings are already distinct per doc, so the per-doc row
        # count IS the set size; ids arrive grouped by doc but not
        # necessarily sorted — use return_inverse to map back
        uniq, inv, cnt = np.unique(ids, return_inverse=True,
                                   return_counts=True)
        sizes = cnt[inv]
    else:
        sizes = np.array([], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "h": pa.array(hashes, type=pa.int64()),
            "sz": pa.array(sizes, type=pa.int64()),
        }
    )


def _pair_count_partial(batch: pa.Table) -> pa.Table:
    """Map-side combine: co-occurrence rows → (doc_a, doc_b, n) per block."""
    if len(batch) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    out = batch.group_by(["doc_a", "doc_b"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "doc_a": out.column("doc_a"),
            "doc_b": out.column("doc_b"),
            "n": out.column("count_all").cast(pa.int64()),
        }
    )


def _pair_count_sized_partial(batch: pa.Table) -> pa.Table:
    """Map-side combine over pair rows CARRYING sizes: (doc_a, doc_b,
    sz_a, sz_b, n) per block.  sz_a/sz_b are functionally dependent on
    the doc ids, so adding them to the group key changes nothing about
    the grouping — it just keeps them on the combined row."""
    if len(batch) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "sz_a": pa.array([], type=pa.int64()),
                "sz_b": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    out = batch.group_by(["doc_a", "doc_b", "sz_a", "sz_b"]).aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {
            "doc_a": out.column("doc_a"),
            "doc_b": out.column("doc_b"),
            "sz_a": out.column("sz_a"),
            "sz_b": out.column("sz_b"),
            "n": out.column("count_all").cast(pa.int64()),
        }
    )


def _jaccard_score_batch(batch: pa.Table, threshold: float) -> pa.Table:
    """Vectorized J = |∩| / (|A| + |B| − |∩|) from sizes carried ON the
    pair rows (no lookup state of any kind)."""
    a = batch.column("doc_a").to_numpy(zero_copy_only=False)
    b = batch.column("doc_b").to_numpy(zero_copy_only=False)
    ninter = batch.column("n").to_numpy(zero_copy_only=False)
    sa = batch.column("sz_a").to_numpy(zero_copy_only=False)
    sb = batch.column("sz_b").to_numpy(zero_copy_only=False)
    j = ninter / (sa + sb - ninter)
    keep = j >= threshold
    return pa.table(
        {
            "doc_a": pa.array(a[keep], type=pa.int64()),
            "doc_b": pa.array(b[keep], type=pa.int64()),
            "jaccard": pa.array(j[keep], type=pa.float64()),
        }
    )


def jaccard_pairs(docs, threshold: float = 0.6):
    """documents → (doc_a, doc_b, jaccard) for pairs with J ≥ threshold.

    Exact inverted-index plan with NO broadcast and NO driver-side
    materialization of any per-doc state: the int64 shingle-hash
    self-join emits one co-occurrence row per shared shingle, so
    ``count(*) per (doc_a, doc_b)`` IS the exact intersection size
    (map-side combined per block, then a native grouped Sum).  Union
    sizes ride ON the posting rows (each posting carries its doc's
    distinct-shingle count, computed in-block) and survive the join as
    ``sz_a``/``sz_b`` on every pair row — functionally dependent on the
    doc ids, so folding them into the combine's group key is free.  The
    final score/filter is a stateless vectorized batch map.  Per-worker
    memory is O(block), independent of corpus size; the 100 TB caveat
    is the usual inverted-index one (a shingle shared by f docs emits
    f² join rows — boilerplate needs a df cap like
    :func:`winnow_pairs`'s ``max_df``), and the approximate default at
    that scale remains :func:`minhash_lsh_pairs`.
    """
    from ..shuffle import hash_grouped

    # materialize ONCE (object store, not driver): the self-join consumes
    # this dataset as both sides, and without pinning the blocks the
    # shingle+hash extraction lineage would execute once per side
    sh = docs.map_batches(
        _shingle_hash_rows_batch, batch_format="pyarrow"
    ).materialize()
    cooc = _self_join_pairs(sh, "h", carry=("sz",))
    ninter = hash_grouped(
        cooc.map_batches(_pair_count_sized_partial, batch_format="pyarrow"),
        ["doc_a", "doc_b", "sz_a", "sz_b"],
        [("n", "sum")],
        rename={"n_sum": "n"},
        hash_cols=["doc_a", "doc_b"],
    )
    return ninter.map_batches(
        _jaccard_score_batch,
        fn_kwargs={"threshold": threshold},
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

NUM_PERM = 12
BAND_ROWS = 3  # 4 bands of 3 rows → LSH threshold ≈ (1/4)^(1/3) ≈ 0.63


def minhash_signature(text: str, num_perm: int = NUM_PERM) -> list[str]:
    """Per-permutation minimum of md5-hex over the doc's shingles.

    md5("{i}:{shingle}") with lexicographic min — identical to the SQL
    oracle's ``min(md5(i::VARCHAR || ':' || s))`` (hex strings compare the
    same in ASCII as VARCHAR).
    """
    sh = shingle_set(text)
    return [
        min(hashlib.md5(f"{i}:{s}".encode("utf-8")).hexdigest() for s in sh)
        for i in range(num_perm)
    ]


def band_rows_batch(
    batch: pa.Table,
    num_perm: int = NUM_PERM,
    band_rows: int = BAND_ROWS,
) -> pa.Table:
    """documents → one row per (doc_id, band bucket key).

    Vectorized: the md5 loop runs once per DISTINCT-in-block shingle per
    permutation (dup-heavy blocks repeat shingles, which is the whole
    premise of near-dedup), the per-doc signature minimum is one Arrow
    grouped ``min`` over hex strings (same ASCII order as the SQL
    oracle's ``min(md5(...))`` over VARCHAR), and band keys are
    ``binary_join_element_wise`` concatenations — no per-doc Python."""
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "bucket": pa.array([], type=pa.string()),
        }
    )
    if len(batch) == 0:
        return empty
    ids, grams = _doc_shingles_vec(batch)
    if len(ids) == 0:
        return empty
    glist = grams.to_pylist()
    uniq: dict[str, int] = {}
    for s in glist:
        if s not in uniq:
            uniq[s] = len(uniq)
    gidx = np.fromiter(
        (uniq[s] for s in glist), dtype=np.int64, count=len(glist)
    )
    uniq_list = list(uniq)
    cols: dict = {"doc_id": pa.array(ids, type=pa.int64())}
    for i in range(num_perm):
        perm_hex = np.array(
            [
                hashlib.md5(f"{i}:{s}".encode("utf-8")).hexdigest()
                for s in uniq_list
            ],
            dtype=object,
        )
        cols[f"h{i}"] = pa.array(perm_hex[gidx].tolist(), type=pa.string())
    mins = pa.table(cols).group_by(["doc_id"]).aggregate(
        [(f"h{i}", "min") for i in range(num_perm)]
    )
    n = len(mins)
    n_bands = num_perm // band_rows
    id_parts: list[pa.Array] = []
    bucket_parts: list[pa.Array] = []
    doc_col = mins.column("doc_id").combine_chunks()
    for band in range(n_bands):
        sig_cols = [
            mins.column(f"h{band * band_rows + j}_min").combine_chunks()
            for j in range(band_rows)
        ]
        key = pc.binary_join_element_wise(*sig_cols, ",")
        prefix = pa.array([f"{band}|"] * n, type=pa.string())
        bucket_parts.append(pc.binary_join_element_wise(prefix, key, ""))
        id_parts.append(doc_col)
    return pa.table(
        {
            "doc_id": pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                 for p in id_parts]
            ),
            "bucket": pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                 for p in bucket_parts]
            ),
        }
    )


def minhash_lsh_pairs(docs, num_perm: int = NUM_PERM, band_rows: int = BAND_ROWS):
    """documents → distinct candidate near-dup pairs via LSH banding."""
    bands = docs.map_batches(
        band_rows_batch,
        fn_kwargs={"num_perm": num_perm, "band_rows": band_rows},
        batch_format="pyarrow",
    )
    # rename to the join's expected (key, doc_id) shape
    keyed = bands.select_columns(["bucket", "doc_id"])
    return _distinct_pairs(_self_join_pairs(keyed, "bucket"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over the token multiset (md5-derived token hashes)."""
    counts = Counter(text.split(" "))
    acc = np.zeros(64, dtype=np.int64)
    for tok, n in counts.items():
        h = np.uint64(
            int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
        )
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, n, -n)
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, simhash hex).

    Vectorized twin of :func:`simhash64` (kept as the scalar reference):
    tokens dictionary-encode C-side so md5 runs once per
    distinct-in-block token; the per-document bit votes are 64
    ``bincount`` passes over the flattened token stream (weights = ±1
    per token per bit) — no per-document Python and no dense
    doc×vocabulary matrix."""
    if len(batch) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "simhash": pa.array([], type=pa.string()),
            }
        )
    tok_lists = pc.split_pattern(batch.column("text").combine_chunks(), " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    offsets = np.asarray(tok_lists.offsets).astype(np.int64)
    counts = offsets[1:] - offsets[:-1]
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    dict_col = pc.dictionary_encode(tok_lists.values)
    gidx = dict_col.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = dict_col.dictionary.to_pylist()
    h = np.array(
        [
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            for t in uniq
        ],
        dtype=np.uint64,
    )
    n_docs = len(batch)
    acc = np.empty((n_docs, 64), dtype=np.float64)
    for b in range(64):
        sign = (
            ((h >> np.uint64(b)) & np.uint64(1)).astype(np.float64) * 2.0
            - 1.0
        )
        acc[:, b] = np.bincount(
            parent, weights=sign[gidx], minlength=n_docs
        )
    bits = (acc > 0).astype(np.uint64)
    vals = (bits << np.arange(64, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(
                [f"{int(v):016x}" for v in vals], type=pa.string()
            ),
        }
    )


def _chunk_bounds(n_chunks: int) -> list[tuple[int, int]]:
    """(shift, width) per chunk: 64 bits split as evenly as possible."""
    base, extra = divmod(64, n_chunks)
    bounds, shift = [], 0
    for c in range(n_chunks):
        width = base + (1 if c < extra else 0)
        bounds.append((shift, width))
        shift += width
    return bounds


def _simhash_chunk_rows(batch: pa.Table, n_chunks: int = 4) -> pa.Table:
    """(doc_id, simhash) → one row per chunk bucket.

    Pigeonhole blocking: a pair within Hamming distance ``n_chunks - 1``
    must agree on at least one of the ``n_chunks`` disjoint bit ranges.
    """
    bounds = _chunk_bounds(n_chunks)
    doc_ids, buckets, sims = [], [], []
    for doc_id, hx in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("simhash").to_pylist(),
    ):
        h = int(hx, 16)
        for c, (shift, width) in enumerate(bounds):
            chunk = (h >> shift) & ((1 << width) - 1)
            doc_ids.append(doc_id)
            buckets.append(f"{c}|{chunk:05x}")
            sims.append(hx)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "bucket": pa.array(buckets, type=pa.string()),
            "simhash": pa.array(sims, type=pa.string()),
        }
    )


def simhash_pairs(docs, max_hamming: int = 3):
    """documents → near-dup pairs with SimHash Hamming distance ≤ k.

    Pigeonhole bucketing with ``max_hamming + 1`` chunks: any pair within
    Hamming ``k`` of a 64-bit hash must agree exactly on at least one of
    ``k + 1`` disjoint bit ranges, so candidates come from a hash self-join
    per chunk bucket and are verified exactly — no all-pairs scan.  Chunk
    count scales with ``max_hamming`` (completeness holds for any k ≤ 31;
    above that a chunk would be under 2 bits wide and blocking is useless).
    """
    if not 0 <= max_hamming <= 31:
        raise ValueError(
            f"max_hamming={max_hamming} outside the blockable range [0, 31]"
        )
    from ..shuffle import hash_grouped

    sims = docs.map_batches(simhash_batch, batch_format="pyarrow")
    chunks = sims.map_batches(
        _simhash_chunk_rows,
        fn_kwargs={"n_chunks": max_hamming + 1},
        batch_format="pyarrow",
    )
    joined = chunks.join(
        chunks,
        join_type="inner",
        num_partitions=_pair_join_partitions(),
        on=("bucket",),
        left_suffix="",
        right_suffix="_r",
    )

    def verify(batch: pa.Table) -> pa.Table:
        kept = batch.filter(
            pc.less(batch.column("doc_id"), batch.column("doc_id_r"))
        )
        ha = kept.column("simhash").to_pylist()
        hb = kept.column("simhash_r").to_pylist()
        dist = np.fromiter(
            (bin(int(a, 16) ^ int(b, 16)).count("1") for a, b in zip(ha, hb)),
            dtype=np.int64,
            count=len(ha),
        )
        keep = dist <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(
                    kept.column("doc_id").to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "doc_b": pa.array(
                    kept.column("doc_id_r").to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "hamming": pa.array(dist[keep], type=pa.int64()),
            }
        )

    cand = joined.map_batches(verify, batch_format="pyarrow")
    return hash_grouped(
        cand,
        ["doc_a", "doc_b"],
        [("hamming", "min")],
        rename={"hamming_min": "hamming"},
    )


# ---------------------------------------------------------------------------
# end-to-end near-dedup: pairs → clusters → deduplicated corpus
# ---------------------------------------------------------------------------

def minhash_dedup(docs, num_perm: int = NUM_PERM, band_rows: int = BAND_ROWS):
    """documents → (doc_id,) of survivors after MinHash near-dedup.

    The full dedup story in one plan: LSH banding generates candidate
    pairs, distributed label propagation (:mod:`.graphops`) resolves
    transitive clusters, and the corpus is filtered to one keeper (the
    min doc id) per cluster via a hash join — losers are identified
    distributively, never collected on the driver (at web scale
    near-dups can be a third of the corpus).
    """
    import pyarrow.compute as pc

    from ..shuffle import local_hash_join, sized_partitions
    from .graphops import connected_components

    # every exchange moves ≤ one row per doc (pairs are sparser still);
    # a parquet-backed count is metadata-only
    parts = sized_partitions(docs.count(), None)
    comps = connected_components(
        minhash_lsh_pairs(docs, num_perm=num_perm, band_rows=band_rows),
        num_partitions=parts,
    )

    def to_losers(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("doc_id"), t.column("component")))
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64())})

    # anti join through local_hash_join, NOT Dataset.join: losers descends
    # from map_groups, whose empty output blocks are zero-column (Ray
    # 2.49) — a native-join partition containing only those has no doc_id
    # field and the Acero join aborts.  Losers are also sparse by nature
    # (a handful of rows across many partitions), which is exactly the
    # shape that triggers it.
    losers = comps.map_batches(to_losers, batch_format="pyarrow")
    id_schema = pa.schema([("doc_id", pa.int64())])
    return local_hash_join(
        docs.select_columns(["doc_id"]),
        losers,
        on=["doc_id"],
        left_schema=id_schema,
        right_schema=id_schema,
        how="anti",
        num_partitions=parts,
    )


def first_occurrence(ds, value_col: str, order_cols: list[str],
                     num_partitions: int | None = None):
    """Global first-occurrence dedup: per distinct ``value_col``, keep
    the single row with the lexicographically smallest ``order_cols`` —
    the C4-style "drop repeated lines/sentences, keep the earliest"
    corpus pass.

    Plan: digest the value to int64 per row (the string never keys the
    exchange), hash-partition on the digest so every copy of a value
    lands in one partition, then one vectorized sort + adjacent-compare
    per partition — no per-group Python.  Grouping inside the partition
    is by the VALUE, not its digest, so a digest collision cannot merge
    two distinct values."""
    from ..shuffle import hash_partitioned

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [_hash64(v) for v in batch.column(value_col).to_pylist()]
        return batch.append_column(
            "__vkey", pa.array(keys, type=pa.int64())
        )

    sort_keys = [(value_col, "ascending")] + [
        (c, "ascending") for c in order_cols
    ]

    def keep_first(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.drop_columns(["__vkey"])
        t2 = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        vals = t2.column(value_col).combine_chunks()
        first = np.ones(len(t2), dtype=bool)
        if len(t2) > 1:
            first[1:] = pc.not_equal(
                vals.slice(1), vals.slice(0, len(vals) - 1)
            ).to_numpy(zero_copy_only=False)
        return t2.filter(pa.array(first)).drop_columns(["__vkey"])

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return hash_partitioned(
        keyed, ["__vkey"], keep_first, num_partitions=num_partitions
    )


# ---------------------------------------------------------------------------
# Winnowing-fingerprint overlap pairs (substring-level near-dup candidates)
# ---------------------------------------------------------------------------

# ≥40 shared fingerprints cleanly separates the synthetic corpus's true
# near-dup clusters (41-94 shared) from its background (≤31 — the tiny
# 31-word vocabulary makes ordinary 8-char substrings corpus-common, so
# low thresholds flag everything; measured bimodal gap at sf0.001/sf0.01).
WINNOW_MIN_SHARED = 40


def winnow_fp_rows_batch(batch: pa.Table, k: int = 8, w: int = 6) -> pa.Table:
    """documents → one row per (doc_id, distinct winnowing fingerprint).

    Vectorized (``textstats._winnow_fps_vec``); fingerprints are
    mod 2^61−1, so they fit int64 natively."""
    from .textstats import _winnow_fps_vec

    if len(batch) == 0:
        return pa.table(
            {
                "h": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
    ids, fps = _winnow_fps_vec(batch, k=k, w=w)
    return pa.table(
        {
            "h": pa.array(fps.astype(np.int64), type=pa.int64()),
            "doc_id": pa.array(ids, type=pa.int64()),
        }
    )


def winnow_pairs(docs, min_shared: int = WINNOW_MIN_SHARED,
                 k: int = 8, w: int = 6, max_df: int | None = None):
    """documents → (doc_a, doc_b, n_shared) for pairs sharing ≥
    ``min_shared`` winnowing fingerprints — the substring-overlap
    near-dup detector (MOSS-style): two documents share a fingerprint
    iff they share a k-char substring the winnowing scheme selected, so
    this surfaces copies that token-level shingles miss (reorderings,
    partial quotes).

    Same inverted-index plan as :func:`jaccard_pairs`' intersection
    counting: fingerprint self-join → per-block pair-count combine →
    grouped sum; no broadcast, no driver state.  ``max_df`` is the
    hot-key control for web scale: a fingerprint present in f docs
    contributes f² join rows, so boilerplate substrings (site chrome,
    license headers) must be dropped before the join — the stop-words
    move of MOSS.  Left off by default because the synthetic corpus's
    31-word vocabulary makes EVERY substring common (a df cap there
    erases the true-dup signal instead of the noise); on real web text
    set it to a few × the expected duplication factor.  The SQL twin
    replays the rolling hash and self-joins the chosen set (assumes
    every doc has ≥ k chars, like the ``doc_winnow`` oracle)."""
    from ..shuffle import hash_grouped

    rows = docs.map_batches(
        winnow_fp_rows_batch,
        fn_kwargs={"k": k, "w": w},
        batch_format="pyarrow",
    ).materialize()  # consumed by both join sides; pin the blocks once
    if max_df is not None:
        # distinct (h, df) via hash_grouped count; keep rare fingerprints
        rare = hash_grouped(rows, ["h"], [([], "count_all")],
                            rename={"count_all": "df"})

        def rare_only(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.less_equal(batch.column("df"), max_df)
            ).drop_columns(["df"])

        keep = rare.map_batches(rare_only, batch_format="pyarrow")
        from ..shuffle import local_hash_join

        rows = local_hash_join(
            rows,
            keep,
            on=["h"],
            left_schema=pa.schema(
                [("h", pa.int64()), ("doc_id", pa.int64())]
            ),
            right_schema=pa.schema([("h", pa.int64())]),
            how="semi",
        ).materialize()
    cooc = _self_join_pairs(rows, "h")
    nshared = hash_grouped(
        cooc.map_batches(_pair_count_partial, batch_format="pyarrow"),
        ["doc_a", "doc_b"],
        [("n", "sum")],
        rename={"n_sum": "n_shared"},
    )

    def cut(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("n_shared"), min_shared)
        )

    return nshared.map_batches(cut, batch_format="pyarrow")


def _doc_shingles_vec(batch: pa.Table, n: int = SHINGLE_N):
    """(doc_id int64 ndarray, shingle Arrow string array), DISTINCT per
    doc — the vectorized twin of per-row ``shingle_set`` (same
    convention: documents shorter than ``n`` tokens contribute their
    whole token list as one shingle).  Windows are
    ``binary_join_element_wise`` over shifted slices of the flattened
    token stream; per-doc distinctness is one C-level group_by."""
    import numpy as np

    tok_lists = pc.split_pattern(batch.column("text").combine_chunks(), " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    flat = tok_lists.values
    offsets = np.asarray(tok_lists.offsets).astype(np.int64)
    counts = offsets[1:] - offsets[:-1]
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    pieces_ids: list[np.ndarray] = []
    pieces_grams: list[pa.Array] = []
    total = len(flat)
    if total >= n:
        pos = np.arange(total - n + 1)
        valid = parent[pos] == parent[pos + n - 1]
        starts = pos[valid]
        if len(starts):
            parts = [
                pc.take(flat, pa.array(starts + j, type=pa.int64()))
                for j in range(n)
            ]
            grams = (
                parts[0]
                if n == 1
                else pc.binary_join_element_wise(*parts, " ")
            )
            pieces_ids.append(doc_ids[parent[starts]])
            pieces_grams.append(grams)
    short = counts < n
    if short.any():
        # whole-text shingle for short docs (text IS the joined tokens)
        pieces_ids.append(doc_ids[short])
        pieces_grams.append(
            pc.take(
                batch.column("text").combine_chunks(),
                pa.array(np.flatnonzero(short), type=pa.int64()),
            )
        )
    if not pieces_ids:
        return np.array([], dtype=np.int64), pa.array([], type=pa.string())
    all_ids = np.concatenate(pieces_ids)
    all_grams = pa.concat_arrays(
        [g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
         for g in pieces_grams]
    )
    distinct = (
        pa.table(
            {
                "doc_id": pa.array(all_ids, type=pa.int64()),
                "s": all_grams,
            }
        )
        .group_by(["doc_id", "s"])
        .aggregate([])
    )
    return (
        distinct.column("doc_id").to_numpy(zero_copy_only=False),
        distinct.column("s").combine_chunks(),
    )


# ---------------------------------------------------------------------------
# Exact duplicated-substring spans (suffix-style dedup, token granularity)
# ---------------------------------------------------------------------------

DUP_SPAN_N = 12
# strip_dup_spans caches the (doc_id, text) projection in the object store
# only below this row count; above it, each consumer streams its own scan.
STRIP_CACHE_MAX_ROWS = 2_000_000


def _md5_hash64(s: str) -> int:
    """Signed int64 from the first 8 md5 bytes — the same md5-prefix
    reinterpretation as ``exact_dedup``'s ``fp_key``, so the DuckDB twin
    can group by the gram string (md5-prefix collisions are the shared,
    negligible caveat)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16) - (1 << 63)


def ngram_pos_rows_batch(batch: pa.Table, n: int = DUP_SPAN_N) -> pa.Table:
    """documents → one row per (gram hash, doc_id, token position) for
    EVERY token n-gram occurrence (positional, NOT distinct — repeats
    within a doc are duplicates too).  Docs shorter than ``n`` tokens
    emit nothing.  Vectorized windows (shifted slices of the flattened
    token stream, like ``_doc_shingles_vec``); md5 runs once per
    distinct-in-block gram value."""
    empty = pa.table(
        {
            "h": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
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
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    total = len(flat)
    if total < n:
        return empty
    pos = np.arange(total - n + 1)
    valid = parent[pos] == parent[pos + n - 1]
    starts = pos[valid]
    if len(starts) == 0:
        return empty
    parts = [
        pc.take(flat, pa.array(starts + j, type=pa.int64())) for j in range(n)
    ]
    grams = pc.binary_join_element_wise(*parts, " ")
    doc_idx = parent[starts]
    local_pos = starts - offsets[:-1][doc_idx]
    cache: dict[str, int] = {}
    hashes = [
        cache.get(g) or cache.setdefault(g, _md5_hash64(g))
        for g in grams.to_pylist()
    ]
    return pa.table(
        {
            "h": pa.array(hashes, type=pa.int64()),
            "doc_id": pa.array(doc_ids[doc_idx], type=pa.int64()),
            "pos": pa.array(local_pos, type=pa.int64()),
        }
    )


def _h_count_partial(batch: pa.Table) -> pa.Table:
    """Map-side combine: postings → (h, c) per block."""
    if len(batch) == 0:
        return pa.table(
            {
                "h": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            }
        )
    out = batch.select(["h"]).group_by(["h"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "h": out.column("h"),
            "c": out.column("count_all").cast(pa.int64()),
        }
    )


def _span_islands(n: int):
    """Per-partition gaps-and-islands: marked (doc_id, pos) rows →
    maximal merged spans (doc_id, start_tok, end_tok).  Each marked
    position covers tokens [pos, pos+n); sorted within a doc, interval
    ends are monotone, so a pairwise gap test merges correctly."""

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "start_tok": pa.array([], type=pa.int64()),
                "end_tok": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0 or "doc_id" not in t.column_names:
            return empty
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        p = t.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        brk = np.empty(len(d), dtype=bool)
        brk[0] = True
        brk[1:] = (d[1:] != d[:-1]) | ((p[1:] - p[:-1]) > n)
        starts_idx = np.flatnonzero(brk)
        last_idx = np.r_[starts_idx[1:] - 1, len(p) - 1]
        return pa.table(
            {
                "doc_id": pa.array(d[starts_idx], type=pa.int64()),
                "start_tok": pa.array(p[starts_idx], type=pa.int64()),
                "end_tok": pa.array(p[last_idx] + n, type=pa.int64()),
            }
        )

    return fn


def dup_spans(docs, n: int = DUP_SPAN_N, min_count: int = 2,
              num_partitions: int | None = None):
    """documents → (doc_id, start_tok, end_tok): maximal token spans
    covered by n-grams occurring ≥ ``min_count`` times ACROSS the corpus
    (within-doc repeats included) — the exact substring-duplication
    detector of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (2022), at token granularity.

    Plan: positional n-gram postings (one row per occurrence) →
    map-side-combined grouped count per gram hash → hot-gram set
    (count ≥ min_count) → semi-join postings against the hot set →
    per-doc gaps-and-islands merge, hash-partitioned on doc_id.  Every
    stage is an int64-keyed exchange or a vectorized block map; nothing
    touches the driver.  At 100 TB the posting exchange is the cost
    (one row per token) — the same bound as any n-gram count — and a
    boilerplate df cap composes exactly like :func:`winnow_pairs`'s
    ``max_df``.
    """
    from ..shuffle import (
        hash_grouped,
        hash_partitioned,
        local_hash_join,
        sized_partitions,
    )

    posts = docs.map_batches(
        ngram_pos_rows_batch, fn_kwargs={"n": n}, batch_format="pyarrow"
    ).materialize()  # consumed by the count AND the semi-join probe
    # exchanges sized to the (already materialized, so free to count)
    # posting table — a tiny corpus takes the n=1 fast path instead of
    # paying CPU-count sort exchanges per stage
    parts = sized_partitions(posts.count(), num_partitions)
    counts = hash_grouped(
        posts.map_batches(_h_count_partial, batch_format="pyarrow"),
        ["h"],
        [("c", "sum")],
        rename={"c_sum": "c"},
        num_partitions=parts,
    )

    def hot_only(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": t.column("h")
                .combine_chunks()
                .filter(pc.greater_equal(t.column("c").combine_chunks(),
                                         min_count))
            }
        )

    hot = counts.map_batches(hot_only, batch_format="pyarrow")
    marked = local_hash_join(
        posts,
        hot,
        on=["h"],
        left_schema=pa.schema(
            [("h", pa.int64()), ("doc_id", pa.int64()), ("pos", pa.int64())]
        ),
        right_schema=pa.schema([("h", pa.int64())]),
        how="semi",
        num_partitions=parts,
    )
    return hash_partitioned(
        marked.map_batches(
            lambda t: t.select(["doc_id", "pos"]), batch_format="pyarrow"
        ),
        ["doc_id"],
        _span_islands(n),
        num_partitions=parts,
    )


def _strip_spans_fn(t: pa.Table) -> pa.Table:
    """Per-partition rebuild: (doc_id, text, start_tok?, end_tok?) join
    rows → (doc_id, text) with covered tokens removed.  Coverage is one
    prefix-sum over a ±1 delta array indexed by global token position;
    per-doc strings rebuild through a ListArray + ``binary_join`` — no
    per-row Python."""
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
        }
    )
    if len(t) == 0 or "doc_id" not in t.column_names:
        return empty
    d = t.column("doc_id").to_numpy(zero_copy_only=False)
    uniq, first_idx = np.unique(d, return_index=True)
    texts = pc.take(
        t.column("text").combine_chunks(),
        pa.array(first_idx, type=pa.int64()),
    )
    tok_lists = pc.split_pattern(texts, " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    flat = tok_lists.values
    offsets = np.asarray(tok_lists.offsets).astype(np.int64)
    sp = t.filter(pc.is_valid(t.column("start_tok")))
    delta = np.zeros(len(flat) + 1, dtype=np.int64)
    if len(sp):
        sd = sp.column("doc_id").to_numpy(zero_copy_only=False)
        ss = sp.column("start_tok").to_numpy(zero_copy_only=False).astype(np.int64)
        se = sp.column("end_tok").to_numpy(zero_copy_only=False).astype(np.int64)
        di = np.searchsorted(uniq, sd)
        np.add.at(delta, offsets[di] + ss, 1)
        np.add.at(delta, offsets[di] + se, -1)
    covered = np.cumsum(delta[:-1]) > 0
    keep = ~covered
    counts = offsets[1:] - offsets[:-1]
    parent = np.repeat(np.arange(len(uniq), dtype=np.int64), counts)
    kept_counts = np.bincount(parent[keep], minlength=len(uniq))
    new_offsets = np.concatenate(([0], np.cumsum(kept_counts)))
    kept_flat = flat.filter(pa.array(keep))
    # int64 offsets: a partition sized by sized_partitions (~200k docs)
    # can exceed 2^31 tokens at web-scale doc lengths; LargeListArray
    # keeps the rebuild safe and pc.binary_join accepts large_list.
    la = pa.LargeListArray.from_arrays(
        pa.array(new_offsets, type=pa.int64()), kept_flat
    )
    return pa.table(
        {
            "doc_id": pa.array(uniq, type=pa.int64()),
            "text": pc.binary_join(la, " "),
        }
    )


def strip_dup_spans(docs, n: int = DUP_SPAN_N, min_count: int = 2,
                    num_partitions: int | None = None):
    """documents → (doc_id, text) with every corpus-duplicated token
    span removed — the destructive half of Lee et al.'s exact substring
    dedup (ALL occurrences cut, not keep-one; remaining tokens re-join
    on single spaces, the corpus's canonical form).

    One extra int64 exchange over :func:`dup_spans`: the span table
    left-joins back onto the documents (``local_hash_join`` on doc_id)
    and a hash-partitioned vectorized pass rebuilds each doc's text via
    a ±1 coverage prefix-sum and an Arrow list join.  Docs with no
    duplicated spans pass through verbatim.
    """
    from ..shuffle import hash_partitioned, local_hash_join, sized_partitions

    # `base` is consumed twice (posting build inside dup_spans + the
    # join-back).  Materializing the full (doc_id, text) column pins the
    # whole corpus text in the object store — a scale-killer at 100 TB —
    # so cache only below a size threshold (the same pattern as the
    # kg edge-naming broadcast/join switch); above it the two consumers
    # each run their own streaming scan of the source.
    n_rows = docs.count()
    base = docs.select_columns(["doc_id", "text"])
    if n_rows <= STRIP_CACHE_MAX_ROWS:
        base = base.materialize()
    # the doc-keyed join/rebuild exchanges move ~one row per doc (+ one
    # per span); the posting-sized exchanges inside dup_spans size
    # themselves independently
    parts = sized_partitions(n_rows, num_partitions)
    spans = dup_spans(base, n=n, min_count=min_count,
                      num_partitions=num_partitions)
    joined = local_hash_join(
        base,
        spans,
        on=["doc_id"],
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string())]
        ),
        right_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("start_tok", pa.int64()),
                ("end_tok", pa.int64()),
            ]
        ),
        how="left_outer",
        num_partitions=parts,
    )
    return hash_partitioned(joined, ["doc_id"], _strip_spans_fn,
                            num_partitions=parts)


# ---------------------------------------------------------------------------
# Per-source boilerplate removal (RefinedWeb/C4-style template stripping)
# ---------------------------------------------------------------------------

BOILER_N = 8  # gram width: shorter than DUP_SPAN_N — banners are short
BOILER_MIN_FRAC = 0.5  # a gram is boilerplate on a source when it
BOILER_MIN_DOCS = 2  # appears in ≥ frac of the source's docs (≥ min)


#: the planted per-source template, 7 tokens + the source name = 8
BANNER_TAIL = "nav home about contact search login sitemap"


def inject_nav_banner_batch(batch: pa.Table) -> pa.Table:
    """Plant a deterministic per-source nav banner on the docs with
    ``doc_id % 4 != 0`` — a disclosed test/benchmark device (the same
    idiom as the synthetic-PII and alias-typo injections): the sandbox
    corpus carries no real site templates, and the planted one gives
    the boilerplate detector a 75% document frequency to find while
    the untouched quarter pins the "not everything is boilerplate"
    side.  Replayed verbatim by the SQL twin."""
    import pyarrow.compute as pc_

    if batch.num_rows == 0 or "source" not in batch.column_names:
        return batch
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    hit = pa.array(doc_id % 4 != 0)
    banner = pc_.binary_join_element_wise(
        batch.column("source").combine_chunks(),
        pa.array([BANNER_TAIL] * batch.num_rows),
        batch.column("text").combine_chunks(),
        " ",
    )
    cols = {name: batch.column(name) for name in batch.column_names}
    cols["text"] = pc_.if_else(
        hit, banner, batch.column("text").combine_chunks()
    )
    return pa.table(cols)


def _boiler_postings_batch(batch: pa.Table, n: int = BOILER_N) -> pa.Table:
    """documents → one row per (src, k, doc_id, pos) positional n-gram
    occurrence, where ``src`` is the int64 source digest and ``k`` the
    digest of ``source|gram`` — the single-key identity the df count
    and the semi-join both exchange on (per-source gram frequency is
    the boilerplate signal, unlike :func:`dup_spans`' global count)."""
    empty = pa.table(
        {
            "k": pa.array([], type=pa.int64()),
            "src": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
        }
    )
    if len(batch) == 0 or "source" not in batch.column_names:
        return empty
    tok_lists = pc.split_pattern(batch.column("text").combine_chunks(), " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    flat = tok_lists.values
    offsets = np.asarray(tok_lists.offsets).astype(np.int64)
    counts = offsets[1:] - offsets[:-1]
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sources = batch.column("source").to_pylist()
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    total = len(flat)
    if total < n:
        return empty
    pos = np.arange(total - n + 1)
    valid = parent[pos] == parent[pos + n - 1]
    starts = pos[valid]
    if len(starts) == 0:
        return empty
    parts = [
        pc.take(flat, pa.array(starts + j, type=pa.int64())) for j in range(n)
    ]
    grams = pc.binary_join_element_wise(*parts, " ").to_pylist()
    owner = parent[starts]
    src_digs = np.array(
        [_md5_key64(s) for s in sources], dtype=np.int64
    )  # one md5 per batch ROW, not per token
    cache: dict[tuple, int] = {}

    def kd(o: int, g: str) -> int:
        key = (sources[o], g)  # one md5 per distinct-in-block (source, gram)
        v = cache.get(key)
        if v is None:
            v = _md5_key64(f"{sources[o]}|{g}")
            cache[key] = v
        return v

    ks = np.fromiter(
        (kd(int(o), g) for o, g in zip(owner, grams)),
        dtype=np.int64,
        count=len(grams),
    )
    return pa.table(
        {
            "k": pa.array(ks),
            "src": pa.array(src_digs[owner]),
            "doc_id": pa.array(doc_ids[owner]),
            "pos": pa.array(
                (starts - offsets[:-1][owner]).astype(np.int64)
            ),
        }
    )


def boilerplate_spans(
    docs,
    n: int = BOILER_N,
    min_frac: float = BOILER_MIN_FRAC,
    min_docs: int = BOILER_MIN_DOCS,
    num_partitions: int | None = None,
):
    """documents(doc_id, text, source) → (doc_id, start_tok, end_tok):
    maximal token spans covered by PER-SOURCE boilerplate n-grams —
    grams appearing in ≥ ``min_frac`` of a source's documents (and in
    ≥ ``min_docs``), the RefinedWeb/C4-style template/navigation
    stripping signal (a nav banner repeats on most of a site's pages;
    body text doesn't).

    Plan: positional postings carrying the ``source|gram`` digest →
    per-block distinct → grouped distinct-doc count per (src, gram) →
    one tiny per-source totals join → df-fraction filter → semi-join
    of the postings against the boilerplate set → the shared
    gaps-and-islands merge.  Per-source doc totals are a
    sources-cardinality table; everything else is int64-keyed and
    data-sized.  The df comparison is one float division replayed
    verbatim by the SQL twin.
    """
    from ..shuffle import (
        hash_grouped,
        hash_partitioned,
        local_hash_join,
        sized_partitions,
    )

    posts = docs.map_batches(
        _boiler_postings_batch, fn_kwargs={"n": n}, batch_format="pyarrow"
    ).materialize()
    parts = sized_partitions(posts.count(), num_partitions)

    # distinct (k, src, doc_id) — src is a function of k, riding along
    distinct = hash_grouped(
        posts.map_batches(
            lambda t: (
                t.select(["k", "src", "doc_id"])
                .group_by(["k", "src", "doc_id"])
                .aggregate([])
            ),
            batch_format="pyarrow",
        ),
        ["k", "src", "doc_id"],
        [],
        hash_cols=["k"],
        num_partitions=parts,
    )
    df_tbl = hash_grouped(
        distinct,
        ["k", "src"],
        [("doc_id", "count")],
        rename={"doc_id_count": "df"},
        hash_cols=["k"],
        num_partitions=parts,
    )

    def src_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        digs = [_md5_key64(s) for s in t.column("source").to_pylist()]
        agg = pa.table(
            {
                "src": pa.array(digs, type=pa.int64()),
                "c": pa.array(np.ones(len(digs), dtype=np.int64)),
            }
        ).group_by(["src"]).aggregate([("c", "sum")])
        return pa.table(
            {"src": agg.column("src"), "c": agg.column("c_sum")}
        )

    totals = hash_grouped(
        docs.map_batches(src_partial, batch_format="pyarrow"),
        ["src"],
        [("c", "sum")],
        rename={"c_sum": "total"},
        num_partitions=1,  # sources are few by construction
    )

    hot_joined = local_hash_join(
        df_tbl,
        totals,
        on=["src"],
        left_schema=pa.schema(
            [("k", pa.int64()), ("src", pa.int64()), ("df", pa.int64())]
        ),
        right_schema=pa.schema(
            [("src", pa.int64()), ("total", pa.int64())]
        ),
        num_partitions=parts,
    )

    def hot_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "df" not in t.column_names:
            return pa.table({"k": pa.array([], type=pa.int64())})
        df = t.column("df").to_numpy(zero_copy_only=False)
        total = t.column("total").to_numpy(zero_copy_only=False)
        # same float expression as the SQL twin: df * 1.0 / total
        keep = (df >= min_docs) & ((df * 1.0) / total >= min_frac)
        return pa.table(
            {"k": t.column("k").combine_chunks().filter(pa.array(keep))}
        )

    hot = hot_joined.map_batches(hot_only, batch_format="pyarrow")
    marked = local_hash_join(
        posts,
        hot,
        on=["k"],
        left_schema=pa.schema(
            [
                ("k", pa.int64()),
                ("src", pa.int64()),
                ("doc_id", pa.int64()),
                ("pos", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("k", pa.int64())]),
        how="semi",
        num_partitions=parts,
    )
    return hash_partitioned(
        marked.map_batches(
            lambda t: t.select(["doc_id", "pos"]), batch_format="pyarrow"
        ),
        ["doc_id"],
        _span_islands(n),
        num_partitions=parts,
    )


def strip_boilerplate(
    docs,
    n: int = BOILER_N,
    min_frac: float = BOILER_MIN_FRAC,
    min_docs: int = BOILER_MIN_DOCS,
    num_partitions: int | None = None,
):
    """documents(doc_id, text, source) → (doc_id, text) with every
    per-source boilerplate span removed — same join-back/rebuild tail
    as :func:`strip_dup_spans` (cache-gated base, coverage prefix-sum,
    single-space rejoin)."""
    from ..shuffle import hash_partitioned, local_hash_join, sized_partitions

    n_rows = docs.count()
    base = docs.select_columns(["doc_id", "text", "source"])
    if n_rows <= STRIP_CACHE_MAX_ROWS:
        base = base.materialize()
    parts = sized_partitions(n_rows, num_partitions)
    spans = boilerplate_spans(
        base,
        n=n,
        min_frac=min_frac,
        min_docs=min_docs,
        num_partitions=num_partitions,
    )
    joined = local_hash_join(
        base.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        ),
        spans,
        on=["doc_id"],
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string())]
        ),
        right_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("start_tok", pa.int64()),
                ("end_tok", pa.int64()),
            ]
        ),
        how="left_outer",
        num_partitions=parts,
    )
    return hash_partitioned(joined, ["doc_id"], _strip_spans_fn,
                            num_partitions=parts)


# ---------------------------------------------------------------------------
# Incremental cross-wave MinHash dedup (continuous-crawl filter)
# ---------------------------------------------------------------------------

def _md5_key64(s: str) -> int:
    """First 8 md5 bytes as SIGNED big-endian int64 — the
    ``surface_hash64`` convention, so the SQL twin is the existing
    ``_sql_hash64`` two's-complement wrap."""
    return int.from_bytes(
        hashlib.md5(s.encode("utf-8")).digest()[:8], "big", signed=True
    )


def _band_keys_batch(batch: pa.Table,
                     num_perm: int = NUM_PERM,
                     band_rows: int = BAND_ROWS) -> pa.Table:
    """documents → (doc_id, bkey): int64 digest per LSH band bucket.
    The digest (not the bucket string) is the exchange/join key on BOTH
    engines, so an md5-prefix collision — however unlikely — produces
    the same answer on both sides."""
    bands = band_rows_batch(batch, num_perm=num_perm, band_rows=band_rows)
    cache: dict[str, int] = {}
    keys = [
        cache.get(b) or cache.setdefault(b, _md5_key64(b))
        for b in bands.column("bucket").to_pylist()
    ]
    return pa.table(
        {
            "doc_id": bands.column("doc_id"),
            "bkey": pa.array(keys, type=pa.int64()),
        }
    )


def minhash_incremental(prior_docs, new_docs,
                        num_perm: int = NUM_PERM,
                        band_rows: int = BAND_ROWS,
                        num_partitions: int | None = None):
    """new_docs → (doc_id,) survivors: new-crawl docs with NO LSH band
    bucket collision against the prior crawl — the incremental
    near-dedup filter of a continuous ingestion pipeline (the prior
    corpus is summarized by its band buckets, never rescanned as text;
    within-wave dedup remains :func:`minhash_dedup`).

    Plan: band-key rows for both waves (4 int64 rows per doc at the
    default 4 bands), distinct prior buckets via one grouped pass, a
    semi-join marking collided new docs, and an anti-join producing
    survivors — all int64-keyed exchanges sized to the band tables, so
    at 10^12 prior docs the state this operator carries is the banded
    bucket set, the same asymptotics as maintaining any LSH index.
    """
    from ..shuffle import hash_grouped, local_hash_join, sized_partitions

    kw = {"num_perm": num_perm, "band_rows": band_rows}
    b1 = new_docs.map_batches(
        _band_keys_batch, fn_kwargs=kw, batch_format="pyarrow"
    ).materialize()  # consumed by the semi-join AND (free) to size plans
    # band rows per doc are constant, and the two waves are the same
    # order of magnitude — size every exchange from the new wave's
    # (already materialized) band table
    parts = sized_partitions(b1.count(), num_partitions)
    b0 = hash_grouped(
        prior_docs.map_batches(
            _band_keys_batch, fn_kwargs=kw, batch_format="pyarrow"
        ).map_batches(
            lambda t: t.select(["bkey"]), batch_format="pyarrow"
        ),
        ["bkey"],
        [],
        num_partitions=parts,
    )
    hit_rows = local_hash_join(
        b1,
        b0,
        on=["bkey"],
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("bkey", pa.int64())]
        ),
        right_schema=pa.schema([("bkey", pa.int64())]),
        how="semi",
        num_partitions=parts,
    )
    hits = hash_grouped(
        hit_rows.map_batches(
            lambda t: t.select(["doc_id"]), batch_format="pyarrow"
        ),
        ["doc_id"],
        [],
        num_partitions=parts,
    )
    return local_hash_join(
        new_docs.select_columns(["doc_id"]),
        hits,
        on=["doc_id"],
        left_schema=pa.schema([("doc_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64())]),
        how="anti",
        num_partitions=parts,
    )
