"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data dedup suite over the ``documents`` table.  Shuffle discipline
mirrors the KG linker (promptner_ray/stages/link.py): every groupby is
preceded by a map-side combine so hot keys collapse per block before the
exchange; small sides (per-doc shingle counts) are broadcast via ``ray.put``
and resolved once per task, never re-shipped per batch.

Hashing is md5-hex so the DuckDB oracle (md5 + lexicographic min over
VARCHAR) reproduces signatures exactly.  At 100 TB scale the md5 inner loop
would swap for a vectorized 64-bit hash (xxhash/np) — the banding/bucketing
plan is unchanged; md5 is the conformance-friendly default.

Shingle convention (mirrored in SQL): word 3-grams over the single-space
token split; documents shorter than 3 tokens contribute their whole token
list as one shingle.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa

SHINGLE_N = 3


def shingle_set(text: str, n: int = SHINGLE_N) -> set[str]:
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 1))
    }


# ---------------------------------------------------------------------------
# Exact dedup: first (min doc_id) per content hash
# ---------------------------------------------------------------------------

def exact_partial_batch(batch: pa.Table) -> pa.Table:
    """Map-side combine: (fp, min doc_id, count) per block."""
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
            "doc_id": pa.array([v[0] for v in agg.values()], type=pa.int64()),
            "n_dups": pa.array([v[1] for v in agg.values()], type=pa.int64()),
        }
    )


def exact_merge_group(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "fp": group.column("fp").slice(0, 1),
            "doc_id": pa.array(
                [min(group.column("doc_id").to_pylist())], type=pa.int64()
            ),
            "n_dups": pa.array(
                [sum(group.column("n_dups").to_pylist())], type=pa.int64()
            ),
        }
    )


def exact_dedup(docs):
    """documents → (fp, doc_id=keeper, n_dups): one row per distinct text."""
    partials = docs.map_batches(exact_partial_batch, batch_format="pyarrow")
    return partials.groupby("fp").map_groups(
        exact_merge_group, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact, inverted-index plan)
# ---------------------------------------------------------------------------

def shingle_rows_batch(batch: pa.Table) -> pa.Table:
    """documents → one row per (doc_id, distinct shingle)."""
    doc_ids: list[int] = []
    shingles: list[str] = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        for s in shingle_set(text):
            doc_ids.append(doc_id)
            shingles.append(s)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "s": pa.array(shingles, type=pa.string()),
        }
    )


def _pairs_from_shingle_group(group: pa.Table) -> pa.Table:
    """One shingle's posting list → all co-occurring doc pairs (n=1 each)."""
    docs = sorted(set(group.column("doc_id").to_pylist()))
    a_ids, b_ids = [], []
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            a_ids.append(a)
            b_ids.append(b)
    return pa.table(
        {
            "doc_a": pa.array(a_ids, type=pa.int64()),
            "doc_b": pa.array(b_ids, type=pa.int64()),
        }
    )


def _pair_partial_counts(batch: pa.Table) -> pa.Table:
    counts: Counter[tuple[int, int]] = Counter()
    for a, b in zip(
        batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()
    ):
        counts[(a, b)] += 1
    keys = list(counts.keys())
    return pa.table(
        {
            "pair": pa.array([f"{a}:{b}" for a, b in keys], type=pa.string()),
            "doc_a": pa.array([a for a, _ in keys], type=pa.int64()),
            "doc_b": pa.array([b for _, b in keys], type=pa.int64()),
            "n": pa.array(list(counts.values()), type=pa.int64()),
        }
    )


class _JaccardFinalizer:
    """Merge pair partials + attach Jaccard from broadcast per-doc sizes."""

    def __init__(self, sizes_ref, threshold: float) -> None:
        import ray

        self.sizes: dict[int, int] = ray.get(sizes_ref)
        self.threshold = threshold

    def __call__(self, group: pa.Table) -> pa.Table:
        a = group.column("doc_a")[0].as_py()
        b = group.column("doc_b")[0].as_py()
        ninter = sum(group.column("n").to_pylist())
        union = self.sizes[a] + self.sizes[b] - ninter
        j = ninter / union
        if j < self.threshold:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array([a], type=pa.int64()),
                "doc_b": pa.array([b], type=pa.int64()),
                "jaccard": pa.array([j], type=pa.float64()),
            }
        )


def jaccard_pairs(docs, threshold: float = 0.6):
    """documents → (doc_a, doc_b, jaccard) for pairs with J ≥ threshold.

    Exact inverted-index plan: shingle posting lists → co-occurrence pairs →
    two-phase pair counts → Jaccard against broadcast per-doc shingle sizes.
    Exact-but-quadratic in posting-list length: the scale path for 100 TB is
    :func:`minhash_lsh_pairs`, which bounds work per band bucket.
    """
    import ray

    shingles = docs.map_batches(shingle_rows_batch, batch_format="pyarrow")
    sizes_tbl = (
        shingles.groupby("doc_id")
        .count()
        .to_pandas()  # one small row per doc (post-aggregate)
    )
    sizes_ref = ray.put(
        dict(zip(sizes_tbl["doc_id"], sizes_tbl["count()"]))
    )
    pairs = shingles.groupby("s").map_groups(
        _pairs_from_shingle_group, batch_format="pyarrow"
    )
    partials = pairs.map_batches(_pair_partial_counts, batch_format="pyarrow")
    return (
        partials.groupby("pair")
        .map_groups(
            _JaccardFinalizer,
            fn_constructor_kwargs={
                "sizes_ref": sizes_ref,
                "threshold": threshold,
            },
            batch_format="pyarrow",
            concurrency=2,
        )
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
    """documents → one row per (doc_id, band bucket key)."""
    doc_ids: list[int] = []
    buckets: list[str] = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        sig = minhash_signature(text, num_perm)
        for band in range(num_perm // band_rows):
            key = ",".join(sig[band * band_rows : (band + 1) * band_rows])
            doc_ids.append(doc_id)
            buckets.append(f"{band}|{key}")
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "bucket": pa.array(buckets, type=pa.string()),
        }
    )


def _dedup_pair_group(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_a": group.column("doc_a").slice(0, 1),
            "doc_b": group.column("doc_b").slice(0, 1),
        }
    )


def minhash_lsh_pairs(docs, num_perm: int = NUM_PERM, band_rows: int = BAND_ROWS):
    """documents → distinct candidate near-dup pairs via LSH banding."""
    bands = docs.map_batches(
        band_rows_batch,
        fn_kwargs={"num_perm": num_perm, "band_rows": band_rows},
        batch_format="pyarrow",
    )
    pairs = bands.groupby("bucket").map_groups(
        _pairs_from_shingle_group, batch_format="pyarrow"
    )
    keyed = pairs.map_batches(_pair_partial_counts, batch_format="pyarrow")
    return (
        keyed.groupby("pair")
        .map_groups(_dedup_pair_group, batch_format="pyarrow")
        .select_columns(["doc_a", "doc_b"])
    )


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
    """documents → (doc_id, simhash hex)."""
    hashes = [
        f"{simhash64(t):016x}" for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(hashes, type=pa.string()),
        }
    )


def _simhash_chunk_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) → one row per 16-bit chunk bucket."""
    doc_ids, buckets, sims = [], [], []
    for doc_id, hx in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("simhash").to_pylist(),
    ):
        h = int(hx, 16)
        for c in range(4):
            chunk = (h >> (16 * c)) & 0xFFFF
            doc_ids.append(doc_id)
            buckets.append(f"{c}|{chunk:04x}")
            sims.append(hx)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "bucket": pa.array(buckets, type=pa.string()),
            "simhash": pa.array(sims, type=pa.string()),
        }
    )


def _simhash_pair_group(max_hamming: int):
    def fn(group: pa.Table) -> pa.Table:
        rows = sorted(
            set(
                zip(
                    group.column("doc_id").to_pylist(),
                    group.column("simhash").to_pylist(),
                )
            )
        )
        a_ids, b_ids, dists = [], [], []
        for i, (da, ha) in enumerate(rows):
            for db, hb in rows[i + 1 :]:
                d = bin(int(ha, 16) ^ int(hb, 16)).count("1")
                if d <= max_hamming:
                    a_ids.append(da)
                    b_ids.append(db)
                    dists.append(d)
        return pa.table(
            {
                "doc_a": pa.array(a_ids, type=pa.int64()),
                "doc_b": pa.array(b_ids, type=pa.int64()),
                "hamming": pa.array(dists, type=pa.int64()),
            }
        )

    return fn


def simhash_pairs(docs, max_hamming: int = 3):
    """documents → near-dup pairs with SimHash Hamming distance ≤ k.

    Pigeonhole bucketing: any pair within Hamming 3 of a 64-bit hash shares
    at least one of its four 16-bit chunks, so candidates are generated per
    chunk bucket and verified exactly — no all-pairs scan.
    """
    sims = docs.map_batches(simhash_batch, batch_format="pyarrow")
    chunks = sims.map_batches(_simhash_chunk_rows, batch_format="pyarrow")
    cand = chunks.groupby("bucket").map_groups(
        _simhash_pair_group(max_hamming), batch_format="pyarrow"
    )
    keyed = cand.map_batches(_simhash_pair_dedup_key, batch_format="pyarrow")
    return (
        keyed.groupby("pair")
        .map_groups(_simhash_dedup_group, batch_format="pyarrow")
        .select_columns(["doc_a", "doc_b", "hamming"])
    )


def _simhash_pair_dedup_key(batch: pa.Table) -> pa.Table:
    pair = [
        f"{a}:{b}"
        for a, b in zip(
            batch.column("doc_a").to_pylist(),
            batch.column("doc_b").to_pylist(),
        )
    ]
    return batch.append_column("pair", pa.array(pair, type=pa.string()))


def _simhash_dedup_group(group: pa.Table) -> pa.Table:
    return group.slice(0, 1).select(["doc_a", "doc_b", "hamming"])
