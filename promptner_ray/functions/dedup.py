"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data dedup suite over the ``documents`` table.  Physical plans are
Arrow-native end to end: candidate pairs come from hash self-joins on the
blocking key (shingle / LSH band bucket / SimHash chunk), pair counting and
keep-first selection use Ray Data's native grouped aggregates
(``groupby([...]).count() / .aggregate(Min, Sum)`` — C++ kernels, no
per-group Python), and small sides (per-doc shingle sizes) are broadcast
via ``ray.put`` and resolved once per task.

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
PAIR_JOIN_PARTITIONS = 16


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


def exact_dedup(docs):
    """documents → (fp, doc_id=keeper, n_dups): one row per distinct text.

    Map-side combine then a native grouped Min/Sum — the final exchange
    moves one row per distinct hash per block, never raw rows.
    """
    from ray.data.aggregate import Min, Sum

    partials = docs.map_batches(exact_partial_batch, batch_format="pyarrow")
    merged = partials.groupby("fp").aggregate(Min("doc_id"), Sum("n_dups"))
    return _rename(merged, {"min(doc_id)": "doc_id", "sum(n_dups)": "n_dups"})


# ---------------------------------------------------------------------------
# Candidate pairs via hash self-join on a blocking key
# ---------------------------------------------------------------------------

def _self_join_pairs(keyed, key: str, num_partitions: int = PAIR_JOIN_PARTITIONS):
    """(key, doc_id) rows → ordered candidate pairs (doc_a < doc_b).

    Arrow hash join on the blocking key; the a<b filter is a vectorized
    kernel.  Replaces per-group Python pair loops.
    """
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
        return pa.table(
            {
                "doc_a": kept.column("doc_id"),
                "doc_b": kept.column("doc_id_r"),
            }
        )

    return joined.map_batches(keep_ordered, batch_format="pyarrow")


def _distinct_pairs(pairs):
    """Distinct (doc_a, doc_b) via native multi-key grouped count."""
    return pairs.groupby(["doc_a", "doc_b"]).count().select_columns(
        ["doc_a", "doc_b"]
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


def _hash64(s: str) -> int:
    """Signed 64-bit shingle hash (int64-friendly join/lookup key)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
        "big",
        signed=True,
    )


def _shingle_hash_rows_batch(batch: pa.Table) -> pa.Table:
    """documents → one row per (doc_id, distinct shingle hash)."""
    doc_ids: list[int] = []
    hashes: list[int] = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        for s in shingle_set(text):
            doc_ids.append(doc_id)
            hashes.append(_hash64(s))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "h": pa.array(hashes, type=pa.int64()),
        }
    )


class _JaccardVerifier:
    """Exact Jaccard for candidate pairs against broadcast shingle-hash sets.

    Runs BEFORE the global pair dedup so the only shuffle after the join
    carries surviving pairs (tiny) instead of every co-occurrence row.
    Candidate duplicates across blocks verify to identical values and
    collapse in the final (tiny) grouped Min.
    """

    def __init__(self, sets_ref, threshold: float) -> None:
        import ray

        self.sets: dict[int, np.ndarray] = ray.get(sets_ref)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        packed = np.unique((a << np.int64(32)) | b)  # in-block dedup
        out_a, out_b, out_j = [], [], []
        for key in packed:
            da = int(key >> np.int64(32))
            db = int(key & np.int64(0xFFFFFFFF))
            sa, sb = self.sets[da], self.sets[db]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            j = inter / (sa.size + sb.size - inter)
            if j >= self.threshold:
                out_a.append(da)
                out_b.append(db)
                out_j.append(j)
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "jaccard": pa.array(out_j, type=pa.float64()),
            }
        )


def jaccard_pairs(docs, threshold: float = 0.6):
    """documents → (doc_a, doc_b, jaccard) for pairs with J ≥ threshold.

    Exact inverted-index plan: int64 shingle-hash self-join generates
    candidates; each block verifies exact Jaccard against broadcast
    per-doc shingle-hash sets and filters BELOW-threshold pairs locally, so
    the final distinct-pair aggregate shuffles only survivors (hundreds,
    not millions).  The broadcast side is one hash per distinct
    (doc, shingle) — fine at benchmark scale; the 100 TB scale path is
    :func:`minhash_lsh_pairs` (bounded band buckets, no broadcast).
    """
    import ray
    from ray.data.aggregate import Min

    sh = docs.map_batches(
        _shingle_hash_rows_batch, batch_format="pyarrow"
    ).materialize()  # reused by both the broadcast build and the join
    df = sh.to_pandas()
    order = np.argsort(df["doc_id"].to_numpy(), kind="stable")
    doc_sorted = df["doc_id"].to_numpy()[order]
    h_sorted = df["h"].to_numpy()[order]
    bounds = np.searchsorted(
        doc_sorted, np.unique(doc_sorted), side="left"
    ).tolist() + [len(doc_sorted)]
    uniq = np.unique(doc_sorted)
    sets = {
        int(d): np.sort(h_sorted[bounds[i] : bounds[i + 1]])
        for i, d in enumerate(uniq)
    }
    sets_ref = ray.put(sets)

    cand = _self_join_pairs(sh, "h")
    survivors = cand.map_batches(
        _JaccardVerifier,
        fn_constructor_kwargs={"sets_ref": sets_ref, "threshold": threshold},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    deduped = survivors.groupby(["doc_a", "doc_b"]).aggregate(Min("jaccard"))
    return _rename(deduped, {"min(jaccard)": "jaccard"})


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


def simhash_pairs(docs, max_hamming: int = 3):
    """documents → near-dup pairs with SimHash Hamming distance ≤ k.

    Pigeonhole bucketing: any pair within Hamming 3 of a 64-bit hash shares
    at least one of its four 16-bit chunks, so candidates come from a hash
    self-join per chunk bucket and are verified exactly — no all-pairs scan.
    """
    from ray.data.aggregate import Min

    sims = docs.map_batches(simhash_batch, batch_format="pyarrow")
    chunks = sims.map_batches(_simhash_chunk_rows, batch_format="pyarrow")
    joined = chunks.join(
        chunks,
        join_type="inner",
        num_partitions=PAIR_JOIN_PARTITIONS,
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
    deduped = cand.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming"))
    return _rename(deduped, {"min(hamming)": "hamming"})
