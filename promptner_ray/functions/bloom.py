"""Bloom-filter decontamination: the constant-size probe-set path.

Third mergeable sketch beside count-min (:mod:`.sketch`) and
HyperLogLog (:mod:`.hll`): CM answers "how often", HLL "how many
distinct", Bloom answers "is this key in the set" with one-sided error.

Why it exists next to :mod:`.decontam`: the exact pass broadcasts the
benchmark's full distinct-digest set — right while benchmarks are MBs,
wrong when the deny-list grows to 10^9+ entries (every known benchmark
× paraphrases, URL deny-lists, copyright corpora): the exact set is
GBs per worker, the Bloom bitset stays at ``M_BITS/8`` bytes (8 KB
default here, a few hundred MB at 10^10 keys / 1% FP) — shipped once
via ``ray.put`` however large the key set.  The cost is deterministic
false positives: a flagged doc MAY be clean (flag-then-verify, or
accept the over-drop); a clean verdict is certain.

Build is the canonical mergeable-sketch plan: per block, a local bitset
ORs in every key (vectorized ``np.bitwise_or.at``); block bitsets
OR-merge to one vector — reduction volume per block is the constant
bitset, at any benchmark size.  Probe is map-only over the corpus: per
doc, distinct n-grams → K md5 bit positions each → gram hit iff all K
bits are set.

All positions are md5-derived (``b{i}:{gram}``), so the DuckDB oracle
recomputes the exact bitset and the exact per-doc hit counts — false
positives included, bit-for-bit (the FP set is a pure function of the
hash family, not randomness).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .decontam import BENCH_MOD, BENCH_REM, NGRAM_N, _bench_mask

M_BITS = 1 << 16
K_HASHES = 4


def _doc_grams_vec(batch: pa.Table, n: int) -> tuple[np.ndarray, pa.Array]:
    """(doc_row_idx, gram) DISTINCT per doc — strict full windows only
    (documents shorter than ``n`` tokens contribute nothing, mirroring
    the decontamination convention and SQL ``generate_series``)."""
    tok_lists = pc.split_pattern(batch.column("text").combine_chunks(), " ")
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    flat = tok_lists.values
    if len(flat) < n:
        return np.array([], dtype=np.int64), pa.array([], type=pa.string())
    offsets = np.asarray(tok_lists.offsets).astype(np.int64)
    counts = offsets[1:] - offsets[:-1]
    parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    pos = np.arange(len(flat) - n + 1)
    valid = parent[pos] == parent[pos + n - 1]
    starts = pos[valid]
    if len(starts) == 0:
        return np.array([], dtype=np.int64), pa.array([], type=pa.string())
    parts = [
        pc.take(flat, pa.array(starts + j, type=pa.int64())) for j in range(n)
    ]
    grams = parts[0] if n == 1 else pc.binary_join_element_wise(*parts, " ")
    distinct = (
        pa.table(
            {
                "p": pa.array(parent[starts], type=pa.int64()),
                "g": grams,
            }
        )
        .group_by(["p", "g"])
        .aggregate([])
    )
    return (
        distinct.column("p").to_numpy(zero_copy_only=False),
        distinct.column("g").combine_chunks(),
    )


def _gram_positions(gram: str, k: int = K_HASHES, m: int = M_BITS) -> list[int]:
    return [
        int.from_bytes(
            hashlib.md5(f"b{i}:{gram}".encode("utf-8")).digest()[:8], "big"
        )
        % m
        for i in range(k)
    ]


def _bitset_partial_batch(
    batch: pa.Table, n: int = NGRAM_N, k: int = K_HASHES, m: int = M_BITS
) -> pa.Table:
    """One block of benchmark docs → one bitset row (constant size)."""
    bits = np.zeros(m // 8, dtype=np.uint8)
    _, grams = _doc_grams_vec(batch, n)
    seen: set[str] = set(grams.to_pylist())
    for g in seen:
        for p in _gram_positions(g, k, m):
            bits[p >> 3] |= np.uint8(1 << (p & 7))
    return pa.table({"bits": pa.array([bits], type=pa.list_(pa.uint8()))})


def bloom_build(bench_docs, n: int = NGRAM_N, k: int = K_HASHES,
                m: int = M_BITS) -> np.ndarray:
    """Benchmark docs → merged Bloom bitset (``m/8`` uint8 bytes).

    Per-block bitsets OR-merge on the driver: constant reduction volume
    per block regardless of benchmark size."""
    parts = bench_docs.map_batches(
        _bitset_partial_batch,
        fn_kwargs={"n": n, "k": k, "m": m},
        batch_format="pyarrow",
    ).take_all()  # one constant-size row per block
    bits = np.zeros(m // 8, dtype=np.uint8)
    for row in parts:
        bits |= np.asarray(row["bits"], dtype=np.uint8)
    return bits


class _BloomProber:
    """Actor-pool probe: resolves the broadcast bitset once per actor."""

    def __init__(self, bits_ref, n: int, k: int, m: int) -> None:
        import ray

        self.bits = np.asarray(ray.get(bits_ref), dtype=np.uint8)
        self.n, self.k, self.m = n, k, m
        self._cache: dict[str, bool] = {}

    def _hit(self, gram: str) -> bool:
        got = self._cache.get(gram)
        if got is None:
            got = all(
                self.bits[p >> 3] & (1 << (p & 7))
                for p in _gram_positions(gram, self.k, self.m)
            )
            self._cache[gram] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_hits": pa.array([], type=pa.int64()),
                    "flagged": pa.array([], type=pa.bool_()),
                }
            )
        parents, grams = _doc_grams_vec(batch, self.n)
        hits = np.fromiter(
            (self._hit(g) for g in grams.to_pylist()),
            dtype=bool,
            count=len(parents),
        )
        n_docs = len(batch)
        n_hits = np.bincount(
            parents[hits], minlength=n_docs
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_hits": pa.array(n_hits, type=pa.int64()),
                "flagged": pa.array(n_hits > 0, type=pa.bool_()),
            }
        )


def bloom_decontam(docs, n: int = NGRAM_N, k: int = K_HASHES,
                   m: int = M_BITS, mod: int = BENCH_MOD,
                   rem: int = BENCH_REM):
    """documents → (doc_id, n_hits, flagged) for TRAIN docs against the
    benchmark split's Bloom bitset (same deterministic split as
    :mod:`.decontam`: bench = ``doc_id % mod == rem``)."""
    import ray

    bench = docs.map_batches(
        _bench_mask,
        fn_kwargs={"mod": mod, "rem": rem, "invert": False},
        batch_format="pyarrow",
    )
    train = docs.map_batches(
        _bench_mask,
        fn_kwargs={"mod": mod, "rem": rem, "invert": True},
        batch_format="pyarrow",
    )
    bits_ref = ray.put(bloom_build(bench, n=n, k=k, m=m))
    return train.map_batches(
        _BloomProber,
        fn_constructor_kwargs={
            "bits_ref": bits_ref, "n": n, "k": k, "m": m
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def sql_bloom_decontam(n: int = NGRAM_N, k: int = K_HASHES,
                       m: int = M_BITS, mod: int = BENCH_MOD,
                       rem: int = BENCH_REM) -> str:
    """DuckDB twin: recomputes the exact bitset (as a distinct-position
    set) and the exact per-doc all-K-bits hit counts, FPs included."""
    pos = (
        "('0x' || substr(md5('b' || i || ':' || gram), 1, 16))::UBIGINT"
        f" % {m}"
    )
    return f"""
        WITH bench AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
          WHERE doc_id % {mod} = {rem}),
        bgram AS (
          SELECT DISTINCT array_to_string(t[i:i+{n - 1}], ' ') AS gram
          FROM bench, UNNEST(generate_series(1, len(t) - {n - 1})) AS s(i)),
        bpos AS (
          SELECT DISTINCT {pos} AS pos
          FROM bgram, UNNEST(generate_series(0, {k - 1})) AS h(i)),
        train AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
          WHERE doc_id % {mod} != {rem}),
        tgram AS (
          SELECT DISTINCT doc_id,
                 array_to_string(t[i:i+{n - 1}], ' ') AS gram
          FROM train, UNNEST(generate_series(1, len(t) - {n - 1})) AS s(i)),
        tpos AS (
          SELECT doc_id, gram, {pos} AS pos
          FROM tgram, UNNEST(generate_series(0, {k - 1})) AS h(i)),
        -- one row per (doc, gram, i); joining against the DISTINCT
        -- position set matches each i at most once, so count(*) = k
        -- means every hash position is set (position collisions between
        -- a gram's own hashes count per-i, same as the Python all())
        hit AS (
          SELECT doc_id, gram
          FROM tpos JOIN bpos USING (pos)
          GROUP BY doc_id, gram
          HAVING count(*) = {k}),
        counts AS (
          SELECT doc_id, count(*)::BIGINT AS n_hits FROM hit
          GROUP BY doc_id)
        SELECT t.doc_id, coalesce(c.n_hits, 0)::BIGINT AS n_hits,
               coalesce(c.n_hits, 0) > 0 AS flagged
        FROM (SELECT doc_id FROM train) t
        LEFT JOIN counts c USING (doc_id)
    """
