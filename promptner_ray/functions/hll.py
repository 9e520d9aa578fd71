"""HyperLogLog: mergeable approximate distinct counting.

The 100 TB question this answers: "how many distinct tokens / URLs /
entities does the corpus contain?" — an exact ``COUNT(DISTINCT)`` is a
full all-to-all shuffle of every distinct value, while the HLL answer
is a CONSTANT 2^p-register vector per block merged by element-wise max
(Flajolet et al. 2007), so the reduction volume is independent of both
corpus size and cardinality.  Sibling of the count-min sketch
(:mod:`.sketch`): CM answers "how often does key k appear", HLL answers
"how many distinct keys are there".

Plan: per block, collapse tokens to their distinct md5-64 hashes
(set — the block-level combine), derive (register = top ``p`` hash
bits, rank = 1 + leading zeros of the remaining ``64-p`` bits), and
keep the per-block max rank per register; then one
:func:`~promptner_ray.shuffle.hash_grouped` max over at most 2^p rows
per block.  Nothing string-typed ever reaches the exchange.

The register table (register, max_rank) is all-integer, so the DuckDB
oracle recomputes it bit-exactly from the same md5 hash —
``('0x' || substr(md5(w), 1, 16))::UBIGINT``, register = ``hv >> 58``,
rank via ``length(bin(rest))`` (leading-zero count of the 58-bit
suffix).  The float *estimate* (:func:`hll_estimate`) is derived from
that table on the driver and gated by an accuracy test against the
exact distinct count (tests), not by the SQL hash check.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

P = 6  # 2^6 = 64 registers; standard error ~ 1.04/sqrt(64) = 13%
_W = 64 - P
_REST_MASK = (1 << _W) - 1


def _token_hashes(batch: pa.Table, column: str) -> list[int]:
    """Distinct-in-block unsigned 64-bit md5 hashes of the tokens."""
    import pyarrow.compute as pc

    col = batch.column(column).combine_chunks()
    lists = pc.split_pattern(col, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    toks = set(lists.values.to_pylist())
    return [
        int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
        for t in toks
    ]


def hll_partial_batch(
    batch: pa.Table, column: str = "text", p: int = P
) -> pa.Table:
    """One block → (register, max_rank) partial, ≤ 2^p rows."""
    w = 64 - p
    regs: dict[int, int] = {}
    for hv in _token_hashes(batch, column):
        reg = hv >> w
        rest = hv & ((1 << w) - 1)
        rank = w - rest.bit_length() + 1  # all-zero suffix → w + 1
        if rank > regs.get(reg, 0):
            regs[reg] = rank
    items = sorted(regs.items())
    return pa.table(
        {
            "register": pa.array([r for r, _ in items], type=pa.int64()),
            "max_rank": pa.array([k for _, k in items], type=pa.int64()),
        }
    )


def hll_registers(docs, column: str = "text", p: int = P):
    """documents → (register, max_rank): the merged HLL register table
    over all tokens of ``column``.  Registers never observed are absent
    (their implicit rank is 0), matching the SQL twin's GROUP BY."""
    from ..shuffle import hash_grouped

    partial = docs.map_batches(
        hll_partial_batch,
        fn_kwargs={"column": column, "p": p},
        batch_format="pyarrow",
    )
    return hash_grouped(
        partial,
        ["register"],
        [("max_rank", "max")],
        rename={"max_rank_max": "max_rank"},
    )


def hll_estimate(registers: pa.Table, p: int = P) -> float:
    """Bias-corrected HLL estimate from a (register, max_rank) table.

    Small-range correction (linear counting) when the raw estimate is
    below 2.5·m — the regime the synthetic corpus's tiny vocabulary
    actually exercises."""
    m = 1 << p
    ranks = np.zeros(m, dtype=np.int64)
    ranks[registers.column("register").to_numpy(zero_copy_only=False)] = (
        registers.column("max_rank").to_numpy(zero_copy_only=False)
    )
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / float(np.sum(np.power(2.0, -ranks)))
    zeros = int(np.count_nonzero(ranks == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def sql_hll_registers(source: str = "documents", column: str = "text") -> str:
    """DuckDB twin of :func:`hll_registers` (p = P): same md5 hash, same
    register/rank split, leading zeros via ``bin()`` string length."""
    return f"""
        WITH tok AS (
          SELECT unnest(string_split({column}, ' ')) AS w FROM {source}),
        h AS (
          SELECT DISTINCT ('0x' || substr(md5(w), 1, 16))::UBIGINT AS hv
          FROM tok),
        r AS (
          SELECT (hv >> {_W})::BIGINT AS register,
                 (hv & {_REST_MASK}::UBIGINT) AS rest
          FROM h),
        rk AS (
          SELECT register,
                 CASE WHEN rest = 0 THEN {_W + 1}
                      ELSE {_W + 1} - length(bin(rest)) END AS rnk
          FROM r)
        SELECT register, max(rnk)::BIGINT AS max_rank
        FROM rk GROUP BY register
    """


# ---------------------------------------------------------------------------
# grouped HLL: per-key distinct counting (distinct users per event type,
# distinct URLs per domain, distinct entities per predicate, …)
# ---------------------------------------------------------------------------

def grouped_hll_partial_batch(
    batch: pa.Table, key: str, value: str, p: int = P
) -> pa.Table:
    """One block → (key, k_hash, register, max_rank) partials, ≤ 2^p rows
    per distinct-in-block key — the per-key register vector is the
    mergeable summary, so a key's exchange volume is CONSTANT regardless
    of how many distinct values it has."""
    w = 64 - p
    kcol = batch.column(key).to_pylist()
    vcol = batch.column(value).to_pylist()
    regs: dict[tuple, int] = {}
    for kk, vv in set(zip(kcol, vcol)):
        hv = int.from_bytes(
            hashlib.md5(str(vv).encode("utf-8")).digest()[:8], "big"
        )
        reg = hv >> w
        rest = hv & ((1 << w) - 1)
        rank = w - rest.bit_length() + 1
        if rank > regs.get((kk, reg), 0):
            regs[(kk, reg)] = rank
    items = sorted(regs.items())
    khash: dict = {}
    for kk in {k for (k, _r) in regs}:
        khash[kk] = int.from_bytes(
            hashlib.md5(str(kk).encode("utf-8")).digest()[:8],
            "big",
            signed=True,
        )
    return pa.table(
        {
            key: pa.array([k for (k, _r), _ in items]),
            "k_hash": pa.array(
                [khash[k] for (k, _r), _ in items], type=pa.int64()
            ),
            "register": pa.array(
                [r for (_k, r), _ in items], type=pa.int64()
            ),
            "max_rank": pa.array([v for _, v in items], type=pa.int64()),
        }
    )


def grouped_hll_registers(
    events,
    key: str = "event_type",
    value: str = "user_id",
    p: int = P,
    num_partitions: int | None = None,
):
    """events → (key, register, max_rank): merged per-key HLL register
    tables.  The grouped face of :func:`hll_registers` — an exact
    per-key ``COUNT(DISTINCT)`` shuffles every distinct (key, value)
    pair, while this exchanges ≤ 2^p integer rows per (key, block) and
    merges by grouped Max.  All-integer output, so the DuckDB twin
    (:func:`sql_grouped_hll_registers`) hash-matches the SKETCH itself;
    the float per-key estimate (:func:`grouped_hll_estimates`) is gated
    by an accuracy unit test instead."""
    from ..shuffle import hash_grouped

    partial = events.map_batches(
        grouped_hll_partial_batch,
        fn_kwargs={"key": key, "value": value, "p": p},
        batch_format="pyarrow",
    )
    return hash_grouped(
        partial,
        [key, "register"],
        [("max_rank", "max")],
        rename={"max_rank_max": "max_rank"},
        hash_cols=["k_hash"],
        num_partitions=num_partitions,
    )


def grouped_hll_estimates(registers: pa.Table, key: str, p: int = P) -> dict:
    """(key, register, max_rank) table → {key: distinct estimate}
    (driver-side; the table is ≤ |keys|·2^p rows by construction)."""
    out: dict = {}
    kvals = registers.column(key).to_pylist()
    for kk in set(kvals):
        import pyarrow.compute as pc

        sub = registers.filter(pc.equal(registers.column(key), kk))
        out[kk] = hll_estimate(sub, p=p)
    return out


def sql_grouped_hll_registers(
    source: str = "events",
    key: str = "event_type",
    value: str = "user_id",
    p: int = P,
) -> str:
    """DuckDB twin of :func:`grouped_hll_registers`."""
    w = 64 - p
    mask = (1 << w) - 1
    return f"""
        WITH pairs AS (
          SELECT DISTINCT {key} AS k, {value} AS v FROM {source}),
        h AS (
          SELECT k,
                 ('0x' || substr(md5(v::VARCHAR), 1, 16))::UBIGINT AS hv
          FROM pairs),
        r AS (
          SELECT k, (hv >> {w})::BIGINT AS register,
                 (hv & {mask}::UBIGINT) AS rest
          FROM h),
        rk AS (
          SELECT k, register,
                 CASE WHEN rest = 0 THEN {w + 1}
                      ELSE {w + 1} - length(bin(rest)) END AS rnk
          FROM r)
        SELECT k AS {key}, register, max(rnk)::BIGINT AS max_rank
        FROM rk GROUP BY 1, 2
    """
