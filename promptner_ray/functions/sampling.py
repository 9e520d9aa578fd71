"""Deterministic content-addressed sampling (SURVEY.md §2.6 sampling).

``hash_sample`` keeps a row iff ``md5(key) mod D < fraction·D`` — a pure
per-row predicate, so the sample is: reproducible across runs, engines
and cluster sizes (no RNG state, unlike ``Dataset.random_sample``);
stable under re-partitioning; and consistent across tables sharing the
key (sampling documents and their derived rows by the same key yields
aligned subsets — the property training-data eval splits need).  The
DuckDB oracle recomputes the identical predicate.

A seed folds into the hashed bytes (``key:seed``) so disjoint samples of
the same table are available.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

MOD = 1_000_000


def _keep_mask(keys: list, fraction: float, seed: int) -> list[bool]:
    cut = int(fraction * MOD)
    return [
        int.from_bytes(
            hashlib.md5(f"{k}:{seed}".encode("utf-8")).digest()[:8], "big"
        )
        % MOD
        < cut
        for k in keys
    ]


def hash_sample_batch(
    batch: pa.Table, key: str, fraction: float, seed: int = 0
) -> pa.Table:
    if len(batch) == 0:
        return batch
    mask = _keep_mask(batch.column(key).to_pylist(), fraction, seed)
    return batch.filter(pa.array(mask, type=pa.bool_()))


def hash_sample(ds, key: str, fraction: float, seed: int = 0):
    """Keep ≈``fraction`` of rows, deterministically by ``key`` content."""
    return ds.map_batches(
        hash_sample_batch,
        fn_kwargs={"key": key, "fraction": fraction, "seed": seed},
        batch_format="pyarrow",
    )


def sql_hash_sample_predicate(key_expr: str, fraction: float, seed: int = 0) -> str:
    """The DuckDB twin of the keep-predicate (md5 first 8 bytes, mod)."""
    cut = int(fraction * MOD)
    u = f"('0x' || substr(md5({key_expr} || ':{seed}'), 1, 16))::UBIGINT"
    return f"({u} % {MOD}) < {cut}"


def _rank_cut_batch(
    batch: pa.Table, group: str, key: str, k: int, seed: int
) -> pa.Table:
    """Keep each group's k lowest-ranked rows within this table; rank is
    the md5-hex of ``key:seed`` (total order, ``key`` tie-break).  The
    global per-group k-minimum is a subset of every superset's per-group
    k-minimum, so this same kernel serves as the per-batch candidate cut
    AND the exact per-partition finisher."""
    import numpy as np

    if len(batch) == 0:
        return batch
    ranks = np.array(
        [
            hashlib.md5(f"{v}:{seed}".encode("utf-8")).hexdigest()
            for v in batch.column(key).to_pylist()
        ]
    )
    keyed = batch.append_column("__rank", pa.array(ranks, type=pa.string()))
    idx = pc.sort_indices(
        keyed,
        sort_keys=[
            (group, "ascending"),
            ("__rank", "ascending"),
            (key, "ascending"),
        ],
    )
    s = keyed.take(idx)
    g = np.asarray(s.column(group).to_pylist())
    new_run = np.ones(len(g), dtype=bool)
    new_run[1:] = g[1:] != g[:-1]
    run_id = np.cumsum(new_run) - 1
    run_start = np.zeros(run_id[-1] + 1, dtype=np.int64)
    run_start[run_id[new_run]] = np.flatnonzero(new_run)
    pos_in_run = np.arange(len(g)) - run_start[run_id]
    return s.filter(pa.array(pos_in_run < k)).drop_columns(["__rank"])


def stratified_sample(
    ds,
    group: str,
    key: str,
    k: int,
    seed: int = 0,
    num_partitions: int | None = None,
):
    """Exactly ``min(k, group size)`` rows per ``group`` value, chosen by
    deterministic md5 rank of ``key`` — the quota/mixture-rebalancing
    sampler (e.g. equal documents per language regardless of raw skew).

    Plan: per-batch candidate cut (each block forwards at most k rows
    per group it has seen) → hash partition on an int64 digest of the
    group so each group lands whole → the same kernel finishes exactly.
    The exchange carries ≤ k·(groups per block) rows per block, never
    the corpus; no global sort."""
    from ..shuffle import hash_partitioned

    def digest(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("__gk", pa.array([], type=pa.int64()))
        keys = [
            int.from_bytes(
                hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(),
                "big",
                signed=True,
            )
            for v in batch.column(group).to_pylist()
        ]
        return batch.append_column("__gk", pa.array(keys, type=pa.int64()))

    cut = ds.map_batches(
        _rank_cut_batch,
        fn_kwargs={"group": group, "key": key, "k": k, "seed": seed},
        batch_format="pyarrow",
    ).map_batches(digest, batch_format="pyarrow")

    def finish(part: pa.Table) -> pa.Table:
        return _rank_cut_batch(
            part.drop_columns(["__gk"]), group, key, k, seed
        )

    return hash_partitioned(
        cut, ["__gk"], finish, num_partitions=num_partitions
    )


# Dolma/Pile-style source mixture: weight > 1 upsamples (full repeated
# copies + a hash-sampled fractional copy), weight < 1 downsamples.
# Literal dict so the SQL twin inlines the same CASE; sources absent
# from the dict keep weight 1.0.
MIXTURE_WEIGHTS: dict[str, float] = {
    "src0": 2.5,
    "src1": 2.0,
    "src5": 0.5,
    "src7": 0.25,
}
MIXTURE_SEED = 11


def mixture_resample_batch(
    batch: pa.Table,
    weights: dict[str, float] | None = None,
    seed: int = MIXTURE_SEED,
) -> pa.Table:
    """documents → (doc_id, source, copy_idx): per-source reweighting.

    A weight ``w`` emits ``floor(w)`` full copies plus one more iff the
    deterministic md5 predicate fires with fraction ``w - floor(w)`` —
    so expected multiplicity is exactly ``w``, reproducibly (same
    hash-predicate family as :func:`hash_sample`: stable across runs,
    partitionings and engines).  Stateless per-row transform: the
    training-mix rebalance runs as one streaming map at any scale."""
    import numpy as np

    w = MIXTURE_WEIGHTS if weights is None else weights
    ids = batch.column("doc_id").to_pylist()
    srcs = batch.column("source").to_pylist()
    counts = np.empty(len(batch), dtype=np.int64)
    for i, (d, s) in enumerate(zip(ids, srcs)):
        wt = w.get(s, 1.0)
        full = int(wt)
        frac = wt - full
        extra = 0
        if frac > 0:
            u = (
                int.from_bytes(
                    hashlib.md5(f"{d}:{seed}".encode("utf-8")).digest()[:8],
                    "big",
                )
                % MOD
            )
            extra = 1 if u < int(frac * MOD) else 0
        counts[i] = full + extra
    idx = np.repeat(np.arange(len(batch)), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    copy_idx = np.arange(int(counts.sum())) - np.repeat(starts, counts)
    out = batch.select(["doc_id", "source"]).take(pa.array(idx))
    return out.append_column(
        "copy_idx", pa.array(copy_idx, type=pa.int64())
    )


def mixture_resample(docs, weights: dict[str, float] | None = None,
                     seed: int = MIXTURE_SEED):
    """Dataset → reweighted (doc_id, source, copy_idx) training mix."""
    return docs.map_batches(
        mixture_resample_batch,
        fn_kwargs={"weights": weights, "seed": seed},
        batch_format="pyarrow",
    )


def sql_mixture_resample(weights: dict[str, float] | None = None,
                         seed: int = MIXTURE_SEED) -> str:
    """DuckDB twin of :func:`mixture_resample`."""
    w = MIXTURE_WEIGHTS if weights is None else weights
    case = "CASE source " + " ".join(
        f"WHEN '{s}' THEN {v!r}" for s, v in w.items()
    ) + " ELSE 1.0 END"
    u = f"('0x' || substr(md5(doc_id::VARCHAR || ':{seed}'), 1, 16))::UBIGINT"
    return f"""
        WITH wt AS (
          SELECT doc_id, source, {case} AS w FROM documents),
        c AS (
          SELECT doc_id, source,
                 (floor(w)::BIGINT +
                  CASE WHEN w - floor(w) > 0
                        AND ({u} % {MOD}) < floor((w - floor(w)) * {MOD})::BIGINT
                       THEN 1 ELSE 0 END) AS cnt
          FROM wt)
        SELECT doc_id, source,
               unnest(generate_series(0, cnt - 1)) AS copy_idx
        FROM c WHERE cnt > 0
    """


SPLIT_SEED = 0
SPLIT_CUTS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def split_batch(batch: pa.Table, key: str = "doc_id",
                cuts=SPLIT_CUTS, seed: int = SPLIT_SEED) -> pa.Table:
    """rows → rows + ``split``: deterministic content-addressed
    train/val/test assignment.  Each row's md5 bucket (the
    :func:`hash_sample` hash, mod ``MOD``) falls into one of the
    cumulative ``cuts`` ranges — the same properties as hash_sample
    (reproducible across engines/cluster sizes, stable under
    repartitioning, and ALIGNED across any tables sharing the key, so
    derived rows land in their document's split)."""
    if len(batch) == 0:
        return batch.append_column("split", pa.array([], type=pa.string()))
    buckets = [
        int.from_bytes(
            hashlib.md5(f"{k}:{seed}".encode("utf-8")).digest()[:8], "big"
        )
        % MOD
        for k in batch.column(key).to_pylist()
    ]
    bounds = []
    acc = 0.0
    for name, frac in cuts:
        acc += frac
        bounds.append((name, int(acc * MOD)))
    labels = []
    for b in buckets:
        for name, hi in bounds:
            if b < hi:
                labels.append(name)
                break
        else:  # float-rounding headroom: the last cut owns the tail
            labels.append(bounds[-1][0])
    return batch.append_column("split", pa.array(labels, type=pa.string()))


def train_val_test(ds, key: str = "doc_id", cuts=SPLIT_CUTS,
                   seed: int = SPLIT_SEED):
    """Dataset → Dataset + ``split`` column (stateless map, no shuffle)."""
    return ds.map_batches(
        split_batch,
        fn_kwargs={"key": key, "cuts": cuts, "seed": seed},
        batch_format="pyarrow",
    )


def sql_split_expr(key_expr: str, cuts=SPLIT_CUTS,
                   seed: int = SPLIT_SEED) -> str:
    """DuckDB twin of the split assignment: same md5 bucket, same
    cumulative cut points."""
    u = f"(('0x' || substr(md5({key_expr} || ':{seed}'), 1, 16))::UBIGINT % {MOD})"
    acc = 0.0
    cases = []
    for name, frac in cuts[:-1]:
        acc += frac
        cases.append(f"WHEN {u} < {int(acc * MOD)} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{cuts[-1][0]}' END"
