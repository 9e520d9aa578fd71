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
