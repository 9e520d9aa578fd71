"""Edit-distance alias detection over canonical entity surfaces.

Surface linking (`stages/link.py`) merges mentions whose NORMALIZED
strings are equal; it cannot merge near-miss spellings ("acme corp" vs
"acme korp") — the classic last-mile entity-resolution gap on web text,
where OCR noise and typos split one entity into several ids.  This
module finds all surface pairs within Levenshtein distance 1 WITHOUT an
all-pairs scan, via SymSpell-style deletion-neighborhood blocking
(Garbe 2012): two strings are within one edit iff they share a member
of {s} ∪ {s minus one char} (substitution shares the deletion at the
edited index; insertion/deletion shares the shorter string itself), so
bucketing every surface under the 64-bit digests of its ≤ len(s)+1
deletion variants is a COMPLETE candidate generator — each bucket is
tiny, and only bucket-mates are verified with an exact ≤ 1 check
(sharing a variant is necessary but not sufficient: "ab"/"ba" share
two variants at distance 2).

Scale shape: work is per DISTINCT surface (not per mention), buckets
exchange on an int64 digest (`shuffle.hash_partitioned`), pairs are
deduped by a grouped distinct, and nothing surface-table-sized reaches
the driver.  The synthetic corpus has no natural typos, so the
`kg_alias_pairs` query plants deterministic ones — a hash-selected
quarter of surfaces gets one hash-positioned char deleted (the same
disclosed-injection idiom as `functions/pii.py` / `functions/urls.py`)
— and the DuckDB oracle replays the injection with string surgery and
verifies the pair set with its own `levenshtein` (an independent
algorithm: brute-force cross join, no blocking).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: 1 in TYPO_RATE_MOD eligible surfaces receives a planted variant.
TYPO_RATE_MOD = 4
#: Surfaces shorter than this never get a variant (a 3-char surface's
#: variant would be 2 chars — legal, but noisy buckets).
TYPO_MIN_LEN = 4
#: Pair-search participants must be at least this long (single chars
#: bucket half the vocabulary together for no analytic value).
PAIR_MIN_LEN = 2


def typo_variant(s: str) -> str | None:
    """The deterministically planted near-miss of ``s`` (or None).

    Selection and edit position are pure functions of the surface
    (md5-derived `surface_hash64`), so the Ray pipeline and the SQL
    oracle plant byte-identical variants with no shared state.
    """
    from ..kernels.cleaning import surface_hash64

    if len(s) < TYPO_MIN_LEN:
        return None
    if surface_hash64(s) % TYPO_RATE_MOD != 0:
        return None
    p = surface_hash64("typo:" + s) % len(s)
    return s[:p] + s[p + 1 :]


def lev_le1(a: str, b: str) -> bool:
    """Exact Levenshtein ≤ 1 in one linear scan (no DP table needed at
    distance 1: equal lengths → ≤ 1 substitution; off-by-one lengths →
    the shorter must match the longer minus one char)."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _emit_buckets(batch: pa.Table) -> pa.Table:
    """(surface) → one row per deletion-neighborhood digest.

    Per-distinct-surface Python (strings need char surgery); the mention
    table was already collapsed to distinct surfaces upstream, so this
    is the same per-key cost class as the canonicalization kernel.
    """
    from ..kernels.cleaning import surface_hash64

    buckets: list[int] = []
    sids: list[int] = []
    surfs: list[str] = []
    for s in batch.column("surface").to_pylist():
        if s is None or len(s) < PAIR_MIN_LEN:
            continue
        sid = surface_hash64(s)
        seen = {s}
        for i in range(-1, len(s)):
            v = s if i < 0 else s[:i] + s[i + 1 :]
            if i >= 0 and v in seen:
                continue
            seen.add(v)
            buckets.append(surface_hash64(v))
            sids.append(sid)
            surfs.append(s)
    return pa.table(
        {
            "bucket": pa.array(buckets, type=pa.int64()),
            "sid": pa.array(sids, type=pa.int64()),
            "surface": pa.array(surfs, type=pa.string()),
        }
    )


def _bucket_pairs(part: pa.Table) -> pa.Table:
    """All (sid_a < sid_b) candidate pairs within each complete bucket."""
    if len(part) == 0 or "bucket" not in part.column_names:
        return pa.table(
            {
                "entity_a": pa.array([], type=pa.int64()),
                "entity_b": pa.array([], type=pa.int64()),
                "surface_a": pa.array([], type=pa.string()),
                "surface_b": pa.array([], type=pa.string()),
            }
        )
    bkt = part.column("bucket").to_numpy(zero_copy_only=False)
    sid = part.column("sid").to_numpy(zero_copy_only=False)
    surf = part.column("surface").to_pylist()
    order = np.lexsort((sid, bkt))
    ea, eb, sa, sb = [], [], [], []
    i = 0
    n = len(order)
    while i < n:
        j = i
        while j < n and bkt[order[j]] == bkt[order[i]]:
            j += 1
        rows = order[i:j]
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                a, b = rows[x], rows[y]
                if sid[a] == sid[b]:
                    continue  # same surface reached via two variants
                ea.append(int(sid[a]))
                eb.append(int(sid[b]))
                sa.append(surf[a])
                sb.append(surf[b])
        i = j
    return pa.table(
        {
            "entity_a": pa.array(ea, type=pa.int64()),
            "entity_b": pa.array(eb, type=pa.int64()),
            "surface_a": pa.array(sa, type=pa.string()),
            "surface_b": pa.array(sb, type=pa.string()),
        }
    )


def _verify_batch(batch: pa.Table) -> pa.Table:
    if len(batch) == 0:
        return batch
    sa = batch.column("surface_a").to_pylist()
    sb = batch.column("surface_b").to_pylist()
    keep = pa.array([lev_le1(a, b) for a, b in zip(sa, sb)], type=pa.bool_())
    return batch.filter(keep)


def alias_pairs(surfaces_ds, num_partitions: int | None = None):
    """surfaces(surface) → (entity_a, entity_b, surface_a, surface_b):
    every DISTINCT surface pair within Levenshtein distance 1, ordered
    ``entity_a < entity_b`` (the md5-derived surface ids used across the
    KG).  See the module docstring for the blocking argument."""
    from ..shuffle import hash_grouped, hash_partitioned

    def add_sid(batch: pa.Table) -> pa.Table:
        from ..kernels.cleaning import surface_hash64 as h64

        surfs = batch.column("surface").to_pylist()
        return pa.table(
            {
                "sid": pa.array(
                    [h64(s) for s in surfs], type=pa.int64()
                ),
                "surface": pa.array(surfs, type=pa.string()),
            }
        )

    distinct = hash_grouped(
        surfaces_ds.map_batches(add_sid, batch_format="pyarrow"),
        ["sid", "surface"],
        [],
        hash_cols=["sid"],
        num_partitions=num_partitions,
    )
    rows = distinct.map_batches(_emit_buckets, batch_format="pyarrow")
    candidates = hash_partitioned(
        rows, ["bucket"], _bucket_pairs, num_partitions=num_partitions
    )
    # a pair can share up to two variants — dedup with a grouped distinct
    deduped = hash_grouped(
        candidates,
        ["entity_a", "entity_b", "surface_a", "surface_b"],
        [],
        hash_cols=["entity_a", "entity_b"],
        num_partitions=num_partitions,
    )
    return deduped.map_batches(_verify_batch, batch_format="pyarrow")


def with_typo_variants(surfaces_ds):
    """Append the deterministically planted near-miss variants (see
    :func:`typo_variant`) to a stream of surfaces — the sandbox stand-in
    for a corpus with real spelling noise."""

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for s in batch.column("surface").to_pylist():
            out.append(s)
            v = typo_variant(s) if s is not None else None
            if v is not None:
                out.append(v)
        return pa.table({"surface": pa.array(out, type=pa.string())})

    return surfaces_ds.map_batches(fn, batch_format="pyarrow")
