"""Count-min sketch: mergeable approximate heavy-hitter counting.

The scale use-case (SURVEY.md §2.5 note): detect hot keys (head entities /
head tokens) BEFORE a shuffle so salting can target them dynamically,
without an exact count's own full shuffle.  Sketches merge by matrix
addition, so the plan is: one sketch per block (`map_batches`, vectorized
numpy row hashing) → a constant-size driver-side merge — no all-to-all at
any corpus size; the reduction volume is depth × width integers per block.

Guarantees (standard CM bounds): estimate ≥ true count, and ≤ true +
ε·N with probability 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DEPTH = 4
WIDTH = 1024


def _row_hashes(values: list[str], depth: int, width: int) -> np.ndarray:
    """(depth, n) bucket indices from per-value blake2b (seeded per row)."""
    out = np.empty((depth, len(values)), dtype=np.int64)
    for d in range(depth):
        salt = f"cm{d}:".encode()
        for i, v in enumerate(values):
            h = hashlib.blake2b(
                salt + v.encode("utf-8"), digest_size=8
            ).digest()
            out[d, i] = int.from_bytes(h, "big") % width
    return out


def sketch_block(
    values: list[str], depth: int = DEPTH, width: int = WIDTH
) -> np.ndarray:
    """One block of values → a (depth, width) count matrix."""
    cm = np.zeros((depth, width), dtype=np.int64)
    if not values:
        return cm
    idx = _row_hashes(values, depth, width)
    for d in range(depth):
        np.add.at(cm[d], idx[d], 1)
    return cm


def _sketch_batch(batch: pa.Table, column: str) -> pa.Table:
    cm = sketch_block(batch.column(column).to_pylist())
    return pa.table(
        {
            "sketch": pa.array([cm.ravel()], type=pa.list_(pa.int64())),
            "n": pa.array([len(batch)], type=pa.int64()),
        }
    )


class CountMin:
    """Merged sketch with point-query estimates."""

    def __init__(self, matrix: np.ndarray, total: int) -> None:
        self.matrix = matrix
        self.total = total

    def estimate(self, value: str) -> int:
        idx = _row_hashes([value], self.matrix.shape[0], self.matrix.shape[1])
        return int(min(self.matrix[d, idx[d, 0]] for d in range(len(idx))))


def countmin_over(ds, column: str) -> CountMin:
    """Dataset column → merged CountMin (block sketches + tiny reduce)."""
    parts = ds.map_batches(
        _sketch_batch, fn_kwargs={"column": column}, batch_format="pyarrow"
    ).take_all()  # one (depth×width) vector per block — constant-size rows
    cm = np.zeros(DEPTH * WIDTH, dtype=np.int64)
    total = 0
    for row in parts:
        cm += np.asarray(row["sketch"], dtype=np.int64)
        total += row["n"]
    return CountMin(cm.reshape(DEPTH, WIDTH), total)


def hot_keys(ds, column: str, candidates: list[str], threshold_frac: float = 0.01):
    """Candidate keys whose estimated frequency exceeds the threshold —
    the dynamic input to a salted-shuffle plan."""
    cm = countmin_over(ds, column)
    floor = cm.total * threshold_frac
    return sorted(
        k for k in candidates if cm.estimate(k) >= floor
    )


# ---------------------------------------------------------------------------
# deterministic bottom-k quantile sketch (mergeable)
# ---------------------------------------------------------------------------

QSK_SALT = ":qsk"


def _qsketch_partial_batch(batch: pa.Table, k: int) -> pa.Table:
    """Per-block combine: keep the ``k`` lowest-ranked (rank, value) rows
    per event_type.  Rank = md5 of the unique event id (+salt), so the
    surviving rows are a UNIFORM deterministic sample of the key's rows,
    and bottom-k is mergeable: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
    bottom-k(B)).  At most ``k`` rows per (key, block) cross the
    exchange."""
    import hashlib

    from .relational import _etype_hash_batch

    batch = _etype_hash_batch(batch)
    eids = batch.column("event_id").to_pylist()
    ranks = np.array(
        [
            hashlib.md5(f"{e}{QSK_SALT}".encode("utf-8")).hexdigest()
            for e in eids
        ],
        dtype=object,
    )
    et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
    eid_arr = np.asarray(eids, dtype=np.int64)
    order = np.lexsort((eid_arr, ranks, et))
    et_s = et[order]
    new_grp = np.concatenate(([True], et_s[1:] != et_s[:-1]))
    starts = np.flatnonzero(new_grp)
    within = np.arange(len(et_s)) - np.repeat(starts, np.diff(
        np.concatenate((starts, [len(et_s)]))
    ))
    keep = order[within < k]
    keep.sort()  # preserve input order of survivors (cosmetic)
    tbl = batch.take(keep)
    return pa.table(
        {
            "event_type": tbl.column("event_type"),
            "etype_hash": tbl.column("etype_hash"),
            "rank": pa.array(
                [ranks[i] for i in keep], type=pa.string()
            ),
            "event_id": tbl.column("event_id"),
            "value": tbl.column("value"),
        }
    )


def quantile_sketch(
    events, qs: tuple = (0.25, 0.5, 0.75), k: int = 256,
    num_partitions: int | None = None,
):
    """Per-event_type APPROXIMATE quantiles from a mergeable
    deterministic bottom-k sample — the constant-memory scale path that
    :func:`..relational.grouped_quantiles`' contract points to when one
    key's value set no longer fits a partition.

    Per block: rank every row by md5 of its unique event id and keep the
    ``k`` lowest per key (:func:`_qsketch_partial_batch`); the exchange
    then moves ≤ ``k`` rows per (key, block) — constant per key at any
    corpus size — and the per-partition finisher re-selects the global
    bottom-k (merge of merges, associative) and applies the SAME
    ``quantile_disc`` index rule (``ceil(q·m)−1``) to the sample.  Rank
    error is O(1/√k).  Every step is a pure function of the data (md5
    ranks, no RNG), so the DuckDB twin — a ``row_number`` window over the
    same ranks — reproduces the estimates bit for bit: an
    oracle-checkable SKETCH.

    Output: (event_type, n_sample, p25, p50, p75) with ``n_sample =
    min(n, k)``.
    """
    from ..shuffle import hash_partitioned

    partials = events.select_columns(
        ["event_id", "event_type", "value"]
    ).map_batches(
        _qsketch_partial_batch, fn_kwargs={"k": k}, batch_format="pyarrow"
    )

    def finish(block: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], type=pa.string()),
            "n_sample": pa.array([], type=pa.int64()),
        }
        for q in qs:
            cols[f"p{int(q * 100)}"] = pa.array([], type=pa.float64())
        if len(block) == 0:
            return pa.table(cols)
        et = np.asarray(block.column("event_type").to_pylist(), dtype=object)
        ranks = np.asarray(block.column("rank").to_pylist(), dtype=object)
        eids = block.column("event_id").to_numpy(zero_copy_only=False)
        vals = block.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eids, ranks, et))
        et_s = et[order]
        new_grp = np.concatenate(([True], et_s[1:] != et_s[:-1]))
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.concatenate((starts, [len(et_s)])))
        within = np.arange(len(et_s)) - np.repeat(starts, sizes)
        sel = within < k
        # per-key sample values, value-sorted for the quantile pick
        et_k = et_s[sel]
        v_k = vals[order][sel]
        o2 = np.lexsort((v_k, et_k))
        et2, v2 = et_k[o2], v_k[o2]
        g2 = np.concatenate(([True], et2[1:] != et2[:-1]))
        s2 = np.flatnonzero(g2)
        m = np.diff(np.concatenate((s2, [len(et2)]))).astype(np.int64)
        out = {
            "event_type": pa.array(et2[s2].tolist(), type=pa.string()),
            "n_sample": pa.array(m, type=pa.int64()),
        }
        for q in qs:
            idx = np.maximum(np.ceil(q * m).astype(np.int64) - 1, 0)
            out[f"p{int(q * 100)}"] = pa.array(
                v2[s2 + idx], type=pa.float64()
            )
        return pa.table(out)

    return hash_partitioned(
        partials, ["etype_hash"], finish, num_partitions=num_partitions
    )


def sql_quantile_sketch(k: int = 256, qs: tuple = (0.25, 0.5, 0.75)) -> str:
    """DuckDB twin of :func:`quantile_sketch` over the ``events`` view."""
    picks = ",\n                   ".join(
        f"quantile_disc(value, {q}) AS p{int(q * 100)}" for q in qs
    )
    return f"""
        WITH ranked AS (
          SELECT event_type, value,
            row_number() OVER (
              PARTITION BY event_type
              ORDER BY md5(event_id::VARCHAR || '{QSK_SALT}'), event_id
            ) AS rn
          FROM events),
        samp AS (SELECT event_type, value FROM ranked WHERE rn <= {k})
        SELECT event_type, count(*)::BIGINT AS n_sample,
               {picks}
        FROM samp GROUP BY event_type
    """
