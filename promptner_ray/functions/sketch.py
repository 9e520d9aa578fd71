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
