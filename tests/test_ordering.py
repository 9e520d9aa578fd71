"""Unit tests for the deterministic global shuffle order (functions/ordering.py)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray

from promptner_ray.functions.ordering import shuffle_positions


def _ds(ids, blocks=1):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    )
    return ds.repartition(blocks) if blocks > 1 else ds


def _expected(ids, seed=0):
    order = sorted(
        ids, key=lambda i: (hashlib.md5(f"{i}:{seed}".encode()).hexdigest(), i)
    )
    return {doc_id: pos for pos, doc_id in enumerate(order)}


def test_shuffle_positions_dense_permutation(ray_session):
    ids = list(range(0, 300, 3))
    out = shuffle_positions(_ds(ids, blocks=7)).to_pandas()
    got = dict(zip(out["doc_id"], out["pos"]))
    assert got == _expected(ids)
    assert sorted(out["pos"]) == list(range(len(ids)))


def test_shuffle_positions_blocking_and_seed(ray_session):
    ids = list(range(50))
    a = shuffle_positions(_ds(ids, blocks=1)).to_pandas()
    b = shuffle_positions(_ds(ids, blocks=5)).to_pandas()
    assert dict(zip(a["doc_id"], a["pos"])) == dict(zip(b["doc_id"], b["pos"]))
    c = shuffle_positions(_ds(ids), seed=1).to_pandas()
    assert dict(zip(c["doc_id"], c["pos"])) == _expected(ids, seed=1)
    assert dict(zip(c["doc_id"], c["pos"])) != _expected(ids, seed=0)
