"""shuffle.hash_grouped vs pandas groupby ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def pair_ds(ray_session):
    import ray

    rng = np.random.RandomState(11)
    n = 50_000
    tbl = pa.table(
        {
            "a": pa.array(
                rng.randint(-(2**40), 2**40, n), type=pa.int64()
            ),
            "b": pa.array(rng.randint(0, 500, n), type=pa.int64()),
            "v": pa.array(rng.randint(-100, 100, n), type=pa.int64()),
        }
    )
    return ray.data.from_arrow(tbl).repartition(16), tbl.to_pandas()


def test_hash_grouped_sum_min_max(pair_ds):
    from promptner_ray.shuffle import hash_grouped

    ds, df = pair_ds
    got = (
        hash_grouped(
            ds,
            ["a", "b"],
            [("v", "sum"), ("v", "min"), ("v", "max")],
            rename={"v_sum": "s", "v_min": "mn", "v_max": "mx"},
        )
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    want = (
        df.groupby(["a", "b"], as_index=False)
        .agg(s=("v", "sum"), mn=("v", "min"), mx=("v", "max"))
        .sort_values(["a", "b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"s": "int64", "mn": "int64", "mx": "int64"}), want
    )


def test_hash_grouped_distinct(pair_ds):
    from promptner_ray.shuffle import hash_grouped

    ds, df = pair_ds
    got = hash_grouped(ds.select_columns(["a", "b"]), ["a", "b"], [])
    want = df[["a", "b"]].drop_duplicates()
    assert got.count() == len(want)


def test_hash_grouped_string_key_with_digest(ray_session):
    """String group keys ride along; partitioning uses the int64 digest."""
    import hashlib

    import ray

    from promptner_ray.shuffle import hash_grouped

    rng = np.random.RandomState(3)
    keys = [f"key-{i % 97}" for i in range(10_000)]
    digs = [
        int.from_bytes(
            hashlib.md5(k.encode()).digest()[:8], "big", signed=True
        )
        for k in keys
    ]
    vals = rng.randint(0, 10, 10_000)
    tbl = pa.table(
        {
            "k": pa.array(keys, type=pa.string()),
            "kd": pa.array(digs, type=pa.int64()),
            "v": pa.array(vals, type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    got = (
        hash_grouped(
            ds, ["k"], [("v", "sum")], rename={"v_sum": "s"}, hash_cols=["kd"]
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want = (
        tbl.to_pandas()
        .groupby("k", as_index=False)
        .agg(s=("v", "sum"))
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.astype({"s": "int64"}), want)


def test_connected_components_transitive_chain(ray_session):
    """A chain a-b-c-d plus a separate pair collapses to min-id labels."""
    import ray

    from promptner_ray.functions.graphops import connected_components

    pairs = ray.data.from_items(
        [
            {"doc_a": 10, "doc_b": 11},
            {"doc_a": 11, "doc_b": 12},
            {"doc_a": 12, "doc_b": 13},
            {"doc_a": 50, "doc_b": 60},
        ]
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).take_all()
    }
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 50: 50, 60: 50}
