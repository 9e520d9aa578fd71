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


def test_salted_grouped_equals_hash_grouped(ray_session) -> None:
    """Salting is physical-only: same result as the unsalted aggregate,
    whatever the hot set (including wrongly-guessed hot keys)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from promptner_ray.shuffle import hash_grouped, salted_grouped

    rng = np.random.default_rng(5)
    # Zipf-ish skew: key 0 holds ~half the rows
    keys = np.where(rng.random(5000) < 0.5, 0, rng.integers(1, 200, 5000))
    t = pa.table(
        {
            "k": pa.array(keys, type=pa.int64()),
            "v": pa.array(np.arange(5000), type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    plain = (
        hash_grouped(ds, ["k"], [("v", "sum"), ("v", "min")])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for hot in ([0], [0, 7, 9999], []):
        salted = (
            salted_grouped(
                ray.data.from_arrow(t).repartition(8),
                ["k"],
                [("v", "sum"), ("v", "min")],
                hot=hot,
                n_salts=4,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert salted.equals(plain), f"hot={hot}"


def test_salted_grouped_rejects_non_mergeable(ray_session) -> None:
    import pytest

    from promptner_ray.shuffle import salted_grouped

    with pytest.raises(ValueError):
        salted_grouped(None, ["k"], [([], "count_all")], hot=[])


def test_token_counts_salted_matches_plain(ray_session) -> None:
    import pyarrow as pa
    import ray

    from promptner_ray.functions.ngrams import ngram_counts, token_counts_salted

    texts = ["the the the a b", "the c d", "e f the"] * 30
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    plain = (
        ngram_counts(ray.data.from_arrow(t), n=1)
        .to_pandas()
        .sort_values("gram")
        .reset_index(drop=True)
    )
    salted = (
        token_counts_salted(ds, sample_fraction=0.5, threshold_frac=0.05)
        .to_pandas()
        .sort_values("gram")
        .reset_index(drop=True)
    )
    assert salted.equals(plain)


def test_quantile_sketch_accuracy_and_merge(ray_session) -> None:
    """The bottom-k sample is a uniform sample, so sketch quantiles must
    land near the exact ones (deterministic md5 ranks: this is a fixed
    assertion, not a flaky statistical one), and blocking must not
    matter (mergeability)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from promptner_ray.functions.sketch import quantile_sketch

    n = 20_000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "event_type": pa.array(["a"] * (n // 2) + ["b"] * (n // 2)),
            "value": pa.array(
                np.concatenate(
                    [np.arange(n // 2) / (n // 2), np.arange(n // 2) * 2.0]
                ),
                type=pa.float64(),
            ),
        }
    )
    got = (
        quantile_sketch(ray.data.from_arrow(tbl), k=256)
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert list(got["n_sample"]) == [256, 256]
    # type a is uniform on [0, 1): each quantile within ~5/sqrt(k)
    for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
        assert abs(got.loc["a", col] - q) < 0.32
    # mergeability: 1 block vs 64 blocks give the IDENTICAL sketch
    re64 = (
        quantile_sketch(ray.data.from_arrow(tbl).repartition(64), k=256)
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert got.equals(re64)


def test_hash_grouped_checked_sum_raises_on_int64_overflow(
    ray_session,
) -> None:
    """`checked=True` widens int64 sums to decimal128 and safe-casts the
    group total back — a sum past int64 must RAISE (Arrow's plain int64
    sum kernel wraps silently), the betweenness overflow discipline."""
    import pyarrow as pa
    import pytest
    import ray

    from promptner_ray.shuffle import hash_grouped

    big = (1 << 62) + 7
    tbl = pa.table(
        {
            "k": pa.array([1, 1, 2, 3], type=pa.int64()),
            "v": pa.array([big, big, 5, -3], type=pa.int64()),
        }
    )

    # in-range sums round-trip exactly through the decimal widen
    ok = (
        hash_grouped(
            ray.data.from_arrow(tbl.slice(2)),
            ["k"],
            [("v", "sum")],
            rename={"v_sum": "v"},
            checked=True,
        )
        .to_pandas()
        .set_index("k")["v"]
        .sort_index()
    )
    assert list(ok) == [5, -3]

    # 2 * (2^62 + 7) leaves int64: the checked reduce must raise, not wrap
    with pytest.raises(Exception) as exc_info:
        hash_grouped(
            ray.data.from_arrow(tbl),
            ["k"],
            [("v", "sum")],
            rename={"v_sum": "v"},
            checked=True,
        ).to_pandas()
    assert "out of bounds" in str(exc_info.value) or "Invalid" in str(
        exc_info.value
    )
