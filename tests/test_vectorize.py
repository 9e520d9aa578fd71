"""Unit tests for the hashing-trick vectorizer and linear scorer."""

from __future__ import annotations

import hashlib

import pyarrow as pa

from promptner_ray.functions.vectorize import (
    classifier_weights,
    hashed_tf_batch,
    linear_score_batch,
)


def _batch(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def test_classifier_weights_deterministic_and_centered():
    w = classifier_weights(8)
    assert w == classifier_weights(8)
    assert all(-128 <= x <= 127 for x in w)
    assert w[0] == hashlib.md5(b"w:0").digest()[0] - 128


def test_linear_score_matches_manual_dot():
    texts = ["alpha beta alpha", "gamma"]
    out = linear_score_batch(_batch(texts))
    tf = hashed_tf_batch(_batch(texts))
    w = classifier_weights(8)
    for i in range(len(texts)):
        manual = sum(tf.column(f"b{b}")[i].as_py() * w[b] for b in range(8))
        assert out.column("score")[i].as_py() == manual
        assert out.column("keep")[i].as_py() == (manual > 0)


def test_linear_score_empty_batch_keeps_schema():
    out = linear_score_batch(_batch([]))
    assert out.column_names == ["doc_id", "score", "keep"]
    assert len(out) == 0


def test_grouped_order_stats_matches_numpy_kth(ray_session):
    """Radix-refinement selection == numpy partition on skewed groups
    with negative, positive, and tied float values."""
    import numpy as np
    import ray

    from promptner_ray.functions.vectorize import (
        _float_to_ordered_u64,
        _ordered_u64_to_float,
        grouped_order_stats,
    )

    rng = np.random.default_rng(11)
    # group 1: 900 values (the "90% one language" shape); group 2: 35
    vals1 = np.round(rng.normal(-3, 2, 900), 3)  # rounding forces ties
    vals2 = np.round(rng.normal(5, 1, 35), 3)
    gk = np.concatenate(
        [np.full(900, 101, dtype=np.int64), np.full(35, 202, dtype=np.int64)]
    )
    vals = np.concatenate([vals1, vals2])
    proj = ray.data.from_arrow(
        pa.table(
            {
                "gk": pa.array(gk, type=pa.int64()),
                "u": pa.array(
                    _float_to_ordered_u64(vals).view(np.int64),
                    type=pa.int64(),
                ),
            }
        )
    ).repartition(7)
    targets = [
        (0, 101, 1),      # min
        (1, 101, 300),
        (2, 101, 900),    # max
        (3, 202, 12),
        (4, 202, 35),
    ]
    got = [
        _ordered_u64_to_float(u)
        for u in grouped_order_stats(proj, targets)
    ]
    s1, s2 = np.sort(vals1), np.sort(vals2)
    want = [s1[0], s1[299], s1[899], s2[11], s2[34]]
    assert got == want


def test_ccnet_buckets_orders_by_typicality(ray_session):
    """Docs made of the corpus-dominant token land in head, rare-token
    docs in tail; per-lang sizes split ~n/3."""
    import collections

    import ray

    from promptner_ray.functions.vectorize import ccnet_buckets

    common, rare = "alpha", "zq"  # distinct hash buckets (7 vs 1)
    texts, langs = [], []
    for i in range(30):
        # 10 typical, 10 mixed, 10 atypical docs — all lang en; the
        # mixed docs are asymmetric so corpus counts differ (common 140
        # vs rare 100) and the three score levels are strictly ordered
        if i < 10:
            texts.append(" ".join([common] * 8))
        elif i < 20:
            texts.append(" ".join([common] * 6 + [rare] * 2))
        else:
            texts.append(" ".join([rare] * 8))
        langs.append("en")
    docs = pa.table(
        {
            "doc_id": pa.array(range(30), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
        }
    )
    out = ccnet_buckets(ray.data.from_arrow(docs)).to_pandas()
    by = out.set_index("doc_id")["bucket"]
    assert all(by[i] == "head" for i in range(10))
    assert all(by[i] == "middle" for i in range(10, 20))
    assert all(by[i] == "tail" for i in range(20, 30))
    assert collections.Counter(out["bucket"]) == {
        "head": 10, "middle": 10, "tail": 10,
    }


def test_pq_codes_are_argmin_l2(ray_session):
    """Each emitted code must be the true argmin-L2 codebook entry for
    its subvector (first-min tie-break), at any partition count."""
    import numpy as np
    import ray

    from promptner_ray.functions.similarity import (
        pq_assign,
        train_pq_from_matrix,
    )

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(120, 64)).astype(np.float32)
    cbs = train_pq_from_matrix(mat, m=4, k=16, seed=1)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(float).tolist() for row in mat],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    out = (
        pq_assign(ray.data.from_arrow(tbl).repartition(5), ray.put(cbs))
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    x = mat.astype(np.float64)
    for s in range(4):
        xs = x[:, s * 16:(s + 1) * 16]
        d = ((xs[:, None, :] - cbs[s][None]) ** 2).sum(axis=2)
        assert out[f"code{s}"].tolist() == np.argmin(d, axis=1).tolist()
