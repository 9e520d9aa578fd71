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
