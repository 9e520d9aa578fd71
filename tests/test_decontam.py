"""Unit tests for benchmark decontamination (functions/decontam.py).

Small hand-built corpora where the contamination set is knowable by eye:
the benchmark slice is doc_id % 10 == 7, n-grams are strict full 3-token
windows, and the anti-join keep-set is the training slice minus any doc
sharing a single 3-gram with the benchmark.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from promptner_ray.functions.decontam import (
    _doc_gram_digests,
    contaminated_docs,
    decontaminate,
)


def _docs_ds(rows: dict[int, str]):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(rows), type=pa.int64()),
                "text": pa.array(list(rows.values()), type=pa.string()),
            }
        )
    )


def test_gram_digests_strict_windows():
    # fewer than n tokens -> no grams at all (strict full windows)
    assert _doc_gram_digests("one two", 3) == set()
    assert len(_doc_gram_digests("a b c", 3)) == 1
    # 4 tokens -> 2 windows; duplicate windows collapse to distinct
    assert len(_doc_gram_digests("a b c d", 3)) == 2
    assert len(_doc_gram_digests("a b a b a b a", 3)) == 2


def test_contaminated_docs_flags_overlap(ray_session):
    rows = {
        7: "the quick brown fox jumps",  # benchmark doc
        1: "a quick brown fox runs",  # shares "quick brown fox"
        2: "totally unrelated words here now",  # clean
        3: "the quick brown fox jumps",  # identical: 3 shared grams
        4: "so",  # too short for any gram
    }
    out = contaminated_docs(_docs_ds(rows), concurrency=1).to_pandas()
    got = dict(zip(out["doc_id"], out["n_hit"]))
    assert got == {1: 1, 3: 3}


def test_decontaminate_keeps_clean_training_docs(ray_session):
    rows = {
        7: "alpha beta gamma delta",
        17: "epsilon zeta eta theta",  # second benchmark doc
        1: "alpha beta gamma prime",  # contaminated via doc 7
        2: "iota kappa lambda mu",  # clean
        5: "zeta eta theta iota",  # contaminated via doc 17
        8: "nu xi",  # clean (too short to match)
    }
    kept = decontaminate(_docs_ds(rows)).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [2, 8]
    assert list(kept.columns) == ["doc_id"]


def test_bloom_flags_superset_of_exact(ray_session) -> None:
    """Bloom has one-sided error: every exactly-contaminated doc must be
    flagged; extras (false positives) are allowed but bounded."""
    import ray

    from promptner_ray.functions.bloom import bloom_decontam
    from promptner_ray.functions.decontam import contaminated_docs

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    exact = contaminated_docs(docs).to_pandas()
    exact_flagged = set(exact[exact["n_hit"] > 0]["doc_id"])
    bl = bloom_decontam(docs).to_pandas()
    bloom_flagged = set(bl[bl["flagged"]]["doc_id"])
    assert exact_flagged <= bloom_flagged
    # 2^16 bits / K=4 against a few thousand grams: FP rate ~0 here
    assert len(bloom_flagged - exact_flagged) <= 0.02 * len(bl)


def test_classifier_training_converges_and_is_partition_invariant(
    ray_session,
) -> None:
    """The distributed trainer's contract: per-round loss is monotone
    non-increasing at the default lr, and the weight trajectory is
    IDENTICAL at any input partitioning (quantized int64 gradient sums
    commute)."""
    import ray

    from promptner_ray.functions.vectorize import train_linear_classifier

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    a = (
        train_linear_classifier(docs)
        .to_pandas()
        .sort_values("round", ignore_index=True)
    )
    assert a["loss"].is_monotonic_decreasing
    assert abs(a.loc[0, "loss"] - 0.6931471805599453) < 1e-6  # ln 2 @ w=0
    b = (
        train_linear_classifier(docs.repartition(13))
        .to_pandas()
        .sort_values("round", ignore_index=True)
    )
    assert a.equals(b)
