"""Semantics of the exact duplicated-substring span detector
(`dedup.dup_spans` / `strip_dup_spans`): within-doc repeats count,
overlapping n-gram hits merge into maximal spans, and stripping cuts
ALL occurrences while leaving clean docs byte-identical."""

from __future__ import annotations

import pyarrow as pa
import ray

from promptner_ray.functions import dedup

N = 4  # small n so the fixtures stay readable


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )


def test_cross_doc_duplicate_span_merges(ray_session):
    # docs 1 and 2 share a 6-token run -> three overlapping 4-grams
    # each, merged into ONE maximal span per doc
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two {shared} three four five six"),
        (2, f"{shared} seven eight nine ten eleven twelve"),
        (3, "lone words that repeat nothing at all whatsoever today"),
    ]
    spans = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in dedup.dup_spans(_docs(rows), n=N).take_all()
    }
    assert spans == {(1, 2, 8), (2, 0, 6)}


def test_within_doc_repeat_counts_as_duplicate(ray_session):
    # the 4-gram "a b c d" appears twice INSIDE doc 1 (positions 0 and 6)
    rows = [
        (1, "a b c d x y a b c d z w"),
        (2, "totally different words with no overlap here at all"),
    ]
    spans = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in dedup.dup_spans(_docs(rows), n=N).take_all()
    }
    assert spans == {(1, 0, 4), (1, 6, 10)}


def test_strip_cuts_all_occurrences_and_leaves_clean_docs(ray_session):
    shared = "alpha beta gamma delta"
    rows = [
        (1, f"one two {shared} three four five six"),
        (2, f"{shared} seven eight nine ten eleven"),
        (3, "lone words that repeat nothing at all whatsoever today"),
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in dedup.strip_dup_spans(_docs(rows), n=N).take_all()
    }
    assert got[1] == "one two three four five six"
    assert got[2] == "seven eight nine ten eleven"
    assert got[3] == rows[2][1]  # untouched doc round-trips verbatim


def test_strip_fully_covered_doc_becomes_empty(ray_session):
    rows = [
        (1, "a b c d"),
        (2, "a b c d"),
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in dedup.strip_dup_spans(_docs(rows), n=N).take_all()
    }
    assert got == {1: "", 2: ""}


def test_strip_lazy_path_matches_cached_path(ray_session, monkeypatch):
    """Above STRIP_CACHE_MAX_ROWS the (doc_id, text) projection is NOT
    materialized — each consumer streams its own scan.  Both paths must
    produce identical stripped texts."""
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two {shared} three four five six"),
        (2, f"{shared} seven eight nine ten eleven twelve"),
        (3, "lone words that repeat nothing at all whatsoever today"),
    ]

    def run():
        return {
            r["doc_id"]: r["text"]
            for r in dedup.strip_dup_spans(_docs(rows), n=N).take_all()
        }

    cached = run()
    monkeypatch.setattr(dedup, "STRIP_CACHE_MAX_ROWS", 0)
    assert run() == cached


def _sdocs(rows):
    """(doc_id, source, text) rows for the per-source boilerplate ops."""
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "source": pa.array([r[1] for r in rows], type=pa.string()),
                "text": pa.array([r[2] for r in rows], type=pa.string()),
            }
        )
    )


def test_boilerplate_is_per_source(ray_session):
    """A template on 3 of 4 docs of source A is boilerplate; the SAME
    words on 1 of 4 docs of source B are not — df is per source, which
    is exactly what separates boilerplate from mere duplication."""
    banner = "nav one two three four five six seven"  # 8 tokens
    body = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
        "aa bb cc dd ee ff gg hh ii jj",
        "kk ll mm nn oo pp qq rr ss tt",
    ]
    rows = (
        [(i, "A", f"{banner} {body[i]}") for i in range(3)]
        + [(3, "A", body[3])]
        + [(10 + i, "B", body[i]) for i in range(3)]
        + [(13, "B", f"{banner} {body[3]}")]
    )
    spans = (
        dedup.boilerplate_spans(_sdocs(rows), n=8, min_frac=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sorted(spans.doc_id) == [0, 1, 2]  # source A's banner docs only
    assert (spans.start_tok == 0).all() and (spans.end_tok == 8).all()


def test_strip_boilerplate_restores_bodies(ray_session):
    banner = "nav one two three four five six seven"
    bodies = [
        "alpha beta gamma delta epsilon",
        "lambda mu nu xi omicron",
        "aa bb cc dd ee",
    ]
    rows = [(i, "A", f"{banner} {b}") for i, b in enumerate(bodies)]
    got = (
        dedup.strip_boilerplate(_sdocs(rows), n=8, min_frac=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.text) == bodies
