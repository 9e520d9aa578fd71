"""Unit tests for the deterministic quota sampler (sampling.stratified_sample)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray

from promptner_ray.functions.sampling import stratified_sample


def _ds(rows, blocks=1):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "lang": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )
    return ds.repartition(blocks) if blocks > 1 else ds


def _expected(rows, k, seed=0):
    by_group: dict[str, list] = {}
    for doc_id, lang in rows:
        rank = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()
        by_group.setdefault(lang, []).append((rank, doc_id))
    keep = set()
    for lang, lst in by_group.items():
        for _, doc_id in sorted(lst)[:k]:
            keep.add((doc_id, lang))
    return keep


def test_stratified_sample_exact_quota(ray_session):
    rows = [(i, "en") for i in range(30)] + [(100 + i, "de") for i in range(7)] + [
        (200 + i, "fr") for i in range(3)
    ]
    out = stratified_sample(_ds(rows, blocks=5), "lang", "doc_id", k=5).to_pandas()
    got = set(zip(out["doc_id"], out["lang"]))
    assert got == _expected(rows, 5)
    sizes = out.groupby("lang").size().to_dict()
    # short groups keep everything; full groups keep exactly k
    assert sizes == {"en": 5, "de": 5, "fr": 3}


def test_stratified_sample_blocking_invariant(ray_session):
    # the sample must not depend on how rows are split into blocks
    rows = [(i, ["en", "de"][i % 2]) for i in range(40)]
    a = stratified_sample(_ds(rows, blocks=1), "lang", "doc_id", k=4).to_pandas()
    b = stratified_sample(_ds(rows, blocks=8), "lang", "doc_id", k=4).to_pandas()
    assert set(zip(a["doc_id"], a["lang"])) == set(zip(b["doc_id"], b["lang"]))


def test_mixture_resample_multiplicities(ray_session) -> None:
    import pyarrow as pa
    import ray

    from promptner_ray.functions.sampling import mixture_resample

    t = pa.table(
        {
            "doc_id": pa.array(range(400), type=pa.int64()),
            "source": pa.array(
                ["a"] * 100 + ["b"] * 100 + ["c"] * 100 + ["d"] * 100
            ),
        }
    )
    out = mixture_resample(
        ray.data.from_arrow(t), weights={"a": 3.0, "b": 0.5, "c": 1.25}
    ).to_pandas()
    per = out.groupby("source").size()
    assert per["a"] == 300  # integer weight: exact triplication
    assert 30 <= per["b"] <= 70  # fraction 0.5: hash-sampled
    assert 100 <= per["c"] <= 150  # 1 full copy + ~25% extra
    assert per["d"] == 100  # default weight 1.0
    # copy_idx is dense per (doc_id): every kept doc has 0..cnt-1
    g = out.groupby("doc_id")["copy_idx"].agg(["min", "max", "count"])
    assert (g["min"] == 0).all()
    assert (g["max"] == g["count"] - 1).all()
