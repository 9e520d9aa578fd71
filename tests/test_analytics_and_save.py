"""G7 analytics (confusion matrix, correlations) + S11 save/5-shot export."""

from __future__ import annotations

import pathlib

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def results_ds(ray_session):
    import ray

    rng = np.random.RandomState(3)
    n = 400
    text_len = rng.randint(4, 40, n)
    n_entities = rng.randint(0, 6, n)
    f1 = np.clip(
        0.5 + 0.05 * n_entities - 0.004 * text_len + 0.1 * rng.standard_normal(n),
        0,
        1,
    )
    tbl = pa.table(
        {
            "text": pa.array(
                [" ".join(["w"] * int(k)) for k in text_len], type=pa.string()
            ),
            "entities": pa.array(
                [["e"] * int(k) for k in n_entities],
                type=pa.list_(pa.string()),
            ),
            "f1": pa.array(f1, type=pa.float64()),
        }
    )
    return ray.data.from_arrow(tbl).repartition(4), text_len, n_entities, f1


def test_f1_correlations_match_pandas(results_ds):
    import pandas as pd

    from promptner_ray.pipelines.eval import analytics_batch, f1_correlations

    ds, text_len, n_entities, f1 = results_ds
    with_feats = ds.map_batches(analytics_batch, batch_format="pyarrow")
    got = f1_correlations(with_feats)
    want = pd.DataFrame(
        {"text_len": text_len, "n_entities": n_entities, "f1": f1}
    ).corr()["f1"]
    assert got["text_len"] == pytest.approx(want["text_len"], abs=1e-9)
    assert got["n_entities"] == pytest.approx(want["n_entities"], abs=1e-9)


def test_confusion_counts_and_pivot(ray_session, corpus_root):
    import ray

    from promptner_ray.pipelines.eval import (
        confusion_counts,
        confusion_matrix_df,
    )
    from promptner_ray.pipelines.kg import KGConfig, detected, docs_text, sentences
    from promptner_ray.sources.corpus import read_pages

    cfg = KGConfig(detect_concurrency=2)
    det = detected(
        sentences(docs_text(read_pages(corpus_root), cfg), cfg), cfg
    )
    gold = ray.data.read_parquet(str(pathlib.Path(corpus_root) / "gold"))
    long = confusion_counts(det, gold, num_partitions=4)
    mat = confusion_matrix_df(long)
    # the matrix is square over the union label set and mass-preserving:
    # one count per token of every DETECTED sentence (gold also covers
    # non-English docs the language gate drops)
    assert list(mat.index) == list(mat.columns)
    total_tokens = sum(
        len(r["text"].split(" "))
        for r in det.select_columns(["url", "text"]).take_all()
    )
    assert mat.values.sum() == total_tokens
    # with precision-1.0 stub detection the diagonal dominates every row
    diag = np.diag(mat.values)
    assert diag.sum() / mat.values.sum() > 0.9


def test_cli_save_writes_5shot(ray_session, tmp_path):
    from promptner_ray.cli import main
    from promptner_ray.sources.iob2 import parse_iob2_text

    src = tmp_path / "src"
    src.mkdir()
    body = (
        "Joe\tB-PER\nBlogs\tI-PER\nvisited\tO\nLondon\tB-LOC\n\n"
        "ACME\tB-ORG\nhired\tO\nJoe\tB-PER\n\n"
        "nothing\tO\nhere\tO\n\n"
    )
    (src / "train.txt").write_text(body)
    (src / "validation.txt").write_text(body)
    out = tmp_path / "out"
    summary = main(
        ["save", "--input", str(src), "--out", str(out), "--seed", "7"]
    )
    # validation renamed dev (reference data.py:381-383)
    assert (out / "dev.txt").exists() and (out / "5shotdev.txt").exists()
    full = parse_iob2_text((out / "train.txt").read_text())
    assert [r["text"] for r in full] == [
        "Joe Blogs visited London",
        "ACME hired Joe",
        "nothing here",
    ]
    shot = parse_iob2_text((out / "5shottrain.txt").read_text())
    types = {t for r in shot for t in r["etypes"]}
    assert types == {"PER", "LOC", "ORG"}
    assert summary["train"]["5shot"] == len(shot)
