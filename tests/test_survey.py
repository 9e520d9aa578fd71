"""M18 survey tooling: assembly invariants + response-aggregation
semantics vs hand-computed reference (`eval.py:110-283`) expectations."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray


def _results_ds(n_per_dataset: int = 40) -> "ray.data.Dataset":
    rows = []
    for ds_name in ("ai", "music", "fewnerd"):
        for i in range(n_per_dataset):
            perfect = i % 4 == 0  # 25% perfect rows
            ents = [f"{ds_name}-ent{i}", f"{ds_name}-ent{i}b"]
            preds = ents if perfect else [f"{ds_name}-pred{i}"]
            rows.append(
                {
                    "dataset": ds_name,
                    "para": f"{ds_name} sentence number {i}",
                    "preds": preds,
                    "entities": [] if (not perfect and i % 7 == 0) else ents,
                    "f1": 1.0 if perfect else round(0.1 + (i % 5) / 10, 2),
                }
            )
    return ray.data.from_items(rows)


def test_survey_format_invariants(ray_session, tmp_path):
    from promptner_ray.pipelines import survey

    df, assign = survey.survey_format(
        _results_ds(),
        seed=7,
        examples_per_dataset=5,
        n_attentions=2,
        n_workers=4,
        n_examples_per_worker=8,
    )
    # skip-list respected; stratified sample size per dataset
    assert set(df["dataset"]) == {"ai", "music"}
    assert df.groupby("dataset").size().tolist() == [5, 5]
    # no perfect rows in the scored sample; ids are positions
    assert (df["f1"] != 1.0).all()
    assert df["id"].tolist() == list(range(len(df)))
    # blinding: one side is the pred join, the other the truth join, and
    # gptlist names the pred side
    for _, r in df.iterrows():
        pred_side = r["list1"] if r["gptlist"] == 1 else r["list2"]
        true_side = r["list2"] if r["gptlist"] == 1 else r["list1"]
        assert true_side != ""  # empty-truth rows were dropped upstream
        assert pred_side != true_side or r["f1"] == 1.0
    # every scored example appears for >=1 worker; attention rows are
    # perfect and id==-1; per-worker load is bounded
    scored = assign[assign["id"] >= 0]
    attn = assign[assign["id"] == -1]
    assert set(scored["id"]) == set(df["id"])
    assert (attn["f1"] == 1.0).all()
    per_worker = assign.groupby("worker").size()
    assert (per_worker <= 8 + 2 + 1).all()  # cap + attentions (+1: the
    # row that pushes a worker over the cap is kept, as in the reference)
    assert (attn.groupby("worker").size() == 2).all()
    # determinism
    df2, assign2 = survey.survey_format(
        _results_ds(),
        seed=7,
        examples_per_dataset=5,
        n_attentions=2,
        n_workers=4,
        n_examples_per_worker=8,
    )
    pd.testing.assert_frame_equal(df, df2)
    pd.testing.assert_frame_equal(assign, assign2)
    # reference file layout
    paths = survey.write_survey_csvs(df, assign, tmp_path, "sv")
    assert (tmp_path / "sv.csv").exists()
    assert len(paths) == 1 + assign["worker"].nunique()


def test_process_batch_frame_flattens_turk_columns():
    from promptner_ray.pipelines.survey import process_batch_frame

    raw = pd.DataFrame(
        {
            "HITId": ["h1"],
            "WorkerId": ["w1"],
            "Input.id": [3],
            "Input.gptlist": [2],
            "Answer.better": [1],
            "Answer.l1correct": [1],
        }
    )
    out = process_batch_frame(raw)
    assert sorted(out.columns) == ["better", "gptlist", "id", "l1correct"]
    assert out.loc[0, "id"] == 3 and out.loc[0, "better"] == 1


def test_aggregate_responses_majority_and_agreement(ray_session):
    from promptner_ray.pipelines.survey import aggregate_responses

    def resp(id_, order, gptlist, l1c, l2c, better, l1m=None, l2m=None):
        return {
            "id": id_,
            "resp_order": order,
            "gptlist": gptlist,
            "l1correct": l1c,
            "l2correct": l2c,
            "better": better,
            "l1missing": l1m,
            "l1extra": None,
            "l2missing": l2m,
            "l2extra": "x",
        }

    rows = [
        # id 0: three unanimous judgments (gptlist=1 → l1 is the pred)
        resp(0, 0, 1, 1, 0, 1, l1m="a,b"),
        resp(0, 1, 1, 1, 0, 1, l1m="a"),
        resp(0, 2, 1, 1, 0, 1),
        # id 1: 2-way split on gptcorrect → tie broken by earliest
        # response (order 10, value 0); agreement 0 (n==2 branch)
        resp(1, 10, 2, 1, 0, 2),  # gptno=2 → gptcorrect=l2c=0, better==gptno
        resp(1, 11, 2, 1, 1, 1),  # gptcorrect=1, better==trueno
        # id 2: 3 responses, 2-1 majority → agreement 0.5
        resp(2, 20, 1, 1, 1, 1),
        resp(2, 21, 1, 1, 1, 1),
        resp(2, 22, 1, 0, 1, 2),
    ]
    out = (
        aggregate_responses(ray.data.from_items(rows), num_partitions=2)
        .to_pandas()
        .set_index("id")
        .sort_index()
    )
    assert out.loc[0, "num"] == 3
    assert out.loc[0, "gptcorrect"] == 1
    assert out.loc[0, "gptcorrect_agreement"] == 1.0
    assert out.loc[0, "truecorrect"] == 0
    assert out.loc[0, "gptbetter"] == 1  # better==1==gptlist every time
    assert out.loc[0, "gptmissing"] == pytest.approx(1.0)  # (2+1+0)/3
    assert out.loc[0, "gptextra"] == pytest.approx(0.0)
    assert out.loc[0, "trueextra"] == pytest.approx(1.0)  # "x" every row

    assert out.loc[1, "num"] == 2
    assert out.loc[1, "gptcorrect"] == 0  # tie → earliest response's 0
    assert out.loc[1, "gptcorrect_agreement"] == 0.0
    assert out.loc[1, "truecorrect"] == 1  # unanimous l1c
    assert out.loc[1, "truecorrect_agreement"] == 1.0
    # gptbetter tie: order 10 has better==2==gptno → 1; order 11 has
    # better==1==trueno → 0. Earliest (order 10) wins the tie → 1.
    assert out.loc[1, "gptbetter"] == 1
    assert out.loc[1, "gptbetter_agreement"] == 0.0

    assert out.loc[2, "gptcorrect"] == 1
    assert out.loc[2, "gptcorrect_agreement"] == 0.5
    assert out.loc[2, "gptbetter"] == 1
    assert out.loc[2, "gptbetter_agreement"] == 0.5


def test_read_turk_batches_closes_the_loop(ray_session, tmp_path):
    """Per-worker MTurk batch CSVs (boilerplate + Input./Answer. columns,
    the reference's results/survey/ layout) → read_turk_batches →
    aggregate_responses runs end-to-end and matches hand-computed
    majorities."""
    from promptner_ray.pipelines.survey import (
        aggregate_responses,
        read_turk_batches,
    )

    def batch_csv(rows):
        return pd.DataFrame(
            [
                {
                    "HITId": "h",
                    "WorkerId": "w",
                    "AssignmentStatus": "Approved",
                    "Input.id": r[0],
                    "Input.gptlist": r[1],
                    "Answer.l1correct": r[2],
                    "Answer.l2correct": r[3],
                    "Answer.better": r[4],
                    "Answer.l1missing": r[5],
                    "Answer.l1extra": "",
                    "Answer.l2missing": "",
                    "Answer.l2extra": "",
                }
                for r in rows
            ]
        )

    # worker files 0/1/2: id 7 judged three times (2-1 on gptcorrect),
    # id 8 twice (split → earliest wins)
    batch_csv([(7, 1, 1, 0, 1, "a,b"), (8, 2, 1, 0, 2, "")]).to_csv(
        tmp_path / "survey_result_0.csv", index=False
    )
    batch_csv([(7, 1, 1, 0, 1, "a"), (8, 2, 1, 1, 1, "")]).to_csv(
        tmp_path / "survey_result_1.csv", index=False
    )
    batch_csv([(7, 1, 0, 0, 2, "")]).to_csv(
        tmp_path / "survey_result_2.csv", index=False
    )

    out = (
        aggregate_responses(read_turk_batches(tmp_path), num_partitions=2)
        .to_pandas()
        .set_index("id")
        .sort_index()
    )
    assert out.loc[7, "num"] == 3
    assert out.loc[7, "gptcorrect"] == 1  # 2-1 majority
    assert out.loc[7, "gptcorrect_agreement"] == 0.5
    assert out.loc[7, "gptmissing"] == pytest.approx(1.0)  # (2+1+0)/3
    assert out.loc[8, "num"] == 2
    # split 0/1 → earliest response (worker file 0) wins: gptno=2,
    # l2correct=0
    assert out.loc[8, "gptcorrect"] == 0
    assert out.loc[8, "gptcorrect_agreement"] == 0.0

    # explicit n_workers path reads the same files
    out2 = (
        aggregate_responses(
            read_turk_batches(tmp_path, n_workers=3), num_partitions=2
        )
        .to_pandas()
        .set_index("id")
        .sort_index()
    )
    assert out2.loc[7, "gptcorrect"] == out.loc[7, "gptcorrect"]


def test_read_hf_hub_offline_gate():
    """Offline (no `datasets` package) the live-hub connector must fail
    with the actionable snapshot pointer, not an opaque ImportError."""
    import importlib.util

    import pytest as _pytest

    from promptner_ray.sources.hf_tagged import read_hf_hub

    if importlib.util.find_spec("datasets") is not None:
        _pytest.skip("datasets installed: the live path would run")
    with _pytest.raises(ImportError, match="read_tagged_parquet"):
        read_hf_hub("conll2003")


def test_turk_submission_client_closes_the_full_loop(ray_session, tmp_path):
    """assignments → TurkSubmissionClient.submit_hits → collect_batches
    → read_turk_batches → aggregate_responses: the whole paid-survey
    lifecycle runs against the deterministic local transport, and the
    default (no-network) transport refuses loudly."""
    import pytest

    from promptner_ray.pipelines.survey import (
        LocalTurkTransport,
        TurkSubmissionClient,
        aggregate_responses,
        read_turk_batches,
    )

    assignments = pd.DataFrame(
        [
            {"worker": w, "id": ex, "gptlist": 1 + (ex % 2),
             "sentence": f"s{ex}"}
            for ex in range(4)
            for w in (0, 1, 2)
        ]
    )
    client = TurkSubmissionClient(transport=LocalTurkTransport(seed=5))
    hit_ids = client.submit_hits(assignments)
    assert len(hit_ids) == len(assignments) == 12
    paths = client.collect_batches(tmp_path)
    assert [p.rsplit("_", 1)[1] for p in paths] == [
        "0.csv", "1.csv", "2.csv"
    ]

    out = (
        aggregate_responses(read_turk_batches(tmp_path), num_partitions=2)
        .to_pandas()
        .set_index("id")
        .sort_index()
    )
    assert list(out.index) == [0, 1, 2, 3]
    assert (out["num"] == 3).all()  # 3 workers judged every example
    assert set(out["gptcorrect"].unique()) <= {0, 1}

    with pytest.raises(NotImplementedError, match="no network"):
        TurkSubmissionClient().submit_hits(assignments.head(1))
