"""Tests for IOB2 source/sink, distributed F1, type verification, autogen."""

from __future__ import annotations

import pyarrow as pa
import pytest

from promptner_ray.kernels.autogen import autogenerate_exemplars
from promptner_ray.kernels.parsing import parse_answer_list
from promptner_ray.model import make_model
from promptner_ray.sources.iob2 import parse_iob2_text, read_iob2, write_iob2

IOB2_SAMPLE = """\
Andy\tB-PER
Caddick\tI-PER
visited\tO
Paris\tB-LOC
.\tO

Essex\tB-ORG
won\tO
"""

FEWNERD_SAMPLE = """\
Whitehall\tgovernment/governmentagency
announced\tO
cuts\tO
"""


def test_parse_iob2_text():
    rows = parse_iob2_text(IOB2_SAMPLE)
    assert len(rows) == 2
    assert rows[0]["text"] == "Andy Caddick visited Paris ."
    assert rows[0]["entities"] == ["Andy Caddick", "Paris"]
    assert rows[0]["etypes"] == ["PER", "LOC"]
    assert rows[1]["entities"] == ["Essex"]


def test_parse_iob2_fewnerd_normalization():
    # "-" appears in the tag only for FewNERD main-sub tags; the slash
    # sub-type normalization applies there (reference data.py:79-80).
    rows = parse_iob2_text(
        "Whitehall\torganization-government/governmentagency\nx\tO\n"
    )
    assert rows[0]["bio"][0] == "organization-government"


def test_iob2_roundtrip(ray_session, tmp_path):
    rows = parse_iob2_text(IOB2_SAMPLE)
    path = tmp_path / "sample.iob2"
    write_iob2(rows, path)
    back = read_iob2(str(path)).to_pandas()
    assert len(back) == 2
    assert list(back["text"]) == [r["text"] for r in rows]
    assert [list(b) for b in back["bio"]] == [r["bio"] for r in rows]


def _detected_table(rows):
    from promptner_ray.stages.detect import MENTION_STRUCT

    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], type=pa.string()),
            "sent_id": pa.array([r[1] for r in rows], type=pa.int32()),
            "text": pa.array([r[2] for r in rows], type=pa.string()),
            "mentions": pa.array(
                [r[3] for r in rows], type=pa.list_(MENTION_STRUCT)
            ),
        }
    )


def test_evaluate_f1_counts(ray_session):
    import ray

    from promptner_ray.pipelines.eval import evaluate_f1, f1_counts

    det = _detected_table(
        [
            (
                "u1",
                0,
                "Andy Caddick visited Paris .",
                [
                    {"surface": "Andy Caddick", "mtype": "PER",
                     "span_start": 0, "span_end": 2},
                    {"surface": "Paris", "mtype": "LOC",
                     "span_start": 3, "span_end": 4},
                ],
            ),
            ("u1", 1, "Essex won", []),  # missed ORG → FN
        ]
    )
    gold = pa.table(
        {
            "url": pa.array(["u1", "u1"], type=pa.string()),
            "sent_id": pa.array([0, 1], type=pa.int32()),
            "bio": pa.array(
                [
                    ["B-PER", "I-PER", "O", "B-LOC", "O"],
                    ["B-ORG", "O"],
                ],
                type=pa.list_(pa.string()),
            ),
        }
    )
    det_ds = ray.data.from_arrow(det)
    gold_ds = ray.data.from_arrow(gold)
    counts = {
        r["etype"]: (r["tp"], r["n_pred"], r["n_truth"])
        for r in f1_counts(det_ds, gold_ds, num_partitions=2).take_all()
    }
    assert counts == {"PER": (1, 1, 1), "LOC": (1, 1, 1), "ORG": (0, 0, 1)}
    summary = evaluate_f1(det_ds, gold_ds, num_partitions=2)
    assert summary["micro_precision"] == 1.0
    assert summary["micro_recall"] == pytest.approx(2 / 3)


def test_type_verifier_corrects_disputed_type(ray_session):
    import ray

    from promptner_ray.stages.typecheck import verify_types

    det = _detected_table(
        [
            (
                "u1",
                0,
                "England hosted the World Cup .",
                [
                    # first pass got the type WRONG; the stub's second
                    # opinion (vocab-backed) disagrees → dispute resolves
                    # to the vocab type.
                    {"surface": "England", "mtype": "ORG",
                     "span_start": 0, "span_end": 1},
                    {"surface": "World Cup", "mtype": "MISC",
                     "span_start": 3, "span_end": 5},
                ],
            )
        ]
    )
    out = verify_types(
        ray.data.from_arrow(det), task="conll", concurrency=1
    ).take_all()
    mtypes = [m["mtype"] for m in out[0]["mentions"]]
    assert mtypes == ["LOC", "MISC"]


def test_autogen_exemplars_parse_back():
    model = make_model("stub")
    rows = [
        {
            "text": "Andy Caddick joined Essex .",
            "tokens": ["Andy", "Caddick", "joined", "Essex", "."],
            "bio": ["B-PER", "I-PER", "O", "B-ORG", "O"],
        }
    ]
    blocks = autogenerate_exemplars(
        model, defn="An entity is a thing.", sentences=rows
    )
    assert len(blocks) == 1 and "Answer:" in blocks[0]
    answers, typestrings = parse_answer_list(
        blocks[0], separator="|", true_only=True, identify_types=True
    )
    assert "andy" in answers[0] and "(PER)" in typestrings[0]
    assert any("essex" in a for a in answers)


def test_hf_tagged_connectors(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from promptner_ray.sources.hf_tagged import (
        read_ontonotes_parquet,
        read_tagged_parquet,
    )

    conll = pa.table(
        {
            "tokens": pa.array(
                [["Andy", "Caddick", "joined", "Essex"], ["Paris", "fell"]],
                type=pa.list_(pa.string()),
            ),
            "ner_tags": pa.array(
                [[1, 2, 0, 3], [5, 0]], type=pa.list_(pa.int32())
            ),
        }
    )
    pq.write_table(conll, tmp_path / "conll.parquet")
    rows = (
        read_tagged_parquet(str(tmp_path / "conll.parquet"), "conll2003")
        .to_pandas()
        .to_dict("records")
    )
    assert list(rows[0]["entities"]) == ["Andy Caddick", "Essex"]
    assert list(rows[0]["etypes"]) == ["PER", "ORG"]
    assert list(rows[1]["entities"]) == ["Paris"] and list(rows[1]["etypes"]) == ["LOC"]

    onto = pa.table(
        {
            "sentences": pa.array(
                [
                    [
                        {"words": ["Obama", "spoke"], "named_entities": [1, 0]},
                        {"words": ["in", "Kenya"], "named_entities": [0, 9]},
                    ]
                ],
                type=pa.list_(
                    pa.struct(
                        [
                            ("words", pa.list_(pa.string())),
                            ("named_entities", pa.list_(pa.int32())),
                        ]
                    )
                ),
            )
        }
    )
    pq.write_table(onto, tmp_path / "onto.parquet")
    orows = (
        read_ontonotes_parquet(str(tmp_path / "onto.parquet"))
        .to_pandas()
        .to_dict("records")
    )
    assert list(orows[0]["etypes"]) == ["PERSON"]
    assert list(orows[1]["entities"]) == ["Kenya"] and list(orows[1]["etypes"]) == ["GPE"]


def test_postprocess_results():
    from promptner_ray.pipelines.eval import postprocess_results_batch

    batch = pa.table(
        {
            "text": ["Essex won"],
            "bio": ["B-ORG O"],
            "pred_bio": ["B-ORG O"],
        }
    )
    out = postprocess_results_batch(batch)
    assert out.column("pred_text")[0].as_py() == "Essex | B-ORG won | O"
    assert out.column("correct")[0].as_py() is True


def test_sample_all_types_covers_everything():
    from promptner_ray.kernels.autogen import sample_all_types

    rows = [
        {"bio": ["B-PER", "O"]},
        {"bio": ["B-ORG", "O"]},
        {"bio": ["B-LOC", "O"]},
        {"bio": ["O", "O"]},
    ] * 5
    sample = sample_all_types(rows, min_k=3, seed=7)
    covered = {t[2:] for r in sample for t in r["bio"] if t != "O"}
    assert covered == {"PER", "ORG", "LOC"}
    assert sample == sample_all_types(rows, min_k=3, seed=7)  # deterministic


def test_knn_lsh_recall_floor(ray_session):
    """Multi-probe LSH ANN must recover a meaningful share of the exact
    top-k even on isotropic (worst-case) vectors — the driver's sf
    embeddings are isotropic, where ANY sublinear index degrades toward
    its candidate fraction (2^-LSH_CONFIDENT = 12.5% here; ~0.23
    observed ≈ 2× random).  The regime ANN exists for — clustered
    vectors — is gated at 0.8 in tests/test_similarity_recall.py."""
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sf = "/root/testdata/sf0.001"
    exact = {(r["qid"], r["nid"]) for r in qs["embed_knn"](sf).take_all()}
    approx = {(r["qid"], r["nid"]) for r in qs["embed_knn_lsh"](sf).take_all()}
    assert len(exact & approx) / len(exact) >= 0.2


def test_cli_synth_run_eval(ray_session, tmp_path):
    from promptner_ray.cli import main

    out = main(
        [
            "synth",
            "--out", str(tmp_path / "corpus"),
            "--n-docs", "32",
            "--sf-dir", "/root/testdata/sf0.001",
        ]
    )
    root = out["corpus_root"]
    summary = main(
        ["run", "--input", root, "--out", str(tmp_path / "kg")]
    )
    assert summary["parts_committed"] == 64 and summary["edges"] > 0
    f1 = main(["eval", "--input", root])
    assert f1["micro_f1"] > 0.9


def test_genia_task_detection():
    from promptner_ray.configs import make_task_spec
    from promptner_ray.model import make_model
    from promptner_ray.stages.detect import detect_mentions_in_text
    from promptner_ray.synth import GENIA_VOCAB

    spec = make_task_spec(task="genia")
    model = make_model("stub", vocab=GENIA_VOCAB)
    ms = detect_mentions_in_text(
        "Expression of IL-2 mRNA in Jurkat cells requires NF-kappa B .",
        model,
        spec,
    )
    got = {(m["surface"], m["mtype"]) for m in ms}
    assert ("IL-2 mRNA", "RNA") in got
    assert ("Jurkat cells", "cell_line") in got
    assert ("NF-kappa B", "protein") in got


def test_chat_mode_matches_completion_mode(ray_session):
    import ray

    from promptner_ray.stages.detect import MentionDetector

    batch = pa.table(
        {
            "url": ["u"] * 2,
            "sent_id": pa.array([0, 1], type=pa.int32()),
            "text": [
                "Andy Caddick visited Paris .",
                "Essex defeated Surrey at Grace Road yesterday .",
            ],
        }
    )
    completion = MentionDetector(task="conll", chat=False)(batch)
    chat = MentionDetector(task="conll", chat=True)(batch)
    assert completion.column("mentions").to_pylist() == chat.column(
        "mentions"
    ).to_pylist()


def test_autogen_to_spec_to_detection_loop():
    """Close the reference's autogen loop (run.py:80-85): generate CoT
    exemplars from gold sentences, build a prompt spec from them, and run
    detection with the resulting task prompt."""
    from promptner_ray.configs import TaskSpec
    from promptner_ray.kernels.autogen import autogenerate_exemplars, sample_all_types
    from promptner_ray.kernels.prompts import build_prompt_spec
    from promptner_ray.model import make_model
    from promptner_ray.stages.detect import detect_mentions_in_text

    gold = [
        {
            "text": "Andy Caddick joined Essex .",
            "tokens": ["Andy", "Caddick", "joined", "Essex", "."],
            "bio": ["B-PER", "I-PER", "O", "B-ORG", "O"],
        },
        {
            "text": "Paris hosted the World Cup .",
            "tokens": ["Paris", "hosted", "the", "World", "Cup", "."],
            "bio": ["B-LOC", "O", "O", "B-MISC", "I-MISC", "O"],
        },
    ]
    model = make_model("stub")
    picked = sample_all_types(gold, min_k=2, seed=3)
    exemplars = autogenerate_exemplars(
        model, defn="An entity is a thing.", sentences=picked
    )
    prompt = build_prompt_spec(
        defn="An entity is a thing.", cot_exemplars=exemplars
    )
    spec = TaskSpec(name="autogen", prompt=prompt)
    ms = detect_mentions_in_text("Essex visited Paris .", model, spec)
    got = {(m["surface"], m["mtype"]) for m in ms}
    assert ("Essex", "ORG") in got and ("Paris", "LOC") in got


def test_exact_dedup_keeper_logic(ray_session):
    import ray

    from promptner_ray.functions.dedup import exact_dedup

    docs = pa.table(
        {
            "doc_id": pa.array([5, 1, 3, 2], type=pa.int64()),
            "text": ["same text", "same text", "other", "same text"],
        }
    )
    rows = {
        r["doc_id"]: r["n_dups"]
        for r in exact_dedup(ray.data.from_arrow(docs)).take_all()
    }
    assert rows == {1: 3, 3: 1}  # min doc_id kept, dup count right


def test_multimodal_stub_contract():
    from promptner_ray.functions.multimodal import MediaFeatures, _fake_decode

    mf = MediaFeatures()
    w, h = mf.decode(b"payload")
    assert (w, h) == _fake_decode(b"payload")
    assert 1 <= w <= 1920 and 1 <= h <= 1080
    with pytest.raises(NotImplementedError):
        mf.resize(b"payload", 10, 10)
    with pytest.raises(NotImplementedError):
        mf.frame_sample(b"payload", 2)


def test_run_experiment_on_iob2(ray_session, tmp_path):
    """Reference entry point 1 (run.py eval loop) end-to-end: IOB2 split →
    gold-backed stub detection → results frame + micro/macro F1."""
    from promptner_ray.pipelines.experiment import run_experiment

    path = tmp_path / "split.iob2"
    path.write_text(IOB2_SAMPLE)
    sentences = read_iob2(str(path))
    results, summary = run_experiment(sentences, task="conll")
    rows = results.take_all()
    assert {r["text"] for r in rows} == {
        "Andy Caddick visited Paris .",
        "Essex won",
    }
    assert set(rows[0]) == {"text", "entities", "truth", "pred", "meta", "f1"}
    # gold-backed stub with zero noise → perfect span recovery
    assert summary["micro_f1"] == 1.0 and all(r["f1"] == 1.0 for r in rows)


def test_run_experiment_on_reference_genia_sample(ray_session):
    """Drive the experiment runner over the reference repo's real GENIA
    IOB2 sample (gated: needs /root/reference)."""
    import pathlib

    from promptner_ray.pipelines.experiment import run_experiment

    sample = pathlib.Path("/root/reference/data/Genia/sampletest1.iob2")
    if not sample.exists():
        pytest.skip("reference repo not available")
    sentences = read_iob2(str(sample))
    results, summary = run_experiment(
        sentences, task="genia", limit=40, seed=7
    )
    assert results.count() == 40
    # gold-backed stub: high-but-imperfect (duplicate-surface dict
    # collisions and span-alignment quirks are the only loss sources)
    assert summary["micro_f1"] > 0.8, summary


def test_countmin_sketch_bounds(ray_session):
    """CM estimates dominate true counts and are tight for heavy hitters."""
    import collections

    import ray

    from promptner_ray.functions.sketch import countmin_over, hot_keys
    from promptner_ray.functions.textstats import explode_tokens_batch

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    tokens = docs.map_batches(explode_tokens_batch, batch_format="pyarrow")
    cm = countmin_over(tokens, "token")

    exact = collections.Counter()
    for r in docs.take_all():
        exact.update(r["text"].split(" "))
    assert cm.total == sum(exact.values())
    for tok, true_n in exact.most_common(10):
        est = cm.estimate(tok)
        assert est >= true_n  # CM never underestimates
        assert est <= true_n + 0.01 * cm.total  # ε-tight
    hot = hot_keys(tokens, "token", list(exact), threshold_frac=0.02)
    truly_hot = {t for t, n in exact.items() if n >= 0.02 * cm.total}
    assert truly_hot <= set(hot)  # no false negatives on heavy hitters


def test_repetition_stats_crafted():
    import pyarrow as pa

    from promptner_ray.functions.textstats import repetition_stats_batch

    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b a b c", "x y z", "q", "r r r r"],
        }
    )
    out = repetition_stats_batch(t).to_pandas().set_index("doc_id")
    # "a b a b c": bigrams [a b, b a, a b, b c] -> 2 of 4 duplicated
    assert out.loc[0, "dup_2gram_frac"] == 0.5
    assert out.loc[0, "top_token_frac"] == 2 / 5
    assert out.loc[1, "dup_2gram_frac"] == 0.0
    assert out.loc[2, "n_tokens"] == 1 and out.loc[2, "dup_2gram_frac"] == 0.0
    assert out.loc[3, "top_token_frac"] == 1.0
    assert out.loc[3, "dup_2gram_frac"] == 1.0  # "r r" x3, all duplicated


def test_range_join_kernel_boundaries():
    import numpy as np
    import pyarrow as pa

    from promptner_ray.functions.rangejoin import _range_match

    # right side: user 1 has orders at t=100, 200, 300
    index = {1: np.array([100, 200, 300], dtype=np.int64)}
    out = _range_match(
        np.array([10, 11, 12, 13], dtype=np.int64),
        np.array([1, 1, 1, 2], dtype=np.int64),
        np.array([200, 199, 350, 200], dtype=np.int64),
        index,
        window_us=100,
    ).to_pandas().set_index("event_id")
    # ts=200, window [100, 200]: both bounds inclusive -> 100 and 200
    assert out.loc[10, "n_orders"] == 2
    assert out.loc[10, "first_order_ts"].value == 100 * 1000  # us -> ns
    # ts=199, window [99, 199]: only 100
    assert out.loc[11, "n_orders"] == 1
    # ts=350, window [250, 350]: only 300
    assert out.loc[12, "n_orders"] == 1
    # unknown key: LEFT-join semantics, row kept with n=0 and null ts
    assert out.loc[13, "n_orders"] == 0
    assert pa.Table.from_pandas(out.reset_index()).column(
        "first_order_ts"
    ).null_count == 1
