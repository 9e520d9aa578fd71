"""HF local / sharded model client plumbing (reference models.py:55-105
parity).  The sandbox ships no torch, so the factory seam injects fakes;
what IS pinned end to end: batching, prompt materialization, the
sharded-kind defaults, the detection stage running on kind="hf", and the
actionable import gate."""

from __future__ import annotations

import pytest

from promptner_ray.model import (
    SHARDED_DEVICE_MAP,
    HFLocalModel,
    VocabStubModel,
    make_model,
)


def _capture_factory(calls, outputs=None):
    def factory(model_name, max_new_tokens, device_map):
        calls.append(
            {
                "model_name": model_name,
                "max_new_tokens": max_new_tokens,
                "device_map": device_map,
            }
        )

        def generate_texts(texts):
            calls.append(list(texts))
            return (
                [f"echo:{t}" for t in texts]
                if outputs is None
                else [outputs(t) for t in texts]
            )

        return generate_texts

    return factory


def test_hf_batches_and_preserves_order() -> None:
    calls: list = []
    m = HFLocalModel(batch_size=3, factory=_capture_factory(calls))
    prompts = [f"p{i}" for i in range(8)]
    out = m.generate(prompts)
    assert out == [f"echo:p{i}" for i in range(8)]
    chunks = [c for c in calls if isinstance(c, list)]
    assert [len(c) for c in chunks] == [3, 3, 2]  # batch_size respected


def test_hf_materializes_lazy_and_chat_prompts() -> None:
    calls: list = []
    m = HFLocalModel(factory=_capture_factory(calls))

    class Lazy:
        text = "rendered completion"

    chat = [("you are a tagger", "system"), ("tag this", "user")]
    out = m.generate([Lazy(), "plain", chat])
    assert out[0] == "echo:rendered completion"
    assert out[1] == "echo:plain"
    assert out[2] == "echo:system: you are a tagger\nuser: tag this"


def test_sharded_kind_defaults() -> None:
    calls: list = []
    m = make_model("hf_sharded", factory=_capture_factory(calls))
    assert isinstance(m, HFLocalModel)
    assert m.max_new_tokens == 600  # reference models.py:88
    assert m.device_map == SHARDED_DEVICE_MAP
    # 24 decoder blocks split 4 ways, contiguous, disjoint
    blocks = [b for gpu in sorted(SHARDED_DEVICE_MAP) for b in SHARDED_DEVICE_MAP[gpu]]
    assert blocks == list(range(24))


def test_hf_without_transformers_raises_actionable() -> None:
    with pytest.raises(NotImplementedError, match="factory"):
        make_model("hf")


def test_detection_stage_runs_on_hf_kind() -> None:
    """MentionDetector(model_kind='hf') with a stub-backed factory must
    detect exactly what the stub path detects — the plumbing proof that
    a real HF model drops in without touching the stage."""
    import pyarrow as pa

    from promptner_ray.stages.detect import MentionDetector
    from promptner_ray.synth import TASK_VOCABS

    stub = VocabStubModel(TASK_VOCABS.get("conll"))

    def stub_backed_factory(model_name, max_new_tokens, device_map):
        # texts arriving here ARE the fully rendered prompts
        return lambda texts: stub.generate(texts)

    batch = pa.table(
        {
            "url": ["u1", "u2"],
            "sent_id": pa.array([0, 0], type=pa.int64()),
            "text": [
                "Kenji Tanaka visited Tokyo .",
                "Acme Corp opened in Berlin .",
            ],
        }
    )
    via_hf = MentionDetector(
        task="conll",
        model_kind="hf",
        model_kwargs={"factory": stub_backed_factory},
    )(batch)
    via_stub = MentionDetector(task="conll", model_kind="stub")(batch)
    assert via_hf.equals(via_stub)
    assert len(via_hf.column("mentions")[0]) > 0
