"""Experiment runner: the reference's primary workflow (entry point 1).

Reproduces ``run.py``'s eval loop (``run.py:11-70``) Ray-Data-first: a
sentence-record Dataset (from IOB2 / HF-snapshot sources) → optional
seeded sample → batched detection → per-sentence span-F1 → the reference's
results frame ``[text, entities, truth, pred, meta, f1]`` (``run.py:13``)
plus running micro/macro aggregates from distributed partial counts.

In-sandbox the model is the gold-backed stub (vocabulary = the split's own
gold surface→type pairs, SURVEY.md §5.3.4): detection quality then reflects
the parser/aligner semantics, not model quality.  Swap ``model_kind`` for a
real client to reproduce the paper numbers.
"""

from __future__ import annotations

import pyarrow as pa

from ..configs import make_task_spec
from ..kernels.bio import prf_from_counts, span_prf_counts
from ..model import make_model
from ..stages.detect import MentionDetector


def gold_vocab(rows: list[dict]) -> dict[str, str]:
    """Surface→type lookup from a split's gold annotations (stub backing).

    Later duplicates of a surface overwrite earlier ones — the same
    collision behavior as the reference's ``types`` dict (``data.py:144``).
    """
    vocab: dict[str, str] = {}
    for row in rows:
        for surface, etype in zip(row["entities"], row["etypes"]):
            vocab[surface] = etype
    return vocab


class _ExperimentKernel:
    """Batch kernel: sentence rows → reference-schema result rows."""

    def __init__(self, task: str, vocab_ref, model_kind: str = "stub") -> None:
        import ray

        self.spec = make_task_spec(task=task)
        kwargs = {}
        if model_kind == "stub":
            kwargs["vocab"] = ray.get(vocab_ref)
            kwargs["distractor_rate"] = 0.0
            kwargs["malformed_rate"] = 0.0
        self.model = make_model(model_kind, **kwargs)
        self.detector = MentionDetector.__new__(MentionDetector)
        self.detector.spec = self.spec
        self.detector.model = self.model
        self.detector.chat = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.detect import _mentions_from_output

        texts = batch.column("text").to_pylist()
        truths = batch.column("bio").to_pylist()
        entities = batch.column("entities").to_pylist()
        prompts = [
            self.spec.prompt.render_completion_lazy(t) for t in texts
        ]
        outputs = self.model.generate(prompts)
        preds, f1s = [], []
        for text, truth, out in zip(texts, truths, outputs):
            mentions = _mentions_from_output(out, text, self.spec)
            tags = ["O"] * len(text.split(" "))
            for m in mentions:
                mtype = m["mtype"]
                if "-" in mtype:
                    for j in range(m["span_start"], m["span_end"]):
                        tags[j] = mtype
                else:
                    tags[m["span_start"]] = "B-" + mtype
                    for j in range(m["span_start"] + 1, m["span_end"]):
                        tags[j] = "I-" + mtype
            counts = span_prf_counts(list(truth), tags)
            f1s.append(prf_from_counts(counts)["micro_f1"])
            preds.append(" ".join(tags))
        return pa.table(
            {
                "text": pa.array(texts, type=pa.string()),
                "entities": pa.array(
                    [list(e) for e in entities], type=pa.list_(pa.string())
                ),
                "truth": pa.array(
                    [" ".join(t) for t in truths], type=pa.string()
                ),
                "pred": pa.array(preds, type=pa.string()),
                "meta": pa.array(outputs, type=pa.string()),
                "f1": pa.array(f1s, type=pa.float64()),
            }
        )


def run_experiment(
    sentences_ds,
    task: str = "conll",
    limit: int | None = None,
    seed: int = 42,
    model_kind: str = "stub",
    concurrency=(1, 4),
):
    """sentence-record Dataset → (results Dataset, summary dict).

    ``limit`` mirrors the reference's ``dataset.sample(limit)``
    (``run.py:62-64``) as a seeded random sample.  The final micro/macro
    P/R/F1 aggregate distributes as per-batch partial counts (G1).
    """
    import ray

    rows = sentences_ds.take_all()  # experiment splits are small by design
    if limit is not None and limit < len(rows):
        import random

        rows = random.Random(seed).sample(rows, limit)
    vocab_ref = ray.put(gold_vocab(rows))
    ds = ray.data.from_items(rows).map_batches(
        _ExperimentKernel,
        fn_constructor_kwargs={
            "task": task,
            "vocab_ref": vocab_ref,
            "model_kind": model_kind,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    results = ds.materialize()
    from collections import Counter

    totals: Counter = Counter()
    for r in results.take_all():
        for etype, (tp, np_, nt) in span_prf_counts(
            r["truth"].split(" "), r["pred"].split(" ")
        ).items():
            totals[(etype, "tp")] += tp
            totals[(etype, "n_pred")] += np_
            totals[(etype, "n_truth")] += nt
    counts = {
        t: (totals[(t, "tp")], totals[(t, "n_pred")], totals[(t, "n_truth")])
        for t in {k[0] for k in totals}
    }
    return results, prf_from_counts(counts)
