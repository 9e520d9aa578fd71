"""Mention detection: the actor-pool LLM stage.

``MentionDetector`` is a callable CLASS for
``map_batches(MentionDetector, fn_constructor_kwargs=…, concurrency=N,
batch_size=B)``: the prompt spec and model client are built ONCE per actor in
``__init__``; each ``__call__`` fuses prompt-render → batched model call →
answer parsing → span alignment for a whole Arrow batch of sentences
(replacing the reference's one-sentence-at-a-time loop, ``run.py:16-44``).

Output is one row per sentence with mentions as a ``list<struct>`` column —
keeping per-sentence grouping explicit so downstream triple induction needs
NO shuffle to regroup by sentence.
"""

from __future__ import annotations

import functools as _functools

import pyarrow as pa

from ..configs import TaskSpec, make_task_spec
from ..kernels.bio import bio_entities
from ..kernels.parsing import parse_answer_list
from ..kernels.span import align_spans
from ..model import make_model

MENTION_STRUCT = pa.struct(
    [
        ("surface", pa.string()),
        ("mtype", pa.string()),
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
    ]
)


def detect_mentions_in_text(
    text: str, model, spec: TaskSpec, chat: bool = False
) -> list[dict]:
    """Single-sentence detection (used by the single-process oracle)."""
    prompt = (
        spec.prompt.render_chat(text) if chat else spec.prompt.render_completion(text)
    )
    return _mentions_from_output(model.generate([prompt])[0], text, spec)


def _mentions_from_output(output: str, text: str, spec: TaskSpec) -> list[dict]:
    try:
        parsed = parse_answer_list(
            output,
            separator=spec.separator,
            true_only=spec.true_only,
            identify_types=spec.identify_types,
        )
        answers, typestrings = parsed if spec.identify_types else (parsed, [])
        if spec.split_phrases:
            from ..kernels.cleaning import split_phrase_answers

            answers, typestrings = split_phrase_answers(answers, typestrings)
        tags = align_spans(
            answers, typestrings, para=text, bug_compat=spec.bug_compat
        )
    except (IndexError, ValueError):
        # Reference behavior is to drop the whole row (run.py:43-44); the
        # engine drops just this sentence's mentions, never the document.
        if spec.bug_compat:
            raise
        return []
    tokens = text.split(" ")
    mentions = []
    for etype, start, end in bio_entities(tags):
        mentions.append(
            {
                "surface": " ".join(tokens[start:end]),
                "mtype": etype,
                "span_start": start,
                "span_end": end,
            }
        )
    return mentions


def detect_mentions_batch(
    batch: pa.Table,
    task: str = "conll",
    model_kind: str = "stub",
    chat: bool = False,
    model_kwargs_json: str = "{}",
) -> pa.Table:
    """Task-mode detection kernel with per-worker-process cached state.

    For LIGHTWEIGHT model clients (the deterministic stub, or any client
    whose setup is milliseconds) the stage runs as plain tasks: Ray reuses
    task worker processes across executions, so the spec/model build
    happens once per process (functools-cached) and the stage scheduling
    scales like stateless tasks — an actor pool would pay its pool
    creation on every pipeline execution.  Heavy clients (GPU/local LLM)
    keep the ``MentionDetector`` actor-pool path below.
    """
    det = _cached_detector(task, model_kind, chat, model_kwargs_json)
    return det(batch)


@_functools.lru_cache(maxsize=8)
def _cached_detector(
    task: str, model_kind: str, chat: bool, model_kwargs_json: str
) -> "MentionDetector":
    import json

    return MentionDetector(
        task=task,
        model_kind=model_kind,
        chat=chat,
        model_kwargs=json.loads(model_kwargs_json),
    )


class MentionDetector:
    """Actor-pool batch kernel: sentences → sentence rows + mention lists."""

    def __init__(
        self,
        task: str = "conll",
        exemplar: bool = True,
        coT: bool = True,
        tf: bool = True,
        model_kind: str = "stub",
        chat: bool = False,
        model_kwargs: dict | None = None,
    ) -> None:
        self.spec = make_task_spec(task=task, exemplar=exemplar, coT=coT, tf=tf)
        kwargs = dict(model_kwargs or {})
        if model_kind == "stub" and "vocab" not in kwargs:
            from ..synth import TASK_VOCABS

            kwargs["vocab"] = TASK_VOCABS.get(task)
        self.model = make_model(model_kind, **kwargs)
        self.chat = chat

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        render = (
            self.spec.prompt.render_chat
            if self.chat
            else self.spec.prompt.render_completion_lazy
        )
        prompts = [render(t) for t in texts]
        outputs = self.model.generate(prompts)
        mention_lists = [
            _mentions_from_output(out, text, self.spec)
            for out, text in zip(outputs, texts)
        ]
        return pa.table(
            {
                "url": batch.column("url"),
                "sent_id": batch.column("sent_id"),
                "text": batch.column("text"),
                "mentions": pa.array(
                    mention_lists, type=pa.list_(MENTION_STRUCT)
                ),
            }
        )
