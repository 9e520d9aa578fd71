"""Library API: single-sentence NER closure (reference entry point 2).

Mirrors ``custom.get_ner_system`` (reference ``custom.py:82-94`` →
``Algorithm.perform``, ``algorithms.py:133-184``): build once, then call
``get_entities(sentence)`` → ``(entities, typestrings, metadata)``.

Unlike the span path (which never deduplicates, reference
``algorithms.py:69``), this path cleans output — ``compat=True`` replays
the reference's dead-code dedup bug (``clean_output`` discards its
deduplicated lists, SURVEY.md §2.2 M8); the default implements the
intended order-preserving dedup.

For corpus-scale extraction use the Ray pipeline
(``promptner_ray.pipelines.kg``); this closure is the drop-in for the
reference's interactive/custom usage.
"""

from __future__ import annotations

from collections.abc import Callable

from .configs import make_task_spec
from .kernels.cleaning import clean_answers, split_phrase_answers
from .kernels.parsing import parse_answer_list
from .model import make_model


def get_ner_system(
    task: str = "conll",
    split_phrases: bool = False,
    identify_types: bool = True,
    model_kind: str = "stub",
    model_kwargs: dict | None = None,
    chat: bool = False,
    compat: bool = False,
) -> Callable[[str], tuple[list[str], list[str], str]]:
    """Build a ``get_entities(sentence)`` closure over the shipped task
    configs (or any task added to ``task_data.TASK_DATA``)."""
    spec = make_task_spec(task=task, split_phrases=split_phrases)
    model = make_model(model_kind, **(model_kwargs or {}))

    def get_entities(sentence: str) -> tuple[list[str], list[str], str]:
        prompt = (
            spec.prompt.render_chat(sentence)
            if chat
            else spec.prompt.render_completion(sentence)
        )
        output = model.generate([prompt])[0]
        if identify_types:
            answers, typestrings = parse_answer_list(
                output,
                separator=spec.separator,
                true_only=spec.true_only,
                identify_types=True,
            )
        else:
            answers = parse_answer_list(
                output,
                separator=spec.separator,
                true_only=spec.true_only,
                identify_types=False,
            )
            typestrings = []
        if split_phrases:
            if identify_types:
                answers, typestrings = split_phrase_answers(
                    answers, typestrings
                )
            else:
                answers = split_phrase_answers(answers)
        if identify_types:
            answers, typestrings = clean_answers(
                answers, typestrings, compat=compat
            )
        else:
            answers = clean_answers(answers, compat=compat)
        return answers, typestrings, output

    return get_entities
