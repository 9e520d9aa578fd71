"""Interactive one-liner helpers (reference ``main.py`` ``Quick`` parity).

The reference's ``Quick`` class (``main.py:9-73``) wraps two workflows for
console use: ``example_span`` (one paragraph → detected entity spans,
``main.py:10-17``) and ``dataset`` (the i-th sentence of a split → a
generated CoT annotation exemplar, ``main.py:19-33``).  The engine
versions take any IOB2 split file instead of the reference's hard-coded
HF loaders, and any ``model_kind`` from :func:`promptner_ray.model
.make_model` (the deterministic stub by default in-sandbox; point
``model_kind="openai"`` + ``model_kwargs`` at a served model for real
runs).  Pure library calls — no Ray session required or created.
"""

from __future__ import annotations

from .configs import make_task_spec
from .model import make_model


def example_span(
    para: str,
    task: str = "conll",
    model_kind: str = "stub",
    model_kwargs: dict | None = None,
    chat: bool = False,
    verbose: bool = True,
) -> list[dict]:
    """One paragraph → mention dicts (surface, mtype, span_start, span_end).

    Reference ``Quick.example_span`` (``main.py:10-17``): exemplar+CoT+TF
    prompt, span alignment, per-entity verification — the same fused path
    the distributed detector runs per batch.
    """
    from .stages.detect import detect_mentions_in_text

    spec = make_task_spec(task=task)
    kwargs = dict(model_kwargs or {})
    if model_kind == "stub" and "vocab" not in kwargs:
        from .synth import TASK_VOCABS

        kwargs["vocab"] = TASK_VOCABS.get(task)
    model = make_model(model_kind, **kwargs)
    mentions = detect_mentions_in_text(para, model, spec, chat=chat)
    if verbose:
        print(f"Paragraph: {para}")
        for m in mentions:
            print(
                f"  {m['surface']} ({m['mtype']}) "
                f"[{m['span_start']}:{m['span_end']}]"
            )
    return mentions


def dataset(
    i: int,
    iob2_path: str,
    task: str = "conll",
    model_kind: str = "stub",
    model_kwargs: dict | None = None,
    verbose: bool = True,
) -> str:
    """i-th sentence of an IOB2 split → generated CoT annotation exemplar.

    Reference ``Quick.dataset`` (``main.py:19-33``, which calls
    ``generate_annotations`` over the gold tags): renders the annotation
    prompt per token and asks the model for the explanations, returning
    the assembled exemplar block.
    """
    from .kernels.autogen import generate_exemplar
    from .sources.iob2 import parse_iob2_text

    rows = parse_iob2_text(
        open(iob2_path, encoding="utf-8").read()
    )
    row = rows[i]
    spec = make_task_spec(task=task)
    kwargs = dict(model_kwargs or {})
    if model_kind == "stub" and "vocab" not in kwargs:
        from .synth import TASK_VOCABS

        kwargs["vocab"] = TASK_VOCABS.get(task)
    model = make_model(model_kind, **kwargs)
    exemplar = generate_exemplar(
        model, spec.prompt.defn, row["text"], row["tokens"], row["bio"]
    )
    if verbose:
        print(f"Paragraph: {row['text']}")
        print(exemplar)
    return exemplar
