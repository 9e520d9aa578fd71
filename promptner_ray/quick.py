"""One-sentence interactive helpers — the reference's ``Quick`` class
(reference ``main.py:9-73``: ``Quick.example_span`` runs the full
prompt → model → parse → span-align loop on a single paragraph with
verbose prints; ``Quick.conll(i)`` etc. do the same for row *i* of a
loaded dataset and score it).

These are deliberately single-process: the interactive path is one
sentence, so spinning a Ray session would be pure overhead.  They call
the SAME kernels the distributed stages use (``stages.detect``'s
single-text path, the shared BIO/span kernels), so what you see here is
byte-for-byte what ``MentionDetector`` does per batch row.
"""

from __future__ import annotations

from .configs import make_task_spec
from .model import make_model
from .stages.detect import detect_mentions_in_text


def example_span(
    para: str,
    task: str = "conll",
    model_kind: str = "stub",
    exemplar: bool = True,
    coT: bool = True,
    tf: bool = True,
    chat: bool = False,
    verbose: bool = True,
    **model_kwargs,
) -> list[dict]:
    """Reference ``Quick.example_span`` (main.py:10-17): run the full
    detection loop on one paragraph and return the aligned mentions
    (surface, mtype, span_start, span_end dicts)."""
    spec = make_task_spec(task=task, exemplar=exemplar, coT=coT, tf=tf)
    if model_kind == "stub" and "vocab" not in model_kwargs:
        from .synth import TASK_VOCABS

        model_kwargs["vocab"] = TASK_VOCABS.get(task)
    model = make_model(model_kind, **model_kwargs)
    if verbose:
        print(f"Paragraph: {para}")
    mentions = detect_mentions_in_text(para, model, spec, chat=chat)
    if verbose:
        for m in mentions:
            print(
                f"  {m['surface']!r} -> {m['mtype']}"
                f" [{m['span_start']}:{m['span_end']}]"
            )
    return mentions


def dataset(
    i: int,
    path: str,
    task: str = "conll",
    model_kind: str = "stub",
    verbose: bool = True,
    **kwargs,
) -> dict:
    """Reference ``Quick.dataset``/``Quick.conll`` (main.py:19-72): run
    sentence *i* of an IOB2 file through detection and score it against
    the file's gold tags (sentence-level span F1).  Works on any IOB2
    file — the reference's dataset loaders are HF downloads this sandbox
    can't reach, so the file path is explicit."""
    import pathlib

    from .kernels.bio import bio_entities
    from .sources.iob2 import parse_iob2_text

    rows = parse_iob2_text(
        pathlib.Path(path).read_text(encoding="utf-8")
    )
    row = rows[i]
    para = " ".join(row["tokens"])
    mentions = example_span(
        para, task=task, model_kind=model_kind, verbose=verbose, **kwargs
    )
    gold = {(s, e, t) for t, s, e in bio_entities(row["bio"])}
    pred = {
        (m["span_start"], m["span_end"], m["mtype"]) for m in mentions
    }
    tp = len(gold & pred)
    p = tp / len(pred) if pred else 0.0
    r = tp / len(gold) if gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    if verbose:
        print(f"True spans: {sorted(gold)}")
        print(f"F1: {f1:.3f}")
    return {"mentions": mentions, "gold": sorted(gold), "f1": f1}
