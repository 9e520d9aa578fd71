"""Quick interactive helpers (reference main.py parity)."""

from __future__ import annotations


def test_example_span_detects_vocab_entities(capsys):
    from promptner_ray import quick

    ms = quick.example_span("John Smith visited Paris on Tuesday")
    got = {(m["surface"], m["mtype"]) for m in ms}
    assert ("John Smith", "PER") in got and ("Paris", "LOC") in got
    out = capsys.readouterr().out
    assert "Paragraph:" in out and "John Smith (PER)" in out


def test_dataset_generates_parseable_exemplar(tmp_path):
    from promptner_ray import quick
    from promptner_ray.configs import make_task_spec
    from promptner_ray.kernels.parsing import parse_answer_list

    p = tmp_path / "train.txt"
    p.write_text(
        "John\tB-PER\nSmith\tI-PER\nvisited\tO\nParis\tB-LOC\n\n"
    )
    ex = quick.dataset(0, str(p), verbose=False)
    spec = make_task_spec(task="conll")
    answers, typestrings = parse_answer_list(
        ex,
        separator=spec.separator,
        true_only=True,
        identify_types=True,
    )
    # the annotation templater is TOKEN-level (reference
    # generate_annotations iterates tokens, algorithms.py:227-241), and
    # the stub's explanations answer in lowercase
    assert {"john", "smith", "paris"} <= set(answers)
