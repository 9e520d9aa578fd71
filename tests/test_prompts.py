"""Prompt assembly vs golden fixtures rendered from the reference.

``tests/fixtures/golden_prompts.json`` holds completion prompts and chat
message lists for ConllConfig/GeniaConfig across the full
``set_config(exemplar x coT x tf x defn)`` flag grid (reference
``algorithms.py:453-541``), frozen at fixture-authoring time.  Assembly must
reproduce them byte-for-byte.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from promptner_ray.configs import make_task_spec

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
GOLDEN = json.loads((FIXTURES / "golden_prompts.json").read_text())


@pytest.mark.parametrize(
    "case",
    GOLDEN,
    ids=[
        f"{g['task']}-ex{int(g['exemplar'])}-cot{int(g['coT'])}-tf{int(g['tf'])}-d{int(g['defn'])}"
        for g in GOLDEN
    ],
)
def test_prompt_matches_reference(case: dict) -> None:
    spec = make_task_spec(
        task=case["task"],
        exemplar=case["exemplar"],
        coT=case["coT"],
        tf=case["tf"],
        use_defn=case["defn"],
    ).prompt
    assert spec.render_completion(case["para"]) == case["completion"]
    if case["chat"] is not None:
        got = [[c, r] for c, r in spec.render_chat(case["para"])]
        assert got == case["chat"]
