"""Parser + span-aligner conformance: replay the reference's shipped results.

``tests/fixtures/*.csv`` are the reference repo's ``results/*.csv`` (public
research artifacts, DhananjayAshok/PromptNER): 882 rows across 9 datasets,
where ``meta`` is the raw gpt-3.5-turbo output and ``pred`` the BIO tags the
reference parser+aligner produced from it (reference ``run.py:13,31-37``).
Feeding ``meta`` through our reimplementation in bug-compat mode must
reproduce ``pred`` exactly — the LLM is factored out, so this pins the full
string-semantics surface (M5, M6, M10, M11 in SURVEY.md §2).
"""

from __future__ import annotations

import ast
import pathlib

import pandas as pd
import pytest

from promptner_ray.kernels.parsing import parse_answer_list
from promptner_ray.kernels.span import align_spans

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
CSVS = sorted(FIXTURES.glob("*.csv"))


def replay_row(text: str, meta: str) -> list[str] | None:
    """Run meta through parser + aligner as the reference eval loop does.

    Returns None when the reference would have dropped the row (IndexError,
    reference ``run.py:43-44``) — such rows never appear in the CSVs.
    """
    answers, typestrings = parse_answer_list(meta, identify_types=True)
    try:
        return align_spans(answers, typestrings, para=text, bug_compat=True)
    except IndexError:
        return None


@pytest.mark.parametrize("csv_path", CSVS, ids=[p.stem for p in CSVS])
def test_replay_reference_results(csv_path: pathlib.Path) -> None:
    df = pd.read_csv(csv_path)
    mismatches = []
    for i, row in df.iterrows():
        expected = ast.literal_eval(row["pred"])
        got = replay_row(row["text"], row["meta"])
        if got != expected:
            mismatches.append((i, row["text"][:60], got, expected))
    assert not mismatches, (
        f"{len(mismatches)}/{len(df)} rows mismatch in {csv_path.name}; "
        f"first: {mismatches[0]}"
    )
