"""Parity of our exact-span P/R/F kernels and IOB2 writer against the
GENIA distribution's own scorer (`evalIOB2.pl`, reference
``data/Genia/evalIOB2.pl``) — the evaluation program the reference's
GENIA results are defined by.

The gold and answer files are produced by OUR writer
(``sources.iob2.write_iob2``) and scored by the UNMODIFIED perl script,
so the test pins both the writer's on-disk format and the span-counting
semantics ("FULLY CORRECT answer with class info" == exact-boundary,
type-matched spans — the seqeval convention ``kernels.bio.span_prf_counts``
implements and ``pipelines.eval.f1_counts`` distributes).
"""

from __future__ import annotations

import pathlib
import re
import subprocess

import pytest

from promptner_ray.kernels.bio import prf_from_counts, span_prf_counts
from promptner_ray.sources.iob2 import write_iob2

PERL_EVAL = pathlib.Path("/root/reference/data/Genia/evalIOB2.pl")

# deterministic fixture covering every disagreement mode the scorer
# distinguishes: exact match, boundary error (left/right), class error,
# missed entity, spurious entity, multi-entity sentences
SENTS = [
    (
        "High-dose growth hormone does not affect TNF alpha release".split(),
        ["O", "B-protein", "I-protein", "O", "O", "O",
         "B-protein", "I-protein", "O"],
        ["O", "B-protein", "I-protein", "O", "O", "O",
         "B-protein", "I-protein", "O"],
    ),
    (
        "IL-2 binds the IL-2R receptor complex today".split(),
        ["B-protein", "O", "O", "B-protein", "I-protein",
         "I-protein", "O"],
        ["B-protein", "O", "O", "B-protein", "I-protein", "O", "O"],
    ),
    (
        "NF-kB activation requires PKC zeta kinase".split(),
        ["B-protein", "O", "O", "B-protein", "I-protein", "I-protein"],
        ["B-DNA", "O", "O", "O", "B-protein", "I-protein"],
    ),
    (
        "the promoter region binds nothing here".split(),
        ["O", "B-DNA", "I-DNA", "O", "O", "O"],
        ["O", "B-DNA", "I-DNA", "O", "B-protein", "O"],
    ),
    (
        "monocytes express CD14 and CD16 antigens".split(),
        ["B-cell_type", "O", "B-protein", "O", "B-protein",
         "I-protein"],
        ["B-cell_type", "O", "B-protein", "O", "O", "O"],
    ),
]


def _micro(counts_rows):
    tp = sum(c[0] for c in counts_rows.values())
    n_pred = sum(c[1] for c in counts_rows.values())
    n_truth = sum(c[2] for c in counts_rows.values())
    return tp, n_pred, n_truth


@pytest.mark.skipif(
    not PERL_EVAL.exists(), reason="reference evalIOB2.pl not present"
)
def test_span_counts_match_evaliob2(tmp_path) -> None:
    gold_rows = [
        {"tokens": toks, "bio": gold} for toks, gold, _ in SENTS
    ]
    pred_rows = [
        {"tokens": toks, "bio": pred} for toks, _, pred in SENTS
    ]
    ref_file = tmp_path / "gold.iob2"
    ans_file = tmp_path / "pred.iob2"
    write_iob2(gold_rows, ref_file)
    write_iob2(pred_rows, ans_file)

    out = subprocess.run(
        ["perl", str(PERL_EVAL), str(ref_file), str(ans_file)],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    m = re.search(
        r"# of OBJECTs: (\d+),\s+ANSWERs: (\d+)\.", out
    )
    assert m, out
    perl_ref, perl_ans = int(m.group(1)), int(m.group(2))
    m = re.search(
        r"FULLY CORRECT answer with class info: (\d+) "
        r"\(([\d.]+) / ([\d.]+) / ([\d.]+)\)",
        out,
    )
    assert m, out
    perl_crt = int(m.group(1))
    perl_rec, perl_prec, perl_f1 = (
        float(m.group(2)), float(m.group(3)), float(m.group(4))
    )

    # our per-sentence partials, summed the way f1_counts distributes
    total: dict[str, list[int]] = {}
    for toks, gold, pred in SENTS:
        for ty, (tp, np_, nt) in span_prf_counts(gold, pred).items():
            acc = total.setdefault(ty, [0, 0, 0])
            acc[0] += tp
            acc[1] += np_
            acc[2] += nt
    counts = {ty: tuple(v) for ty, v in total.items()}
    tp, n_pred, n_truth = _micro(counts)

    assert (tp, n_pred, n_truth) == (perl_crt, perl_ans, perl_ref)
    assert round(tp / n_truth, 4) == perl_rec
    assert round(tp / n_pred, 4) == perl_prec
    prf = prf_from_counts(counts)
    assert round(prf["micro_f1"], 4) == perl_f1


@pytest.mark.skipif(
    not PERL_EVAL.exists(), reason="reference evalIOB2.pl not present"
)
def test_distributed_f1_matches_evaliob2_on_sample(
    ray_session, tmp_path
) -> None:
    """Same comparison through the DISTRIBUTED span-F1 path: the micro
    counts from :func:`pipelines.eval.f1_counts`' partial kernel must
    reproduce the perl scorer on the same sentences."""
    import pyarrow as pa

    from promptner_ray.pipelines.eval import _f1_partial_batch

    batch = pa.table(
        {
            "bio": pa.array(
                [" ".join(g) for _, g, _ in SENTS], type=pa.string()
            ),
            "pred_bio": pa.array(
                [" ".join(p) for _, _, p in SENTS], type=pa.string()
            ),
        }
    )
    partial = _f1_partial_batch(batch)
    tp = sum(partial.column("tp").to_pylist())
    n_pred = sum(partial.column("n_pred").to_pylist())
    n_truth = sum(partial.column("n_truth").to_pylist())

    ref_file = tmp_path / "gold.iob2"
    ans_file = tmp_path / "pred.iob2"
    write_iob2(
        [{"tokens": t, "bio": g} for t, g, _ in SENTS], ref_file
    )
    write_iob2(
        [{"tokens": t, "bio": p} for t, _, p in SENTS], ans_file
    )
    out = subprocess.run(
        ["perl", str(PERL_EVAL), str(ref_file), str(ans_file)],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    m = re.search(r"# of OBJECTs: (\d+),\s+ANSWERs: (\d+)\.", out)
    n = re.search(r"FULLY CORRECT answer with class info: (\d+)", out)
    assert m and n, out
    assert (tp, n_pred, n_truth) == (
        int(n.group(1)), int(m.group(2)), int(m.group(1))
    )
