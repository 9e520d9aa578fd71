"""Unit tests for the Gopher quality-rule filter (the corpus-wide value
check is the doc_gopher oracle-parity test)."""

from __future__ import annotations

import pyarrow as pa

from promptner_ray.functions.textstats import (
    GOPHER_MIN_WORDS,
    gopher_batch,
)


def _row(text: str) -> dict:
    out = gopher_batch(
        pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "text": pa.array([text])})
    )
    return {c: out.column(c)[0].as_py() for c in out.column_names}


def test_gopher_rules_fire_individually() -> None:
    good = "the quick brown fox jumps over lazy dogs " * 5  # 45 words
    r = _row(good.strip())
    assert r["r_words"] and r["r_mean"] and r["r_symbol"] and r["r_alpha"]
    assert r["r_stop"] and r["keep"]

    # too short
    assert not _row("the tiny doc")["r_words"]

    # symbol-heavy: one '#' per word
    sym = " ".join(["#the"] * GOPHER_MIN_WORDS)
    r = _row(sym)
    assert r["symbol_ratio"] == 1.0 and not r["r_symbol"] and not r["keep"]

    # ellipsis counted non-overlapping, 3 chars each
    assert _row("the a... b c")["symbol_ratio"] == 0.25  # 1 of 4 words

    # numeric tokens break the alpha fraction
    nums = " ".join(["12345"] * GOPHER_MIN_WORDS) + " the"
    r = _row(nums)
    assert not r["r_alpha"] and r["r_stop"]

    # long gibberish tokens break mean word length
    gib = " ".join(["x" * 40] * GOPHER_MIN_WORDS) + " the"
    assert not _row(gib)["r_mean"]


def test_gopher_empty_text_degenerates_safely() -> None:
    r = _row("")
    assert r["n_words"] == 1  # ''.split(' ') == [''] in both engines
    assert r["mean_word_len"] == 0.0
    assert not r["keep"]


def test_c4_line_rules() -> None:
    from promptner_ray.functions.textstats import c4_batch

    # doc 1: three good sentences, one short line, one unterminated,
    # one javascript line, page-level lorem/brace absent → keep
    good = "alpha beta gamma delta epsilon zeta."
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    "\n".join(
                        [
                            good,
                            good,
                            good,
                            "too short.",               # < 5 words
                            "alpha beta gamma delta epsilon",  # no punct
                            "alpha beta javascript delta epsilon.",
                        ]
                    ),
                    # doc 2: enough sentences but lorem ipsum → drop
                    "\n".join([good, good, good, "has lorem ipsum inside."]),
                ]
            ),
        }
    )
    out = c4_batch(t).to_pydict()
    assert out["n_lines"] == [6, 4]
    assert out["n_kept"] == [3, 3]
    assert out["has_lorem"] == [False, True]
    assert out["keep"] == [True, False]
    assert out["clean_text"][0] == "\n".join([good, good, good])


def test_c4_injection_deterministic_and_brace_rule() -> None:
    from promptner_ray.functions.textstats import (
        c4_batch,
        inject_c4_lines_batch,
    )

    words = " ".join(f"w{i}" for i in range(25))  # 3 lines: 10+10+5
    t = pa.table(
        {
            # 17 trips the brace injection; 13*5=65... use 17 and 15
            "doc_id": pa.array([17, 15], type=pa.int64()),
            "text": pa.array([words, words]),
        }
    )
    inj = inject_c4_lines_batch(t)
    txt = inj.column("text").to_pylist()
    # doc 17: lines r=17,18,19 → '.', r%3==0 (18) bare, '.', + brace line
    lines = txt[0].split("\n")
    assert lines[-1] == "config { done }."
    assert lines[0].endswith(".") and not lines[1].endswith(".")
    out = c4_batch(inj).to_pydict()
    assert out["has_brace"] == [True, False]
    assert not out["keep"][0]  # brace page dropped
    # determinism: re-running the injection is byte-identical
    assert inject_c4_lines_batch(t).column("text").to_pylist() == txt
