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
