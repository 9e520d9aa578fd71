"""Deletion-neighborhood alias blocking: completeness for every edit
kind at distance 1, rejection at distance 2, and injection determinism
(the sf-level pair set is pinned by the DuckDB levenshtein oracle in
test_oracle_parity)."""

from __future__ import annotations

import pyarrow as pa
import ray

from promptner_ray.functions.editsim import (
    alias_pairs,
    lev_le1,
    typo_variant,
    with_typo_variants,
)


def _surface_ds(surfaces):
    return ray.data.from_arrow(
        pa.table({"surface": pa.array(surfaces, type=pa.string())})
    )


def _pairs(surfaces):
    out = alias_pairs(_surface_ds(surfaces)).take_all()
    return {frozenset((r["surface_a"], r["surface_b"])) for r in out}


def test_alias_pairs_cover_every_edit_kind(ray_session) -> None:
    got = _pairs(
        [
            "acme corp",   # substitution partner below
            "acme korp",
            "globex",      # deletion partner below
            "globe",
            "initech",     # insertion partner below
            "initechh",
            "umbrella",    # no partner
            "ab",          # transposition of "ba" is distance 2: no pair
            "ba",
        ]
    )
    assert got == {
        frozenset(("acme corp", "acme korp")),
        frozenset(("globex", "globe")),
        frozenset(("initech", "initechh")),
    }


def test_alias_pairs_order_and_ids(ray_session) -> None:
    from promptner_ray.kernels.cleaning import surface_hash64

    rows = alias_pairs(_surface_ds(["globe", "globex"])).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["entity_a"] < r["entity_b"]
    assert r["entity_a"] == surface_hash64(r["surface_a"])
    assert r["entity_b"] == surface_hash64(r["surface_b"])


def test_lev_le1_exactness() -> None:
    assert lev_le1("abc", "abc")
    assert lev_le1("abc", "abd")      # substitution
    assert lev_le1("abc", "ab")       # deletion
    assert lev_le1("abc", "xabc")     # insertion
    assert not lev_le1("ab", "ba")    # transposition = 2 edits
    assert not lev_le1("abc", "a")    # length gap 2
    assert not lev_le1("abcd", "abdc")


def test_typo_variant_deterministic_and_partial() -> None:
    surfaces = [
        "kenji tanaka", "acme corp", "tokyo", "buenos aires",
        "amsterdam", "new york city", "umbrella group", "pied piper",
    ]
    variants = {s: typo_variant(s) for s in surfaces}
    # pure function: identical on recompute
    assert variants == {s: typo_variant(s) for s in surfaces}
    planted = {s: v for s, v in variants.items() if v is not None}
    # hash-selection plants some but not all
    assert 0 < len(planted) < len(surfaces)
    for s, v in planted.items():
        assert len(v) == len(s) - 1 and lev_le1(s, v)
    assert typo_variant("abc") is None  # below TYPO_MIN_LEN


def test_with_typo_variants_appends(ray_session) -> None:
    surfaces = ["kenji tanaka", "acme corp", "tokyo", "umbrella group"]
    out = with_typo_variants(_surface_ds(surfaces)).take_all()
    got = [r["surface"] for r in out]
    want = []
    for s in surfaces:
        want.append(s)
        v = typo_variant(s)
        if v is not None:
            want.append(v)
    assert got == want
