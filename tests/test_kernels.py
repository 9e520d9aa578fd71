"""Unit tests for the pure kernels (no Ray)."""

from __future__ import annotations

from promptner_ray.kernels.bio import (
    bio_entities,
    decode_bio,
    prf_from_counts,
    span_prf_counts,
)
from promptner_ray.kernels.cleaning import (
    clean_answers,
    normalize_surface,
    surface_hash64,
)
from promptner_ray.kernels.parsing import parse_answer_list, true_or_false
from promptner_ray.kernels.span import align_spans
from promptner_ray.kernels.textextract import extract_text


def test_clean_answers_intended_dedup_preserves_order():
    answers = ["london", "the", "london", "paris", ""]
    types = ["t1", "t2", "t3", "t4", "t5"]
    got_a, got_t = clean_answers(answers, types, compat=False)
    assert got_a == ["london", "paris"]
    assert got_t == ["t1", "t4"]


def test_clean_answers_compat_keeps_duplicates():
    # Reference bug: dedup branch output is discarded (algorithms.py:44-63).
    answers = ["london", "london (LOC)"]
    types = ["t1", "t2"]
    got_a, got_t = clean_answers(answers, types, compat=True)
    assert got_a == ["london", "london"]
    assert got_t == ["t1", "t2"]


def test_normalize_surface_matches_reference_is_eq():
    assert normalize_surface("  London! ") == "london"
    assert normalize_surface("U.S.") == "u.s"  # strip() of punct from ends
    assert surface_hash64("london") == surface_hash64("london")
    assert surface_hash64("london") != surface_hash64("paris")


def test_true_or_false():
    assert true_or_false("Yes. definitely") is True
    assert true_or_false("no. not really") is False
    assert true_or_false("maybe", default=True) is True
    assert true_or_false("yes and no ", default=False) is False


def test_parse_answer_list_verification_filter():
    out = "1. london | True | a city (LOC)\n2. ran | False | a verb\n3. paris | True | capital (LOC)"
    answers, types = parse_answer_list(out)
    assert answers == ["london", "paris"]
    assert types == ["a city (LOC)", "capital (LOC)"]


def test_align_spans_engine_mode_skips_unresolvable():
    # "a b" occurs twice.  Claim 1 seeks occurrence 1 but 2 exist -> the
    # reference's find_nth_list_subset returns -1 (utils.py:33-34); engine
    # mode SKIPS instead of writing span[-1].  Claim 2 seeks occurrence 2 ->
    # resolves to index 3.  Claim 3 seeks occurrence 3 -> IndexError in the
    # reference; engine mode skips.
    answers = ["a b", "a b", "a b"]
    types = ["x (T)", "x (T)", "x (T)"]
    tags = align_spans(answers, types, para="a b c a b", bug_compat=False)
    assert tags == ["O", "O", "O", "B-T", "I-T"]
    # compat mode: claim 3 (occurrence 3 of 2) raises IndexError — the
    # reference drops the whole row there (run.py:43-44).
    import pytest

    with pytest.raises(IndexError):
        align_spans(answers, types, para="a b c a b", bug_compat=True)


def test_align_spans_typestring_shortfall_engine_mode():
    tags = align_spans(["london"], [], para="london calling", bug_compat=False)
    assert tags == ["O", "O"]


def test_decode_bio_classic_and_fewnerd():
    toks = ["New", "York", "is", "big"]
    ents, pairs = decode_bio(toks, ["B-LOC", "I-LOC", "O", "O"])
    assert ents == ["New York"] and pairs == [("New York", "LOC")]
    # FewNERD bare tags: adjacent same-type fold (reference data.py:78)
    ents2, pairs2 = decode_bio(
        toks, ["location-gpe", "location-gpe", "O", "O"]
    )
    assert ents2 == ["New York"] and pairs2 == [("New York", "location-gpe")]


def test_span_prf_roundtrip():
    truth = ["B-LOC", "I-LOC", "O", "B-PER"]
    pred = ["B-LOC", "I-LOC", "O", "O"]
    counts = span_prf_counts(truth, pred)
    assert counts["LOC"] == (1, 1, 1)
    assert counts["PER"] == (0, 0, 1)
    m = prf_from_counts(counts)
    assert m["micro_precision"] == 1.0 and m["micro_recall"] == 0.5


def test_bio_entities_dangling_i():
    assert bio_entities(["I-PER", "I-PER", "O"]) == [("PER", 0, 2)]


def test_extract_text_contract():
    html = (
        b"<html><head><script>x='<p>no</p>';</script></head><body>"
        b"<nav>skip</nav><article><p>Hello <b>World</b> &amp; co</p>"
        b"<p>line two</p></article><footer>f</footer></body></html>"
    )
    assert extract_text(html) == "Hello World & co\nline two"
    assert extract_text(b"<html><body>no article</body></html>") == ""


def test_split_phrase_answers():
    from promptner_ray.kernels.cleaning import split_phrase_answers

    a, t = split_phrase_answers(
        ["andy caddick", "essex"], ["a person (PER)", "a team (ORG)"]
    )
    assert a == ["andy", "caddick", "essex"]
    assert t == ["a person (PER)", "a person (PER)", "a team (ORG)"]
    assert split_phrase_answers(["new york", "paris"]) == ["new", "york", "paris"]


def test_get_ner_system_closure():
    from promptner_ray.api import get_ner_system

    fn = get_ner_system(task="conll")
    entities, typestrings, meta = fn("Andy Caddick joined Essex .")
    assert "andy caddick" in entities and "essex" in entities
    assert any("(PER)" in t for t in typestrings)
    assert meta.startswith("Answer:")

    fn_split = get_ner_system(task="conll", split_phrases=True)
    entities, _, _ = fn_split("Andy Caddick joined Essex .")
    assert "andy" in entities and "caddick" in entities


def test_lazy_prompt_matches_strict_render():
    from promptner_ray.configs import make_task_spec

    for exemplar in (True, False):
        spec = make_task_spec(task="conll", exemplar=exemplar)
        for para in ("Essex won .", "a 'quoted' para"):
            lazy = spec.prompt.render_completion_lazy(para)
            assert lazy.text == spec.prompt.render_completion(para)
            assert lazy.para == para
