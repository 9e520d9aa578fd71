"""Property-based tests (hypothesis) for the pure kernels.

The conformance replay pins byte-exact behavior on real data; these pin
TOTALITY and invariants on adversarial inputs: engine-mode kernels must
never raise, normalizers must be idempotent, and blocking schemes must
never lose a true pair.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from promptner_ray.kernels.bio import bio_entities, decode_bio, span_prf_counts
from promptner_ray.kernels.cleaning import (
    _PUNCT,
    clean_answers,
    normalize_surface,
    split_phrase_answers,
)
from promptner_ray.kernels.parsing import parse_answer_list
from promptner_ray.kernels.span import align_spans
from promptner_ray.kernels.textextract import extract_text
from promptner_ray.synth import render_html

_word = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=8
)
_sentence = st.lists(_word, min_size=1, max_size=12).map(" ".join)
_tag = st.sampled_from(["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "loc-gpe"])


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_parse_answer_list_total(output: str) -> None:
    """Engine-mode parser accepts arbitrary model output without raising."""
    answers, typestrings = parse_answer_list(
        output, separator="|", true_only=True, identify_types=True
    )
    # separator-less items contribute an entity but no typestring — the
    # documented reference quirk — so typestrings can only be shorter
    assert len(typestrings) <= len(answers)


@given(
    _sentence,
    st.lists(st.tuples(_word, st.sampled_from(["(PER)", "(ORG)", "no type"])),
             max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_align_spans_total_and_well_formed(para, pairs) -> None:
    """Engine-mode aligner never raises and always emits len(tokens) tags."""
    answers = [a for a, _ in pairs]
    typestrings = [f"because {t}" for _, t in pairs]
    tags = align_spans(answers, typestrings, para=para, bug_compat=False)
    assert len(tags) == len(para.split(" "))
    # every non-O tag must decode to valid spans
    for etype, start, end in bio_entities(tags):
        assert 0 <= start < end <= len(tags) and etype


@given(st.lists(_tag, max_size=20), st.lists(_tag, max_size=20))
@settings(max_examples=200, deadline=None)
def test_span_prf_counts_bounds(truth, pred) -> None:
    n = min(len(truth), len(pred))
    counts = span_prf_counts(truth[:n], pred[:n])
    for tp, n_pred, n_truth in counts.values():
        assert 0 <= tp <= min(n_pred, n_truth)


@given(st.lists(_word, min_size=1, max_size=15), st.lists(_tag, min_size=1, max_size=15))
@settings(max_examples=200, deadline=None)
def test_decode_bio_entities_are_substrings(tokens, tags) -> None:
    n = min(len(tokens), len(tags))
    entities, pairs = decode_bio(tokens[:n], tags[:n])
    text = " ".join(tokens[:n])
    for ent in entities:
        assert ent in text
    assert len(entities) == len(pairs)


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_normalize_surface_invariants(s: str) -> None:
    """The reference's ``is_eq`` key (lower → strip → strip punct → strip)
    is deliberately a SINGLE fixed pass, not a fixpoint: alternating
    whitespace/punct layers ("0:\\r:") keep peeling under re-application,
    exactly as in the reference (eval.py:20-21).  The invariants the
    engine relies on: lowercase output, no surrounding whitespace, and
    determinism (equal inputs → equal keys)."""
    once = normalize_surface(s)
    assert once == once.strip()
    assert once == once.lower()
    assert normalize_surface(s) == once  # deterministic/pure
    # and for surfaces the pipeline actually produces (space-joined word
    # tokens), one pass IS stable
    if once and once.strip(_PUNCT) == once:
        assert normalize_surface(once) == once


@given(st.lists(st.text(min_size=1, max_size=20), max_size=10))
@settings(max_examples=200, deadline=None)
def test_clean_answers_subset_and_order(answers) -> None:
    cleaned = clean_answers(list(answers), compat=False)
    # every cleaned answer derives from some input answer (prefix before '(')
    assert len(cleaned) <= len(answers)


@given(st.lists(st.text(alphabet=" ab", min_size=1, max_size=12), max_size=8))
@settings(max_examples=200, deadline=None)
def test_split_phrases_word_conservation(answers) -> None:
    out = split_phrase_answers(list(answers))
    assert sum(len(a.split(" ")) for a in answers) == len(out)


@given(st.lists(_sentence, min_size=1, max_size=6), st.integers(0, 2**32 - 1))
@settings(max_examples=100, deadline=None)
def test_render_extract_roundtrip(lines, seed) -> None:
    """extract_text inverts render_html for ANY sentence content."""
    import random

    text = "\n".join(lines)
    html = render_html(text, "https://synth.test/p/x", random.Random(seed))
    assert extract_text(html) == text


@given(st.lists(st.integers(0, 2**64 - 1), min_size=2, max_size=2))
@settings(max_examples=300, deadline=None)
def test_simhash_pigeonhole(hashes) -> None:
    """Any pair within Hamming ≤3 of 64 bits shares one of the four 16-bit
    chunks — the blocking scheme can never drop a true near-dup pair."""
    a, b = hashes
    hamming = bin(a ^ b).count("1")
    shares = any(
        ((a >> (16 * c)) & 0xFFFF) == ((b >> (16 * c)) & 0xFFFF)
        for c in range(4)
    )
    if hamming <= 3:
        assert shares


# --- vectorized-vs-scalar twin properties (the vectorized batch kernels
# must equal their per-row reference implementations on ANY input) ------

_tok = st.text(
    alphabet=st.characters(
        blacklist_characters=" \n", blacklist_categories=("Cs",)
    ),
    max_size=6,
)
_sent_text = st.lists(_tok, min_size=0, max_size=12).map(" ".join)


@given(st.lists(_sent_text, min_size=1, max_size=8))
@settings(max_examples=150, deadline=None)
def test_shingles_vectorized_equals_scalar(texts) -> None:
    import pyarrow as pa

    from promptner_ray.functions.dedup import _doc_shingles_vec, shingle_set

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ids, grams = _doc_shingles_vec(batch)
    got: dict[int, set] = {}
    for d, g in zip(ids.tolist(), grams.to_pylist()):
        got.setdefault(d, set()).add(g)
    want = {i: shingle_set(t) for i, t in enumerate(texts)}
    assert got == want


@given(st.lists(_sent_text, min_size=1, max_size=8))
@settings(max_examples=150, deadline=None)
def test_simhash_vectorized_equals_scalar(texts) -> None:
    import pyarrow as pa

    from promptner_ray.functions.dedup import simhash64, simhash_batch

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = simhash_batch(batch).column("simhash").to_pylist()
    assert got == [f"{simhash64(t):016x}" for t in texts]


@given(
    st.lists(
        st.tuples(
            st.lists(_tok, min_size=1, max_size=10),  # sentence tokens
            st.lists(  # mention (start, length) seeds
                st.tuples(st.integers(0, 9), st.integers(1, 3)),
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=150, deadline=None)
def test_induce_vectorized_equals_scalar(rows) -> None:
    import pyarrow as pa

    from promptner_ray.stages.induce import (
        induce_triples_batch,
        induce_triples_for_sentence,
    )

    urls, sids, texts, mlists = [], [], [], []
    for i, (toks, seeds) in enumerate(rows):
        ms = []
        for s, ln in seeds:
            start = s % len(toks)
            end = min(start + ln, len(toks))
            ms.append(
                {
                    "surface": " ".join(toks[start:end]),
                    "mtype": "T",
                    "span_start": start,
                    "span_end": end,
                }
            )
        urls.append(f"u{i % 2}")
        sids.append(i)
        texts.append(" ".join(toks))
        mlists.append(ms)
    batch = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "sent_id": pa.array(sids, type=pa.int32()),
            "text": pa.array(texts, type=pa.string()),
            "mentions": pa.array(
                mlists,
                type=pa.list_(
                    pa.struct(
                        [
                            ("surface", pa.string()),
                            ("mtype", pa.string()),
                            ("span_start", pa.int32()),
                            ("span_end", pa.int32()),
                        ]
                    )
                ),
            ),
        }
    )
    out = induce_triples_batch(batch)
    got = list(
        zip(
            *[
                out.column(c).to_pylist()
                for c in [
                    "url",
                    "sent_id",
                    "subj",
                    "pred",
                    "obj",
                    "subj_type",
                    "obj_type",
                ]
            ]
        )
    )
    want = []
    for u, sid, text, ms in zip(urls, sids, texts, mlists):
        for t in induce_triples_for_sentence(text.split(" "), ms):
            want.append((u, sid) + t)
    assert got == want


@given(st.lists(st.text(max_size=40), min_size=1, max_size=6))
@settings(max_examples=150, deadline=None)
def test_winnow_vectorized_equals_scalar(texts) -> None:
    import pyarrow as pa

    from promptner_ray.functions.textstats import (
        _winnow_fps_vec,
        winnow_fingerprints,
    )

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ids, fps = _winnow_fps_vec(batch)
    got: dict[int, set] = {}
    for d, f in zip(ids.tolist(), fps.tolist()):
        got.setdefault(d, set()).add(int(f))
    want = {
        i: set(winnow_fingerprints(t)) for i, t in enumerate(texts)
    }
    assert got == want


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_dup_span_kernels_match_bruteforce(token_docs) -> None:
    """The dup-span kernel composition (positional postings → global
    count → marked positions → gaps-and-islands merge) equals a direct
    brute-force computation on a tiny vocabulary (where collisions
    between docs are common).  The distributed glue around these
    kernels is covered by the DuckDB oracle parity suite."""
    import collections

    import pyarrow as pa

    from promptner_ray.functions.dedup import (
        _span_islands,
        ngram_pos_rows_batch,
    )

    n = 3
    texts = [" ".join(toks) for toks in token_docs]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    posts = ngram_pos_rows_batch(batch, n=n)
    counts = collections.Counter(posts.column("h").to_pylist())
    marked = posts.filter(
        pa.array(
            [counts[h] >= 2 for h in posts.column("h").to_pylist()],
            type=pa.bool_(),
        )
    )
    got = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in _span_islands(n)(
            marked.select(["doc_id", "pos"])
        ).to_pylist()
    }

    # brute force: every n-gram occurrence, duplicated iff its exact
    # token tuple occurs >= 2 times anywhere (note: text round-trips
    # through a single-space join, so split(" ") re-yields the tokens)
    occs = collections.Counter()
    per_doc: dict[int, list[int]] = {}
    for d, toks in enumerate(token_docs):
        toks = " ".join(toks).split(" ")  # the kernel's view of the doc
        for p in range(len(toks) - n + 1):
            occs[tuple(toks[p : p + n])] += 1
    for d, toks in enumerate(token_docs):
        toks = " ".join(toks).split(" ")
        per_doc[d] = [
            p
            for p in range(len(toks) - n + 1)
            if occs[tuple(toks[p : p + n])] >= 2
        ]
    want = set()
    for d, ps in per_doc.items():
        start = prev = None
        for p in ps:
            if start is None:
                start = prev = p
            elif p - prev > n:
                want.add((d, start, prev + n))
                start = prev = p
            else:
                prev = p
        if start is not None:
            want.add((d, start, prev + n))
    assert got == want
