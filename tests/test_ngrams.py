"""Unit tests for corpus n-gram counts and exact top-k (functions/ngrams.py)."""

from __future__ import annotations

import pyarrow as pa
import ray

from promptner_ray.functions.ngrams import ngram_counts, top_ngrams


def _docs_ds(texts: list[str]):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def test_ngram_counts_occurrences(ray_session):
    # "a b a b a" has windows: "a b a", "b a b", "a b a" -> counts 2,1
    out = ngram_counts(_docs_ds(["a b a b a", "x y"])).to_pandas()
    got = dict(zip(out["gram"], out["n"]))
    assert got == {"a b a": 2, "b a b": 1}


def test_top_ngrams_exact_with_tiebreak(ray_session):
    # force ties at the cut: four grams with count 1 after the top-2;
    # the total order (n DESC, gram ASC) must pick them deterministically
    texts = [
        "p q r",
        "p q r",
        "p q r",  # "p q r" x3
        "a b c",
        "a b c",  # "a b c" x2
        "d e f",
        "b c d",
        "c d e",
        "z z z",  # four singletons
    ]
    # split across many single-doc blocks so the candidate cut runs per batch
    ds = _docs_ds(texts).repartition(4)
    out = top_ngrams(ds, k=4).to_pandas()
    assert list(out["gram"]) == ["p q r", "a b c", "b c d", "c d e"]
    assert list(out["n"]) == [3, 2, 1, 1]


def test_bpe_pair_batch_counts_and_eow() -> None:
    import pyarrow as pa

    from promptner_ray.functions.ngrams import _bpe_pair_batch

    vocab = pa.table(
        {
            "gram": pa.array(["abab", "b", ""]),
            "n": pa.array([3, 5, 7], type=pa.int64()),
        }
    )
    out = _bpe_pair_batch(vocab)
    d = {
        (a, b): n
        for a, b, n in zip(
            out.column("sym_a").to_pylist(),
            out.column("sym_b").to_pylist(),
            out.column("n").to_pylist(),
        )
    }
    # 'abab' ×3: (a,b)×2, (b,a)×1, (b,</w>)×1 ; 'b' ×5: (b,</w>)×1
    assert d[("a", "b")] == 6
    assert d[("b", "a")] == 3
    assert d[("b", "</w>")] == 3 + 5
    # empty word contributes nothing
    assert sum(d.values()) == 6 + 3 + 8


def test_cooc_pair_batch_windows_and_boundaries() -> None:
    import pyarrow as pa

    from promptner_ray.functions.ngrams import _cooc_pair_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            # doc1: a b c  → d=1: (a,b),(b,c); d=2: (a,c)
            # doc2: c a    → d=1: (a,c) canonicalized
            "text": pa.array(["a b c", "c a"]),
        }
    )
    out = _cooc_pair_batch(t, window=2)
    d = {
        (a, b): n
        for a, b, n in zip(
            out.column("word_a").to_pylist(),
            out.column("word_b").to_pylist(),
            out.column("c").to_pylist(),
        )
    }
    # no pair may cross the doc boundary (c·c would appear otherwise)
    assert d == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 2}


def _reference_bpe(word_counts: dict, n_merges: int):
    """Single-process Sennrich reference: argmax pair (count desc, pair
    asc), apply, repeat."""
    from promptner_ray.functions.ngrams import BPE_EOW

    vocab = {
        tuple(list(w) + [BPE_EOW]): n for w, n in word_counts.items()
    }
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append((a, b, n))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def test_bpe_merges_match_reference(ray_session) -> None:
    import collections

    import pyarrow as pa
    import ray

    from promptner_ray.functions.ngrams import bpe_merges

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest widest",
        "widest widest low lower",
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(3)
    got = bpe_merges(docs, n_merges=6).to_pandas()
    wc = collections.Counter(
        w for t in texts for w in t.split(" ")
    )
    want = _reference_bpe(dict(wc), 6)
    assert [
        (a, b, n)
        for a, b, n in zip(got["sym_a"], got["sym_b"], got["n"])
    ] == want
    assert list(got["step"]) == list(range(len(want)))


def test_bpe_encode_hand_computed(ray_session) -> None:
    """Token counts under a given merge list, against hand-derived
    symbol sequences (merge order applies left-to-right per word)."""
    import pyarrow as pa
    import ray

    from promptner_ray.functions.ngrams import bpe_encode

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            # doc1: "low low" — 'lo' then 'low' merges collapse each
            # word to [low, </w>] = 2 tokens → 4
            # doc2: "lot  x" (double space → empty word skipped):
            # lot → [lo, t, </w>] = 3; x → [x, </w>] = 2 → 5
            "text": pa.array(["low low", "lot  x"]),
        }
    )
    merges = [("l", "o"), ("lo", "w")]
    got = (
        bpe_encode(ray.data.from_arrow(docs), merges)
        .to_pandas()
        .set_index("doc_id")["n_tokens_bpe"]
        .sort_index()
    )
    assert list(got) == [4, 5]


def test_bpe_train_encode_matches_single_process(ray_session) -> None:
    """End-to-end train+encode equals a single-process replay of the
    same rules over the same corpus."""
    import pyarrow as pa
    import ray

    from promptner_ray.functions.ngrams import (
        _word_symbols,
        bpe_merges,
        bpe_train_encode,
    )

    texts = [
        "the newest lower tower",
        "lower the tower newest newest",
        "new lowest low tower the the",
    ]
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = ray.data.from_arrow(docs)
    rules = [
        (r["sym_a"], r["sym_b"])
        for r in sorted(
            bpe_merges(ds, n_merges=4).take_all(), key=lambda r: r["step"]
        )
    ]
    want = {
        i: sum(
            len(_word_symbols(w, rules)) for w in t.split(" ") if w
        )
        for i, t in enumerate(texts)
    }
    got = (
        bpe_train_encode(ds, n_merges=4)
        .to_pandas()
        .set_index("doc_id")["n_tokens_bpe"]
        .to_dict()
    )
    assert got == want
