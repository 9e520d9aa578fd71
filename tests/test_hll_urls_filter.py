"""Unit tests for the HLL distinct sketch, URL/domain ops, blocklist
filter, TF-IDF, and first-occurrence dedup (the oracle-parity suite pins
their SQL twins; these pin the semantics and the estimate accuracy)."""

from __future__ import annotations

import pyarrow as pa
import ray

from promptner_ray.functions.dedup import first_occurrence
from promptner_ray.functions.hll import (
    P,
    hll_estimate,
    hll_partial_batch,
    hll_registers,
)
from promptner_ray.functions.textstats import blocklist_batch
from promptner_ray.functions.urls import (
    extract_domains_batch,
    inject_synthetic_urls_batch,
)


def _docs_ds(texts: list[str]):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def test_hll_estimate_small_range() -> None:
    # 40 distinct tokens: well inside the linear-counting regime for
    # m=64 registers — the estimate must land within ±20%.
    toks = [f"tok{i}" for i in range(40)]
    regs = hll_partial_batch(
        pa.table({"text": pa.array([" ".join(toks)])}), column="text"
    )
    est = hll_estimate(regs)
    assert 32 <= est <= 48, est


def test_hll_estimate_large_cardinality() -> None:
    # 20k distinct tokens at p=6 (13% standard error): within 3 sigma.
    toks = [f"w{i}" for i in range(20_000)]
    regs = hll_partial_batch(
        pa.table({"text": pa.array([" ".join(toks)])}), column="text"
    )
    est = hll_estimate(regs)
    assert abs(est - 20_000) / 20_000 < 0.40, est


def test_hll_registers_merge_equals_single_pass(ray_session) -> None:
    # distributed merged registers == one-block computation
    texts = [f"a{i} b{i % 7} c" for i in range(50)]
    merged = (
        hll_registers(_docs_ds(texts))
        .to_pandas()
        .sort_values("register")
        .reset_index(drop=True)
    )
    single = (
        hll_partial_batch(
            pa.table({"text": pa.array([" ".join(texts)])}), column="text"
        )
        .to_pandas()
        .sort_values("register")
        .reset_index(drop=True)
    )
    assert merged.equals(single)
    assert (merged["max_rank"] >= 1).all()
    assert (merged["register"] < (1 << P)).all()


def test_blocklist_counts_occurrences() -> None:
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["slow slow dup", "fast clean", "spam"]),
        }
    )
    out = blocklist_batch(batch).to_pydict()
    assert out["n_blocked"] == [3, 0, 1]
    assert out["keep"] == [False, True, False]


def test_url_extraction_order_and_hosts() -> None:
    batch = pa.table(
        {"doc_id": pa.array([7], type=pa.int64()), "text": pa.array(["x"])}
    )
    inj = inject_synthetic_urls_batch(batch)
    out = extract_domains_batch(inj).to_pydict()
    assert out["domain"] == [
        "site7.example.com",
        "cdn2.assets.net",
        "www.portal1.org",
    ]
    assert out["url_idx"] == [0, 1, 2]


def test_first_occurrence_keeps_global_min(ray_session) -> None:
    t = pa.table(
        {
            "url": pa.array(["u2", "u1", "u1", "u3", "u2"]),
            "sent_id": pa.array([0, 5, 1, 0, 1], type=pa.int32()),
            "text": pa.array(["dup", "dup", "dup", "only", "other"]),
        }
    )
    out = (
        first_occurrence(ray.data.from_arrow(t), "text", ["url", "sent_id"])
        .to_pandas()
        .sort_values("text")
        .reset_index(drop=True)
    )
    # "dup" survives at its (url, sent_id)-smallest occurrence: (u1, 1)
    assert out["text"].tolist() == ["dup", "only", "other"]
    assert out["url"].tolist() == ["u1", "u3", "u2"]
    assert out["sent_id"].tolist() == [1, 0, 1]


def test_winnow_pairs_detects_duplicates(ray_session) -> None:
    from promptner_ray.functions.dedup import winnow_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base, base + " tail", "completely different words here ok",
             "another unrelated document text body"]
    out = winnow_pairs(_docs_ds(texts), min_shared=3).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs
    assert (2, 3) not in pairs


def test_winnow_pairs_max_df_drops_boilerplate(ray_session) -> None:
    from promptner_ray.functions.dedup import winnow_pairs

    # boilerplate suffix shared by ALL docs; only 0/1 share unique body
    boiler = " standard footer license text common to every page"
    texts = [
        "alpha beta gamma delta epsilon zeta" + boiler,
        "alpha beta gamma delta epsilon zeta" + boiler,
        "one two three four five six seven" + boiler,
        "eight nine ten eleven twelve thirteen" + boiler,
    ]
    # with the df cap at 2, boilerplate fingerprints (df=4) are dropped:
    # only the true dup pair survives even at a low threshold
    out = winnow_pairs(
        _docs_ds(texts), min_shared=2, max_df=2
    ).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(0, 1)}


def test_lm_score_orders_by_typicality(ray_session) -> None:
    from promptner_ray.functions.vectorize import lm_score

    # doc 0 repeats the corpus-dominant token; doc 2 is one rare token
    # ("typical" → bucket 5, "unusual" → bucket 0: no hash collision)
    texts = ["typical typical typical typical", "typical unusual", "unusual"]
    out = (
        lm_score(_docs_ds(texts))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "avg_logprob"] > out.loc[2, "avg_logprob"]
    assert out.loc[0, "n_tokens"] == 4


def test_domain_cap_limits_per_domain(ray_session) -> None:
    from promptner_ray.functions.urls import domain_cap

    # 12 docs; primary domain = site{doc_id % 37}.example.com → doc_ids
    # 0..11 give 12 distinct domains at k=1 each; force collisions by
    # using doc_ids 0 and 37 (same primary domain)
    import pyarrow as pa
    import ray as _ray

    t = pa.table(
        {
            "doc_id": pa.array([0, 37, 74, 5], type=pa.int64()),
            "text": pa.array(["a", "b", "c", "d"]),
        }
    )
    out = domain_cap(_ray.data.from_arrow(t), k=2).to_pandas()
    counts = out.groupby("domain").size()
    assert (counts <= 2).all()
    # site0.example.com has 3 candidates (0, 37, 74) → capped at 2
    assert counts["site0.example.com"] == 2


def test_outlink_resolution_rules() -> None:
    import pyarrow as pa

    from promptner_ray.functions.urls import outlink_rows_batch

    html = (
        b'<a href="https://other.example/x">abs</a>'
        b"<a class='l' href='/rooted'>root</a>"
        b'<a href="relative/skip">rel</a>'
        b'<a href="/">home</a><a href="/">home2</a>'
    )
    batch = pa.table(
        {
            "url": pa.array(["https://synth.test/part0/doc1"]),
            "html": pa.array([html], type=pa.binary()),
        }
    )
    out = outlink_rows_batch(batch).to_pydict()
    got = dict(zip(out["target_url"], out["n"]))
    # absolute passes through, root-relative joins the origin, the
    # dir-relative href is dropped, duplicate edges pre-combine in-block
    assert got == {
        "https://other.example/x": 1,
        "https://synth.test/rooted": 1,
        "https://synth.test/": 2,
    }
    assert set(out["src_url"]) == {"https://synth.test/part0/doc1"}


def test_latest_snapshot_keeps_newest(ray_session) -> None:
    import pyarrow as pa
    import ray as _ray

    from promptner_ray.functions.urls import latest_snapshot
    from promptner_ray.kernels.cleaning import surface_hash64

    urls = [f"https://synth.test/u{i}" for i in range(20)]
    base = 1_700_000_000_000_000
    pages = pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array(
                [base + i for i in range(20)], type=pa.timestamp("us")
            ),
        }
    )
    got = (
        latest_snapshot(_ray.data.from_arrow(pages))
        .to_pandas()
        .set_index("url")
    )
    assert len(got) == 20
    for i, u in enumerate(urls):
        reps = surface_hash64(u) % 3  # number of EXTRA snapshots
        assert got.loc[u, "snap_id"] == reps
        assert got.loc[u, "ts"] == base + i + reps * 3_600_000_000


def test_grouped_hll_estimate_accuracy(ray_session) -> None:
    import numpy as np
    import pyarrow as pa
    import ray as _ray

    from promptner_ray.functions.hll import (
        grouped_hll_estimates,
        grouped_hll_registers,
    )

    # key "a": 1000 distinct users; key "b": 50 distinct users (repeated)
    tbl = pa.table(
        {
            "event_type": pa.array(["a"] * 1000 + ["b"] * 500),
            "user_id": pa.array(
                list(range(1000)) + [10_000 + i % 50 for i in range(500)],
                type=pa.int64(),
            ),
        }
    )
    regs = (
        grouped_hll_registers(_ray.data.from_arrow(tbl), p=6)
        .to_pandas()
    )
    est = grouped_hll_estimates(
        pa.Table.from_pandas(regs), "event_type", p=6
    )
    # p=6 -> ~13% standard error; allow 3 sigma
    assert abs(est["a"] - 1000) / 1000 < 0.4
    assert abs(est["b"] - 50) / 50 < 0.4
    # mergeability: blocking must not change the registers at all
    re8 = (
        grouped_hll_registers(
            _ray.data.from_arrow(tbl).repartition(8), p=6
        )
        .to_pandas()
    )
    key = ["event_type", "register"]
    assert (
        regs.sort_values(key, ignore_index=True)
        .equals(re8.sort_values(key, ignore_index=True))
    )


def _tiny_pages():
    import pyarrow as pa
    import ray

    html = {
        "https://ex.test/a/1": (
            '<p><a href="/t/x">Alpha</a> <a href="/t/x">Beta</a> '
            '<a href="https://other.test/z"><b>Bold</b> label</a> '
            '<a href="rel/skip">dropped</a></p>'
        ),
        "https://ex.test/b/2": (
            '<a href="/t/x">Alpha</a> <a href="/t/y">Gamma</a>'
        ),
    }
    tbl = pa.table(
        {
            "url": pa.array(list(html)),
            "html": pa.array(
                [v.encode() for v in html.values()], type=pa.binary()
            ),
        }
    )
    return ray.data.from_arrow(tbl)


def test_anchor_texts_argmax_and_markup_strip(ray_session) -> None:
    from promptner_ray.functions.urls import anchor_texts

    rows = {
        r["target_url"]: r for r in anchor_texts(_tiny_pages()).take_all()
    }
    x = rows["https://ex.test/t/x"]
    # Alpha appears twice (once per page), Beta once -> argmax Alpha
    assert x["top_anchor"] == "Alpha" and x["top_n"] == 2
    assert x["n_links"] == 3 and x["n_texts"] == 2
    # inner markup stripped from the absolute-href anchor
    assert rows["https://other.test/z"]["top_anchor"] == "Bold label"
    # dir-relative hrefs dropped entirely
    assert not any("rel/skip" in t for t in rows)


def test_anchor_texts_tie_breaks_lexicographic(ray_session) -> None:
    import pyarrow as pa
    import ray

    from promptner_ray.functions.urls import anchor_texts

    tbl = pa.table(
        {
            "url": pa.array(["https://ex.test/p/1"]),
            "html": pa.array(
                [b'<a href="/t">zeta</a><a href="/t">alpha</a>'],
                type=pa.binary(),
            ),
        }
    )
    rows = anchor_texts(ray.data.from_arrow(tbl)).take_all()
    assert rows[0]["top_anchor"] == "alpha" and rows[0]["top_n"] == 1


def test_section_graph_contracts_counts(ray_session) -> None:
    from promptner_ray.functions.urls import section_graph

    got = {
        (r["src_section"], r["dst_section"]): r["n"]
        for r in section_graph(_tiny_pages()).take_all()
    }
    # page /a/1: three kept links -> t, t, z(other host, section z)
    # page /b/2: two links -> t, t
    assert got[("a", "t")] == 2
    assert got[("b", "t")] == 2
    assert got[("a", "z")] == 1
    assert sum(got.values()) == 5


def test_canonicalize_urls_rules() -> None:
    import pyarrow as pa

    from promptner_ray.functions.urls import canonicalize_urls_batch

    t = pa.table(
        {
            "url": pa.array(
                [
                    "HTTPS://SYNTH.TEST/a?utm_source=x&keep=1#frag",
                    "https://synth.test/b?utm_medium=y",
                    "https://synth.test/c?keep=1&fbclid=zz",
                    "https://synth.test/plain",
                ]
            )
        }
    )
    out = canonicalize_urls_batch(t).to_pydict()
    assert out["canonical_url"] == [
        "https://synth.test/a?keep=1",
        "https://synth.test/b",
        "https://synth.test/c?keep=1",
        "https://synth.test/plain",
    ]
    assert out["changed"] == [True, True, True, False]


def test_url_noise_injection_creates_canonical_dups(ray_session) -> None:
    import pyarrow as pa
    import ray

    from promptner_ray.functions.urls import canonical_urls, url_dedup

    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    [f"https://synth.test/p/doc{i:04d}" for i in range(60)]
                )
            }
        )
    )
    canon = canonical_urls(pages).to_pandas()
    # the h%3 pages emit a second noisy variant → more rows than pages
    assert len(canon) > 60
    # every injected variant canonicalizes back to its clean url
    assert set(canon["canonical_url"]) == {
        f"https://synth.test/p/doc{i:04d}" for i in range(60)
    }
    kept = url_dedup(pages).to_pandas()
    assert len(kept) == 60
    assert sorted(kept["canonical_url"]) == sorted(
        set(canon["canonical_url"])
    )
    # keep-first: the kept raw url is the smallest for its canonical
    m = canon.groupby("canonical_url")["url"].min()
    assert all(m[c] == u for u, c in zip(kept["url"], kept["canonical_url"]))


def test_ground_entities_argmax_and_collision_safety(ray_session) -> None:
    """Per normalized form the dictionary representative is the
    (n_total DESC, anchor ASC) argmax; unmatched surfaces drop (inner
    join); the normalize kernel folds case/punctuation variants."""
    import pyarrow as pa
    import ray

    from promptner_ray.functions.urls import ground_entities
    from promptner_ray.kernels.cleaning import (
        normalize_surface,
        surface_hash64,
    )

    def links_tbl(surfaces):
        norms = [normalize_surface(s) for s in surfaces]
        return pa.table(
            {
                "surface_norm": pa.array(norms),
                "surface_hash": pa.array(
                    [surface_hash64(n) for n in norms], type=pa.int64()
                ),
                "entity_id": pa.array(
                    [surface_hash64(n) for n in norms], type=pa.int64()
                ),
                "canonical": pa.array(surfaces),
                "etype": pa.array(["ORG"] * len(surfaces)),
                "n_mentions": pa.array(
                    [5] * len(surfaces), type=pa.int64()
                ),
            }
        )

    dict_tbl = pa.table(
        {
            # "Acme Corp." and "acme corp" normalize to the same form;
            # the higher-support anchor must win the representative pick
            "anchor": pa.array(
                ["Acme Corp.", "acme corp", "Unrelated Thing"]
            ),
            "top_target": pa.array(["https://a/1", "https://a/2", "https://u"]),
            "top_n": pa.array([9, 3, 1], type=pa.int64()),
            "n_total": pa.array([10, 4, 1], type=pa.int64()),
            "n_targets": pa.array([2, 1, 1], type=pa.int64()),
        }
    )
    out = (
        ground_entities(
            ray.data.from_arrow(links_tbl(["Acme Corp", "Globex"])),
            ray.data.from_arrow(dict_tbl),
        )
        .to_pandas()
        .sort_values("canonical", ignore_index=True)
    )
    # Globex has no dictionary entry -> dropped; Acme grounds to the
    # 10-support variant's target
    assert list(out["canonical"]) == ["Acme Corp"]
    assert out.loc[0, "grounded_url"] == "https://a/1"
    assert out.loc[0, "link_n"] == 10
    assert out.loc[0, "n_targets"] == 2
