"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline primitives, each a vectorized
``map_batches`` kernel over ``batch_format="pyarrow"`` blocks:

- token counting (single-space split, mirroring the reference's universal
  ``text.split(" ")`` convention, reference algorithms.py:77, run.py:82)
- document fingerprinting (md5 content hash + winnowing rolling-hash
  k-gram fingerprints, Schleimer et al. 2003 style)
- quality scoring (length / punctuation-ratio / stopword-ratio gates)
- language ID (marker-token n-gram heuristic with deterministic tie-break)
- token explode (flat-map demo kernel)

Every kernel is a pure function of its batch, so results are identical at
any parallelism level.  The hot paths use ``pyarrow.compute`` and
``numpy.add.reduceat`` over list offsets — no Python loop over rows except
where hashing forces one (md5 per row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ASCII punctuation, exactly Python's string.punctuation as a regex class.
PUNCT_RE = r"[!-/:-@\[-`{-~]"

# Fixed stopword list — mirrored literally in the SQL oracle
# (__ray_entry__.oracle_sql); NOT nltk (reference loads nltk stopwords per
# call, algorithms.py:41 — the engine uses a frozen deterministic set).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "it")

# Marker-token profiles for the n-gram language-ID heuristic.  Priority
# order breaks ties deterministically; a zero best score → "und".
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow", "big", "small"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "fr": ("le", "et", "est", "petit", "grand"),
    "es": ("el", "los", "es", "una", "por"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")


def _split_tokens(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Split the text column on single spaces.

    Returns (flat token values as numpy object array is avoided — we keep
    Arrow) — actually returns (flat_values: pa.Array, offsets: np.ndarray).
    """
    col = batch.column("text").combine_chunks()
    lists = pc.split_pattern(col, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    return lists.values, np.asarray(lists.offsets)


def _per_row_member_counts(
    flat: pa.Array, offsets: np.ndarray, members: tuple[str, ...]
) -> np.ndarray:
    """Per-row count of tokens that appear in ``members`` (vectorized)."""
    isin = pc.is_in(flat, value_set=pa.array(members)).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    if len(isin) == 0:
        return np.zeros(len(offsets) - 1, dtype=np.int64)
    return np.add.reduceat(isin, offsets[:-1])


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, n_tokens, n_chars)."""
    _, offsets = _split_tokens(batch)
    n_tokens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n_chars = pc.utf8_length(batch.column("text")).cast(pa.int64())
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_chars": n_chars,
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, fp): md5 content hash (exact-dedup key)."""
    fps = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fp": pa.array(fps, type=pa.string()),
        }
    )


_WINNOW_MOD = (1 << 61) - 1
_WINNOW_BASE = 257


def winnow_fingerprints(text: str, k: int = 8, w: int = 6) -> list[int]:
    """Winnowing fingerprint: min rolling hash per window of k-gram hashes.

    Character-level polynomial rolling hash (base 257 mod 2^61-1) over the
    raw text; one selected hash per sliding window of ``w`` consecutive
    k-gram hashes, deduplicated, sorted.  Standard document-fingerprint
    scheme for near-copy detection at corpus scale.
    """
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    # rolling k-gram hashes
    h = 0
    top = pow(_WINNOW_BASE, k - 1, _WINNOW_MOD)
    hashes = []
    for i, b in enumerate(data):
        h = (h * _WINNOW_BASE + b) % _WINNOW_MOD
        if i >= k - 1:
            hashes.append(h)
            h = (h - data[i - k + 1] * top) % _WINNOW_MOD
    if not hashes:
        return []
    selected = set()
    for i in range(max(1, len(hashes) - w + 1)):
        selected.add(min(hashes[i : i + w]))
    return sorted(selected)


def winnow_batch(batch: pa.Table, k: int = 8, w: int = 6) -> pa.Table:
    """documents → (doc_id, n_fp, fp_min): winnowing fingerprint summary.

    Vectorized (``_winnow_fps_vec``; the scalar
    :func:`winnow_fingerprints` stays the reference).  Every doc yields
    ≥ 1 fingerprint (short docs are padded), so the group pass covers
    every input row."""
    if len(batch) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_fp": pa.array([], type=pa.int64()),
                "fp_min": pa.array([], type=pa.uint64()),
            }
        )
    ids, fps = _winnow_fps_vec(batch, k=k, w=w)
    # rows arrive grouped by doc (np.unique sorts by (doc, fp)): the
    # first fp per run is the min, run lengths are the counts
    change = np.ones(len(ids), dtype=bool)
    change[1:] = ids[1:] != ids[:-1]
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, len(ids)))
    return pa.table(
        {
            "doc_id": pa.array(ids[starts], type=pa.int64()),
            "n_fp": pa.array(counts, type=pa.int64()),
            "fp_min": pa.array(fps[starts], type=pa.uint64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """documents → quality-scoring row per doc.

    Integer counts plus ratios derived from them by exact IEEE division —
    bit-identical to the SQL oracle's arithmetic.
    """
    flat, offsets = _split_tokens(batch)
    n_tokens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    text_col = batch.column("text")
    n_chars = pc.utf8_length(text_col).cast(pa.int64()).to_numpy()
    stripped = pc.replace_substring_regex(text_col, PUNCT_RE, "")
    n_punct = n_chars - pc.utf8_length(stripped).cast(pa.int64()).to_numpy()
    n_stop = _per_row_member_counts(flat, offsets, STOPWORDS)
    punct_ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
    stop_ratio = np.where(
        n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0
    )
    passes = (
        (n_tokens >= 5)
        & (n_tokens <= 5000)
        & (punct_ratio < 0.3)
        & (stop_ratio < 0.5)
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_punct": pa.array(n_punct, type=pa.int64()),
            "n_stop": pa.array(n_stop, type=pa.int64()),
            "punct_ratio": pa.array(punct_ratio, type=pa.float64()),
            "stop_ratio": pa.array(stop_ratio, type=pa.float64()),
            "passes": pa.array(passes, type=pa.bool_()),
        }
    )


def langid_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, lang_pred): marker-token language heuristic."""
    flat, offsets = _split_tokens(batch)
    scores = {
        lang: _per_row_member_counts(flat, offsets, markers)
        for lang, markers in LANG_MARKERS.items()
    }
    n = len(offsets) - 1
    preds = np.full(n, "und", dtype=object)
    best = np.zeros(n, dtype=np.int64)
    # priority order: first language reaching the max score wins
    for lang in reversed(LANG_PRIORITY):
        s = scores[lang]
        take = (s >= best) & (s > 0)
        preds[take] = lang
        best = np.maximum(best, s)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds.tolist(), type=pa.string()),
        }
    )


def explode_tokens_batch(batch: pa.Table) -> pa.Table:
    """documents → one row per (doc_id, token): flat-map explode kernel."""
    flat, offsets = _split_tokens(batch)
    counts = offsets[1:] - offsets[:-1]
    doc_ids = np.repeat(
        batch.column("doc_id").to_numpy(zero_copy_only=False), counts
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "token": flat,
        }
    )


# ---------------------------------------------------------------------------
# subword-style token counting (BPE-pretokenizer regex)
# ---------------------------------------------------------------------------

# GPT-2-style pretokenization, restricted to ASCII classes so the SAME
# pattern runs identically under Python `re` and DuckDB's RE2 (the full
# \p{L} classes need the `regex` module, absent here; the corpus is
# ASCII).  Runs of letters / digits / punctuation each form one
# pre-token, optionally absorbing one leading space — the unit LLM token
# budgets are estimated in.
BPE_PRETOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

_BPE_RE = None


def bpe_token_stats_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, n_pretokens): subword-budget estimate per doc.

    Compiled once per worker process (module global), findall per row —
    the regex engine is the vectorized kernel here.
    """
    import re

    global _BPE_RE
    if _BPE_RE is None:
        _BPE_RE = re.compile(BPE_PRETOKEN_RE)
    counts = [
        len(_BPE_RE.findall(t)) for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_pretokens": pa.array(counts, type=pa.int64()),
        }
    )


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, n_tokens, top_token_frac, dup_2gram_frac):
    Gopher-style repetition quality signals (Rae et al. 2021, §A1.1).

    ``top_token_frac`` is the share of tokens taken by the single most
    frequent token; ``dup_2gram_frac`` the share of 2-gram positions
    whose 2-gram occurs more than once in the document.  High values of
    either mark boilerplate / degenerate pages a pretraining filter
    drops.  Pure per-row signals (no shuffle): grouped counting runs in
    pandas' C groupby over the flattened (row, token) frame, 2-grams are
    formed positionally with a row-boundary mask.
    """
    import pandas as pd

    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "top_token_frac": pa.array([], type=pa.float64()),
                "dup_2gram_frac": pa.array([], type=pa.float64()),
            }
        )
    flat, offsets = _split_tokens(batch)
    lens = np.diff(offsets)
    row_ids = np.repeat(np.arange(n), lens)
    tok = flat.to_numpy(zero_copy_only=False)

    tc = (
        pd.DataFrame({"r": row_ids, "t": tok})
        .groupby(["r", "t"], sort=False)
        .size()
    )
    top = tc.groupby(level=0).max().reindex(range(n), fill_value=0).to_numpy()

    same_row = row_ids[:-1] == row_ids[1:]
    bg_rows = row_ids[:-1][same_row]
    bg = pd.DataFrame(
        {
            "r": bg_rows,
            "g": pd.Series(tok[:-1][same_row]).str.cat(
                pd.Series(tok[1:][same_row]), sep=" "
            ),
        }
    )
    if len(bg):
        bc = bg.groupby(["r", "g"], sort=False).size()
        per_row = bc.groupby(level=0)
        n2 = per_row.sum().reindex(range(n), fill_value=0).to_numpy()
        dup = (
            bc[bc > 1]
            .groupby(level=0)
            .sum()
            .reindex(range(n), fill_value=0)
            .to_numpy()
        )
    else:
        n2 = np.zeros(n, dtype=np.int64)
        dup = np.zeros(n, dtype=np.int64)

    n_tokens = lens.astype(np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "top_token_frac": pa.array(
                np.where(n_tokens > 0, top / np.maximum(n_tokens, 1), 0.0),
                type=pa.float64(),
            ),
            "dup_2gram_frac": pa.array(
                np.where(n2 > 0, dup / np.maximum(n2, 1), 0.0),
                type=pa.float64(),
            ),
        }
    )


# Corpus-blocklist filter: the deny-list companion to quality_batch's
# keep-heuristics (C4 dropped any page containing a "bad words" token).
# The list mixes tokens the synthetic corpus DOES contain with ones it
# doesn't, so both filter branches are exercised.
BLOCKLIST: tuple[str, ...] = ("slow", "dup", "spam", "malware")


def blocklist_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, n_blocked, keep): occurrence count of
    blocklisted tokens and the C4-style keep decision (zero hits).

    Stateless vectorized membership pass (``is_in`` + per-row segment
    sum) — no shuffle, streams at any corpus size."""
    flat, offsets = _split_tokens(batch)
    n_blocked = _per_row_member_counts(flat, offsets, BLOCKLIST)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_blocked": pa.array(n_blocked, type=pa.int64()),
            "keep": pa.array(n_blocked == 0, type=pa.bool_()),
        }
    )


def sql_blocklist() -> str:
    """DuckDB twin of :func:`blocklist_batch`."""
    lits = ", ".join(f"'{w}'" for w in BLOCKLIST)
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents)
        SELECT doc_id,
               sum(CASE WHEN w IN ({lits}) THEN 1 ELSE 0 END)::BIGINT
                 AS n_blocked,
               sum(CASE WHEN w IN ({lits}) THEN 1 ELSE 0 END) = 0 AS keep
        FROM tok GROUP BY doc_id
    """


# --- vectorized winnowing ---------------------------------------------------
# Per-position byte lookup tables: T[j][v] = v * 257^(k-1-j) mod (2^61-1),
# each < 2^61, so sums of ≤4 terms stay inside uint64 and two staged
# mod-reductions reproduce the scalar rolling hash bit-for-bit.
def _winnow_tables(k: int = 8) -> "np.ndarray":
    t = np.empty((k, 256), dtype=np.uint64)
    for j in range(k):
        p = pow(_WINNOW_BASE, k - 1 - j, _WINNOW_MOD)
        t[j] = (np.arange(256, dtype=np.uint64) * np.uint64(p)) % np.uint64(
            _WINNOW_MOD
        )
    return t


_WINNOW_T8 = _winnow_tables(8)


def _winnow_fps_vec(
    batch: pa.Table, k: int = 8, w: int = 6
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, fingerprint) rows — DISTINCT selected fingerprints per
    doc, bit-identical to :func:`winnow_fingerprints` (which stays the
    scalar reference), computed over the batch's concatenated bytes:

    - k-gram hashes for every position via the byte lookup tables
      (two staged mod-2^61−1 reductions keep everything in uint64);
    - per-window minimum as ``np.minimum`` over ``w`` shifted slices;
    - doc-boundary masking + per-doc ``\\x00``-padding for short docs,
      mirroring the scalar kernel's convention;
    - distinct (doc, fp) via ``np.unique`` on the packed pair.
    """
    tables = _WINNOW_T8 if k == 8 else _winnow_tables(k)
    mod = np.uint64(_WINNOW_MOD)
    texts = [
        t.encode("utf-8") for t in batch.column("text").to_pylist()
    ]
    texts = [t + b"\x00" * (k - len(t)) if len(t) < k else t for t in texts]
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    data = np.frombuffer(b"".join(texts), dtype=np.uint8)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = int(lens.sum())
    n_pos = total - k + 1
    if n_pos <= 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.uint64)
    # staged sums: 4 terms (< 2^63), reduce, 4 terms, reduce, combine
    acc1 = np.zeros(n_pos, dtype=np.uint64)
    for j in range(4):
        acc1 += tables[j][data[j : j + n_pos]]
    acc1 %= mod
    acc2 = np.zeros(n_pos, dtype=np.uint64)
    for j in range(4, k):
        acc2 += tables[j][data[j : j + n_pos]]
    acc2 %= mod
    hashes = (acc1 + acc2) % mod
    # per-doc k-gram counts and position ownership
    n_hashes = lens - k + 1  # ≥ 1 after padding
    h_parent = np.repeat(np.arange(len(texts), dtype=np.int64), n_hashes)
    valid_pos = np.concatenate(
        [np.arange(s, s + c) for s, c in zip(starts, n_hashes)]
    ) if len(texts) else np.array([], dtype=np.int64)
    doc_hashes = hashes[valid_pos]
    # window minimum over w consecutive k-gram hashes WITHIN each doc:
    # scalar loops max(1, n-w+1) windows, so docs with fewer than w
    # hashes take the min of what they have.  Compute by minimum over
    # shifted slices, masking shifts that run past the doc's end.
    m = len(doc_hashes)
    doc_end = np.repeat(np.cumsum(n_hashes), n_hashes)  # exclusive, local
    local_pos = np.arange(m) - np.repeat(
        np.cumsum(n_hashes) - n_hashes, n_hashes
    )
    # number of windows per doc = max(1, n_hashes - w + 1); a position p
    # starts a window iff p < n_windows
    n_windows = np.maximum(n_hashes - w + 1, 1)
    is_window = local_pos < np.repeat(n_windows, n_hashes)
    sel = doc_hashes.copy()
    glob_end = np.repeat(np.cumsum(n_hashes), n_hashes)
    for j in range(1, w):
        idx = np.arange(m) + j
        ok = idx < glob_end  # stay inside the same doc
        shifted = np.where(ok, doc_hashes[np.minimum(idx, m - 1)], sel)
        sel = np.minimum(sel, shifted)
    sel = sel[is_window]
    sel_parent = h_parent[is_window]
    pairs = np.stack(
        [sel_parent.astype(np.uint64), sel], axis=1
    )
    uniq = np.unique(pairs, axis=0)
    return doc_ids[uniq[:, 0].astype(np.int64)], uniq[:, 1]


def quality_by_source_batch(batch: pa.Table) -> pa.Table:
    """Map-side combine for the per-(source, lang) quality dashboard:
    integer sums + pass counts per group, one Arrow grouped pass."""
    if len(batch) == 0:
        return pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "skey": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64()),
                "sum_tokens": pa.array([], type=pa.int64()),
                "sum_chars": pa.array([], type=pa.int64()),
                "sum_punct": pa.array([], type=pa.int64()),
                "n_pass": pa.array([], type=pa.int64()),
            }
        )
    import hashlib

    q = quality_batch(batch)
    t = pa.table(
        {
            "source": batch.column("source"),
            "lang": batch.column("lang"),
            "n_tokens": q.column("n_tokens"),
            "n_chars": q.column("n_chars"),
            "n_punct": q.column("n_punct"),
            "p": q.column("passes").cast(pa.int64()),
        }
    )
    out = t.group_by(["source", "lang"]).aggregate(
        [([], "count_all"), ("n_tokens", "sum"), ("n_chars", "sum"),
         ("n_punct", "sum"), ("p", "sum")]
    )
    # int64 digest of the string group key — the numeric exchange key
    # (the exact_dedup fp_key idiom)
    skey = [
        int.from_bytes(
            hashlib.md5(f"{s}|{l}".encode("utf-8")).digest()[:8],
            "big", signed=True,
        )
        for s, l in zip(
            out.column("source").to_pylist(), out.column("lang").to_pylist()
        )
    ]
    return pa.table(
        {
            "source": out.column("source"),
            "lang": out.column("lang"),
            "skey": pa.array(skey, type=pa.int64()),
            "n_docs": out.column("count_all").cast(pa.int64()),
            "sum_tokens": out.column("n_tokens_sum"),
            "sum_chars": out.column("n_chars_sum"),
            "sum_punct": out.column("n_punct_sum"),
            "n_pass": out.column("p_sum"),
        }
    )


def quality_by_source(docs):
    """documents → per (source, lang): doc count, token/char/punct sums,
    pass count, and exact-integer-derived means/rates — the corpus
    curation dashboard (which slices of the crawl are worth keeping).

    Map-side combine per block then one grouped Sum over the (tiny)
    source×lang key space; the float columns divide integer sums once
    at the end, so they are bit-exact against the SQL twin at any
    block order."""
    import numpy as np

    from ..shuffle import hash_grouped

    def finish(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "n_docs" not in t.column_names:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "lang": pa.array([], type=pa.string()),
                    "n_docs": pa.array([], type=pa.int64()),
                    "avg_tokens": pa.array([], type=pa.float64()),
                    "punct_rate": pa.array([], type=pa.float64()),
                    "pass_rate": pa.array([], type=pa.float64()),
                }
            )
        nd = t.column("n_docs").to_numpy(zero_copy_only=False)
        st = t.column("sum_tokens").to_numpy(zero_copy_only=False)
        sc = t.column("sum_chars").to_numpy(zero_copy_only=False)
        sp = t.column("sum_punct").to_numpy(zero_copy_only=False)
        np_ = t.column("n_pass").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": t.column("source"),
                "lang": t.column("lang"),
                "n_docs": t.column("n_docs"),
                "avg_tokens": pa.array(
                    st / nd.astype(np.float64), type=pa.float64()
                ),
                "punct_rate": pa.array(
                    sp / np.maximum(sc, 1).astype(np.float64),
                    type=pa.float64(),
                ),
                "pass_rate": pa.array(
                    np_ / nd.astype(np.float64), type=pa.float64()
                ),
            }
        )

    # the exchange moves blocks × groups partial rows, routed on the
    # int64 source|lang digest carried from the partial (string keys
    # cannot hash-route directly — the exact_dedup fp_key idiom)
    merged = hash_grouped(
        docs.map_batches(quality_by_source_batch, batch_format="pyarrow"),
        ["source", "lang", "skey"],
        [("n_docs", "sum"), ("sum_tokens", "sum"), ("sum_chars", "sum"),
         ("sum_punct", "sum"), ("n_pass", "sum")],
        rename={"n_docs_sum": "n_docs", "sum_tokens_sum": "sum_tokens",
                "sum_chars_sum": "sum_chars", "sum_punct_sum": "sum_punct",
                "n_pass_sum": "n_pass"},
        hash_cols=["skey"],
        num_partitions=1,
    )
    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, §A1.1) — composite document filter
# ---------------------------------------------------------------------------

# Rule thresholds.  Structure follows the paper; the word-count floor is
# tuned to the synthetic corpus (10-99-token docs) so the gate stays
# non-trivial — the published 50/100k bounds would pass or fail docs on
# length alone.  Line-shape rules (bullet/ellipsis line fractions) are
# omitted: the corpus is single-line by construction.
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 5000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_KINDS = 1  # corpus vocabulary carries only "the"/"to"
# the paper's 8-word English indicator set
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_batch(batch: pa.Table) -> pa.Table:
    """documents → Gopher quality-rule row per doc.

    All inputs are integer counts; every ratio is ONE IEEE division of
    those counts, and every rule a comparison on the result — so the
    DuckDB twin (identical formulas) hash-matches bit for bit.
    Vectorized: one split, one regex match over the flat token array,
    substring counts via the non-overlapping replace-length identity
    (``(len - len(replace(s, '...', ''))) / 3`` — the same left-to-right
    non-overlap semantics DuckDB's ``replace`` has).
    """
    flat, offsets = _split_tokens(batch)
    n_words = (offsets[1:] - offsets[:-1]).astype(np.int64)
    text_col = batch.column("text").combine_chunks()
    n_chars = pc.utf8_length(text_col).cast(pa.int64()).to_numpy()
    safe_n = np.maximum(n_words, 1)
    # single-space-joined text: total token chars = chars − (words − 1)
    mean_word_len = (n_chars - (n_words - 1)) / safe_n
    n_hash = (
        n_chars
        - pc.utf8_length(pc.replace_substring(text_col, "#", ""))
        .cast(pa.int64())
        .to_numpy()
    )
    n_ellipsis = (
        n_chars
        - pc.utf8_length(pc.replace_substring(text_col, "...", ""))
        .cast(pa.int64())
        .to_numpy()
    ) // 3
    symbol_ratio = (n_hash + n_ellipsis) / safe_n
    alpha = (
        pc.match_substring_regex(flat, "[A-Za-z]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_alpha = (
        np.add.reduceat(alpha, offsets[:-1])
        if len(alpha)
        else np.zeros(len(n_words), dtype=np.int64)
    )
    alpha_frac = n_alpha / safe_n
    stop_kinds = np.zeros(len(n_words), dtype=np.int64)
    for w in GOPHER_STOPWORDS:
        stop_kinds += (
            _per_row_member_counts(flat, offsets, (w,)) > 0
        ).astype(np.int64)
    r_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_mean = (mean_word_len >= GOPHER_MIN_MEAN_LEN) & (
        mean_word_len <= GOPHER_MAX_MEAN_LEN
    )
    r_symbol = symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO
    r_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    r_stop = stop_kinds >= GOPHER_MIN_STOP_KINDS
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, type=pa.int64()),
            "mean_word_len": pa.array(mean_word_len, type=pa.float64()),
            "symbol_ratio": pa.array(symbol_ratio, type=pa.float64()),
            "alpha_frac": pa.array(alpha_frac, type=pa.float64()),
            "stop_kinds": pa.array(stop_kinds, type=pa.int64()),
            "r_words": pa.array(r_words, type=pa.bool_()),
            "r_mean": pa.array(r_mean, type=pa.bool_()),
            "r_symbol": pa.array(r_symbol, type=pa.bool_()),
            "r_alpha": pa.array(r_alpha, type=pa.bool_()),
            "r_stop": pa.array(r_stop, type=pa.bool_()),
            "keep": pa.array(
                r_words & r_mean & r_symbol & r_alpha & r_stop,
                type=pa.bool_(),
            ),
        }
    )


def sql_gopher() -> str:
    """DuckDB twin of :func:`gopher_batch` (identical count → single
    division → comparison chain)."""
    stops = " + ".join(
        f"list_contains(string_split(text, ' '), '{w}')::INT"
        for w in GOPHER_STOPWORDS
    )
    return f"""
        WITH base AS (
          SELECT doc_id,
            len(string_split(text, ' '))::BIGINT AS n_words,
            length(text)::BIGINT AS n_chars,
            ((length(text) - length(replace(text, '#', '')))
             + (length(text) - length(replace(text, '...', ''))) // 3
            )::BIGINT AS n_sym,
            len(list_filter(string_split(text, ' '),
                w -> regexp_matches(w, '[A-Za-z]')))::BIGINT AS n_alpha,
            ({stops})::BIGINT AS stop_kinds
          FROM documents),
        calc AS (
          SELECT doc_id, n_words, stop_kinds,
            (n_chars - (n_words - 1))::DOUBLE
              / greatest(n_words, 1)::DOUBLE AS mean_word_len,
            n_sym::DOUBLE / greatest(n_words, 1)::DOUBLE AS symbol_ratio,
            n_alpha::DOUBLE / greatest(n_words, 1)::DOUBLE AS alpha_frac
          FROM base)
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
               stop_kinds,
          (n_words >= {GOPHER_MIN_WORDS}
           AND n_words <= {GOPHER_MAX_WORDS}) AS r_words,
          (mean_word_len >= {GOPHER_MIN_MEAN_LEN}
           AND mean_word_len <= {GOPHER_MAX_MEAN_LEN}) AS r_mean,
          (symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}) AS r_symbol,
          (alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}) AS r_alpha,
          (stop_kinds >= {GOPHER_MIN_STOP_KINDS}) AS r_stop,
          (n_words >= {GOPHER_MIN_WORDS}
           AND n_words <= {GOPHER_MAX_WORDS}
           AND mean_word_len >= {GOPHER_MIN_MEAN_LEN}
           AND mean_word_len <= {GOPHER_MAX_MEAN_LEN}
           AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
           AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
           AND stop_kinds >= {GOPHER_MIN_STOP_KINDS}) AS keep
        FROM calc
    """


# --- C4 line-level quality rules (Raffel et al. 2020) ----------------------

C4_LINE_WORDS = 10       # injected line length (words)
C4_MIN_LINE_WORDS = 5    # C4: only retain lines with >= 5 words
C4_MIN_KEPT_LINES = 3    # C4: discard pages with < 3 sentences
C4_JS_SUFFIX = " javascript code."
C4_LOREM_LINE = "lorem ipsum."
C4_BRACE_LINE = "config { done }."


def inject_c4_lines_batch(batch: pa.Table) -> pa.Table:
    """Plant a deterministic newline/punctuation structure on the corpus
    — a disclosed test/benchmark device (the nav-banner / synthetic-PII
    idiom): the sandbox documents are single-line, punctuation-free
    space-joined tokens, so the C4 line rules would be degenerate on the
    raw text.  The injection re-wraps each doc into ``C4_LINE_WORDS``-word
    lines and, per line ``l`` with ``r = doc_id + l``:

    - ``r % 5 == 0`` → append ``' javascript code.'`` (terminal punct but
      carries the word ``javascript`` → line dropped by the JS rule)
    - else ``r % 3 == 0`` → leave unterminated (dropped: no terminal punct)
    - else → append ``'.'`` (kept iff the line has >= 5 words)

    plus a page-level ``'lorem ipsum.'`` line when ``doc_id % 13 == 0``
    and a ``'config { done }.'`` line when ``doc_id % 17 == 0``.  Every
    branch is a pure function of (doc_id, line index), replayed verbatim
    by :func:`sql_c4`'s CTE chain."""
    if batch.num_rows == 0:
        return batch
    flat, offsets = _split_tokens(batch)
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    counts = (offsets[1:] - offsets[:-1]).astype(np.int64)
    nl = (counts + C4_LINE_WORDS - 1) // C4_LINE_WORDS
    total = int(nl.sum())
    doc_of_line = np.repeat(np.arange(len(counts)), nl)
    line_in_doc = np.arange(total) - np.repeat(np.cumsum(nl) - nl, nl)
    line_start = offsets[:-1][doc_of_line] + C4_LINE_WORDS * line_in_doc
    # lines tile each doc's token range exactly, so the line list offsets
    # are just the starts plus the final end — one zero-copy ListArray
    line_offsets = np.append(line_start, offsets[-1]).astype(np.int64)
    # int32 list offsets are safe here: this runs per map_batches block
    # (~target_max_block_size), never per whole partition
    lines = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(line_offsets.astype(np.int32), type=pa.int32()), flat
        ),
        " ",
    )
    r = doc_id[doc_of_line] + line_in_doc
    suffix = np.where(
        r % 5 == 0, C4_JS_SUFFIX, np.where(r % 3 == 0, "", ".")
    )
    lines = pc.binary_join_element_wise(
        lines, pa.array(suffix, type=pa.string()), ""
    )
    # per-doc rejoin with '\n'
    doc_line_offsets = np.append(0, np.cumsum(nl)).astype(np.int32)
    text = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(doc_line_offsets, type=pa.int32()),
            lines.combine_chunks() if isinstance(lines, pa.ChunkedArray)
            else lines,
        ),
        "\n",
    )
    tail = np.where(doc_id % 13 == 0, "\n" + C4_LOREM_LINE, "")
    tail2 = np.where(doc_id % 17 == 0, "\n" + C4_BRACE_LINE, "")
    text = pc.binary_join_element_wise(
        text,
        pa.array(tail, type=pa.string()),
        pa.array(tail2, type=pa.string()),
        "",
    )
    cols = {name: batch.column(name) for name in batch.column_names}
    cols["text"] = text
    return pa.table(cols)


def c4_batch(batch: pa.Table) -> pa.Table:
    """multi-line documents → C4 quality-rule row per doc (Raffel et al.
    2020 §2.2, the heuristics behind the C4 corpus): a line is retained
    iff it ends in terminal punctuation (``. ! ? "``), has at least
    ``C4_MIN_LINE_WORDS`` words, and does not contain the word
    ``javascript``; the page is retained iff at least
    ``C4_MIN_KEPT_LINES`` lines survive and no line carries
    ``lorem ipsum`` or ``{``.  All predicates are per-line and vectorized
    (one split + Arrow kernels over the flat line array); ``clean_text``
    is the kept lines re-joined — the filter's actual training-data
    output."""
    col = batch.column("text").combine_chunks()
    lists = pc.split_pattern(col, "\n")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    lines, offsets = lists.values, np.asarray(lists.offsets)
    n_lines = (offsets[1:] - offsets[:-1]).astype(np.int64)
    lw = (
        pc.utf8_length(lines).cast(pa.int64()).to_numpy(zero_copy_only=False)
        - pc.utf8_length(pc.replace_substring(lines, " ", ""))
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
        + 1
    )
    term = (
        pc.ends_with(lines, ".")
        .to_numpy(zero_copy_only=False)
        | pc.ends_with(lines, "!").to_numpy(zero_copy_only=False)
        | pc.ends_with(lines, "?").to_numpy(zero_copy_only=False)
        | pc.ends_with(lines, '"').to_numpy(zero_copy_only=False)
    )
    low = pc.utf8_lower(lines)
    js = pc.match_substring_regex(
        low, "(^| )javascript( |$)"
    ).to_numpy(zero_copy_only=False)
    lorem = pc.match_substring(low, "lorem ipsum").to_numpy(
        zero_copy_only=False
    )
    brace = pc.match_substring(lines, "{").to_numpy(zero_copy_only=False)
    kept = term & (lw >= C4_MIN_LINE_WORDS) & ~js

    def _doc_sum(x: np.ndarray) -> np.ndarray:
        if len(x) == 0:
            return np.zeros(len(n_lines), dtype=np.int64)
        return np.add.reduceat(x.astype(np.int64), offsets[:-1])

    n_kept = _doc_sum(kept)
    has_lorem = _doc_sum(lorem) > 0
    has_brace = _doc_sum(brace) > 0
    keep = (n_kept >= C4_MIN_KEPT_LINES) & ~has_lorem & ~has_brace
    # clean_text: kept lines re-joined with '\n' per doc
    kept_lines = lines.filter(pa.array(kept))
    kept_offsets = np.append(0, np.cumsum(n_kept)).astype(np.int32)
    clean = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(kept_offsets, type=pa.int32()), kept_lines
        ),
        "\n",
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_lines": pa.array(n_lines, type=pa.int64()),
            "n_kept": pa.array(n_kept, type=pa.int64()),
            "has_lorem": pa.array(has_lorem, type=pa.bool_()),
            "has_brace": pa.array(has_brace, type=pa.bool_()),
            "keep": pa.array(keep, type=pa.bool_()),
            "clean_text": clean,
        }
    )


def sql_c4() -> str:
    """DuckDB twin of ``inject_c4_lines_batch`` + :func:`c4_batch`: the
    line re-wrap, the injected suffixes, and every C4 predicate replayed
    as pure SQL over the raw documents table."""
    return f"""
        WITH words AS (
          SELECT doc_id, unnest(ts) AS w, generate_subscripts(ts, 1) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS ts
                FROM documents)),
        lines0 AS (
          SELECT doc_id, ((i - 1) // {C4_LINE_WORDS})::BIGINT AS line_id,
                 string_agg(w, ' ' ORDER BY i) AS line
          FROM words GROUP BY doc_id, ((i - 1) // {C4_LINE_WORDS})),
        lines1 AS (
          SELECT doc_id, line_id,
            CASE WHEN (doc_id + line_id) % 5 = 0
                   THEN line || '{C4_JS_SUFFIX}'
                 WHEN (doc_id + line_id) % 3 = 0 THEN line
                 ELSE line || '.' END AS line
          FROM lines0
          UNION ALL
          SELECT doc_id, 1000000000, '{C4_LOREM_LINE}'
          FROM documents WHERE doc_id % 13 = 0
          UNION ALL
          SELECT doc_id, 1000000001, '{C4_BRACE_LINE}'
          FROM documents WHERE doc_id % 17 = 0),
        per_line AS (
          SELECT doc_id, line_id, line,
            (length(line) - length(replace(line, ' ', '')) + 1
            )::BIGINT AS lw,
            (line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?'
             OR line LIKE '%"') AS term,
            regexp_matches(lower(line), '(^| )javascript( |$)') AS js,
            (position('lorem ipsum' IN lower(line)) > 0) AS lorem,
            (position('{{' IN line) > 0) AS brace
          FROM lines1)
        SELECT doc_id,
          count(*)::BIGINT AS n_lines,
          coalesce(sum(CASE WHEN term AND lw >= {C4_MIN_LINE_WORDS}
                            AND NOT js THEN 1 END), 0)::BIGINT AS n_kept,
          bool_or(lorem) AS has_lorem,
          bool_or(brace) AS has_brace,
          (coalesce(sum(CASE WHEN term AND lw >= {C4_MIN_LINE_WORDS}
                             AND NOT js THEN 1 END), 0)
             >= {C4_MIN_KEPT_LINES}
           AND NOT bool_or(lorem) AND NOT bool_or(brace)) AS keep,
          coalesce(string_agg(
            CASE WHEN term AND lw >= {C4_MIN_LINE_WORDS} AND NOT js
                 THEN line END, chr(10) ORDER BY line_id), '')
            AS clean_text
        FROM per_line GROUP BY doc_id
    """
