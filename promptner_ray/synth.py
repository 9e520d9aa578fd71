"""Deterministic synthetic Common-Crawl-style pages corpus.

Builds the ``pages`` table mandated by BASELINE.json's input_hint
(``url, warc_ts, html, text, lang``) plus a ``gold_sentences`` side table,
from (a) planted-entity sentences over a CoNLL-style PER/ORG/LOC/MISC
vocabulary and (b) filler text drawn from the driver's
``documents.parquet`` (doc_id, text, lang, …).  Everything is a pure
function of ``(seed, doc index, filler text)`` so any parallelism level
produces the identical corpus.

``render_html`` is the encoding inverse of
``kernels.textextract.extract_text``: it HTML-escapes each text line into a
``<p>`` inside ``<article>``, adds nav/header/footer boilerplate,
``<script>``/``<style>`` noise and entity-preserving inline markup — so
``extract_text(render_html(text)) == text`` byte-for-byte.
"""

from __future__ import annotations

import datetime
import hashlib
import html as _html
import random

# ---------------------------------------------------------------------------
# Entity vocabulary (CoNLL-style type system, reference algorithms.py:557-566)
# ---------------------------------------------------------------------------

PER = (
    "Andy Caddick", "Maria Alvarez", "John Smith", "Wei Chen", "Anna Kowalska",
    "David Okoro", "Elena Petrova", "Tom Baker", "Priya Sharma", "Luis Garcia",
    "Kenji Tanaka", "Sara Lindqvist", "Peter O'Neill", "Fatima Hassan",
    "Marco Rossi", "Ingrid Larsen", "Omar Farouk", "Julia Nowak",
    "Samuel Adebayo", "Grace Kim",
)
ORG = (
    "Acme Corp", "United Nations", "Globex Industries", "Leicestershire",
    "Initech", "Umbrella Group", "Stark Industries", "Wayne Enterprises",
    "Somerset", "Tyrell Corporation", "Cyberdyne Systems", "Soylent Foods",
    "Essex", "Derbyshire", "Surrey", "Massive Dynamic", "Hooli",
    "Pied Piper", "Vandelay Industries", "Wonka Factory",
)
LOC = (
    "England", "Grace Road", "New York City", "Paris", "Tokyo", "Berlin",
    "Lake Victoria", "Mount Kenya", "San Francisco", "Cape Town", "Mumbai",
    "Rio de Janeiro", "Oslo", "Prague", "Istanbul", "Cairo", "Sydney",
    "Buenos Aires", "Amsterdam", "Nairobi",
)
MISC = (
    "World War Two", "Olympic Games", "French", "German", "Polish",
    "Brazilian", "Nobel Prize", "World Cup", "Eurovision", "Renaissance",
)

VOCAB: dict[str, str] = {}
for _surfaces, _t in ((PER, "PER"), (ORG, "ORG"), (LOC, "LOC"), (MISC, "MISC")):
    for _s in _surfaces:
        VOCAB[_s] = _t

# GENIA-style biomedical vocabulary (reference GeniaConfig type system,
# algorithms.py:762-764: protein/DNA/RNA/cell_type/cell_line) — used by the
# stub model when running the "genia" task spec.
GENIA_VOCAB: dict[str, str] = {
    "interleukin-2": "protein", "NF-kappa B": "protein",
    "tumor necrosis factor": "protein", "CD28": "protein",
    "transcription factor": "protein", "IL-2 gene": "DNA",
    "promoter region": "DNA", "CD28 gene": "DNA", "enhancer element": "DNA",
    "messenger RNA": "RNA", "IL-2 mRNA": "RNA",
    "T cells": "cell_type", "B lymphocytes": "cell_type",
    "monocytes": "cell_type", "natural killer cells": "cell_type",
    "Jurkat cells": "cell_line", "HeLa cells": "cell_line",
    "K562 cells": "cell_line",
}

TASK_VOCABS: dict[str, dict[str, str]] = {
    "conll": VOCAB,
    "genia": GENIA_VOCAB,
}

# Hot surface forms planted far more often than the rest — the skew knob for
# the canonicalization shuffle (salting test).
HOT_SURFACES = ("England", "United Nations", "John Smith")

# Sentence templates; tokens are space-separated (reference convention
# `" ".join(tokens)`, data.py:233). Connector words drive triple induction.
_TEMPLATES = (
    "{PER} visited {LOC} on behalf of {ORG} .",
    "{ORG} said that {PER} will travel to {LOC} next week .",
    "{PER} met {PER2} at {LOC} during the {MISC} .",
    "{ORG} defeated {ORG2} at {LOC} yesterday .",
    "{PER} 's appointment at {ORG} surprised analysts in {LOC} .",
    "The {MISC} champion {PER} joined {ORG} this season .",
    "{LOC} hosted the {MISC} with support from {ORG} .",
    "{PER} criticised {ORG} over its plans for {LOC} .",
    "Officials from {ORG} arrived in {LOC} to meet {PER} .",
    "{PER} and {PER2} founded {ORG} in {LOC} .",
)

_FILLER_TEMPLATES = (
    "the report was published after a long delay .",
    "markets were quiet for most of the session .",
    "officials declined to comment on the matter .",
    "the weather stayed dry throughout the afternoon .",
)


def _rng_for(seed: int, doc_index: int) -> random.Random:
    key = hashlib.blake2b(
        f"{seed}:{doc_index}".encode(), digest_size=8
    ).digest()
    return random.Random(int.from_bytes(key, "big"))


def _plant_sentence(rng: random.Random) -> tuple[str, list[str], list[str]]:
    """One planted sentence: (text, entity surfaces, entity types)."""
    template = rng.choice(_TEMPLATES)
    out_tokens: list[str] = []
    surfaces: list[str] = []
    types: list[str] = []
    for tok in template.split(" "):
        if tok.startswith("{") and tok.endswith("}"):
            slot = tok[1:-1].rstrip("2")
            pool = {"PER": PER, "ORG": ORG, "LOC": LOC, "MISC": MISC}[slot]
            # skew: hot surfaces win ~35% of draws for their pool
            hot = [s for s in HOT_SURFACES if s in pool]
            if hot and rng.random() < 0.35:
                surface = rng.choice(hot)
            else:
                surface = rng.choice(pool)
            out_tokens.extend(surface.split(" "))
            surfaces.append(surface)
            types.append(VOCAB[surface])
        else:
            out_tokens.append(tok)
    return " ".join(out_tokens), surfaces, types


def gold_bio(text: str, surfaces: list[str], types: list[str]) -> list[str]:
    """BIO tags for planted entities, aligned with ``text.split(" ")``.

    Mirrors the aligner's matching discipline (first unclaimed occurrence,
    sentence order) so gold and pipeline agree by construction.
    """
    tokens = text.split(" ")
    tags = ["O"] * len(tokens)
    for surface, etype in zip(surfaces, types):
        words = surface.split(" ")
        for i in range(len(tokens) - len(words) + 1):
            if tokens[i : i + len(words)] == words and tags[i] == "O":
                tags[i] = "B-" + etype
                for j in range(i + 1, i + len(words)):
                    tags[j] = "I-" + etype
                break
    return tags


# ---------------------------------------------------------------------------
# HTML encoding (inverse of kernels.textextract.extract_text)
# ---------------------------------------------------------------------------

_BOILER_HEAD = (
    "<!DOCTYPE html>\n<html>\n<head>\n<title>{title}</title>\n"
    '<style> body {{ margin: 0; }} .nav {{ color: #333; }} </style>\n'
    "<script>var t = Date.now(); if (t > 0) {{ console.log('<p>fake</p>'); }}</script>\n"
    "</head>\n<body>\n"
    '<nav class="nav"><a href="/">Home</a> | <a href="/news">News</a></nav>\n'
    "<header><h1>{title}</h1></header>\n"
)
_BOILER_FOOT = (
    "\n<aside>Related: <a href='/other'>other stories</a></aside>\n"
    "<footer>&copy; synth.test — all rights reserved</footer>\n"
    "<script>trackPageView('{url}');</script>\n</body>\n</html>\n"
)
_INLINE_TAGS = ("b", "i", "em", "strong")


def render_html(text: str, url: str, rng: random.Random) -> bytes:
    """Encode ``text`` into a templated HTML page; extract_text inverts it."""
    paras = []
    for line in text.split("\n"):
        escaped = _html.escape(line)
        words = escaped.split(" ")
        # entity-preserving inline markup: wrap a random word span per line
        if len(words) > 3 and rng.random() < 0.7:
            i = rng.randrange(len(words) - 1)
            j = min(len(words), i + rng.randrange(1, 3))
            tag = rng.choice(_INLINE_TAGS)
            words[i] = f"<{tag}>" + words[i]
            words[j - 1] = words[j - 1] + f"</{tag}>"
        body = " ".join(words)
        if rng.random() < 0.3:
            body = f'<a href="/e/{rng.randrange(1_000_000)}">' + body + "</a>"
        paras.append(f"<p>{body}</p>")
    title = _html.escape(url.rsplit("/", 1)[-1])
    doc = (
        _BOILER_HEAD.format(title=title)
        + "<article>\n"
        + "\n".join(paras)
        + "\n</article>"
        + _BOILER_FOOT.format(url=url)
    )
    return doc.encode("utf-8")


# ---------------------------------------------------------------------------
# Page generation
# ---------------------------------------------------------------------------

_EPOCH = datetime.datetime(2024, 1, 1)


def make_page(
    doc_index: int,
    seed: int,
    filler_words: list[str],
    lang: str = "en",
    head_url: bool = False,
    part: int | None = None,
) -> tuple[dict, list[dict]]:
    """Build one page row + its gold sentence rows (pure, deterministic).

    ``part`` is the checkpoint partition (url-range bucket).  Contiguous doc
    ranges map to one part so the corpus writer emits ~one file per part
    instead of files × parts (a 4096-tiny-file corpus measurably stalls the
    driver-side parquet metadata path at read time).
    """
    rng = _rng_for(seed, doc_index)
    n_sent = rng.randint(40, 160) if head_url else rng.randint(1, 20)
    if part is None:
        part = doc_index % 64
    url = f"https://synth.test/part{part:03d}/doc{doc_index:08d}"
    lines: list[str] = []
    gold_rows: list[dict] = []
    for s in range(n_sent):
        if lang == "en" and rng.random() < 0.6:
            text, surfaces, types = _plant_sentence(rng)
        elif filler_words and rng.random() < 0.5:
            k = rng.randint(5, 18)
            start = rng.randrange(max(1, len(filler_words) - k))
            text = " ".join(filler_words[start : start + k]) + " ."
            surfaces, types = [], []
        else:
            text = rng.choice(_FILLER_TEMPLATES)
            surfaces, types = [], []
        lines.append(text)
        gold_rows.append(
            {
                "url": url,
                "sent_id": s,
                "text": text,
                "surfaces": surfaces,
                "types": types,
                "bio": gold_bio(text, surfaces, types),
            }
        )
    text = "\n".join(lines)
    page = {
        "url": url,
        "warc_ts": _EPOCH + datetime.timedelta(seconds=doc_index),
        "html": render_html(text, url, rng),
        "text": text,
        "lang": lang,
    }
    return page, gold_rows


def part_for(doc_index: int, n_docs: int, n_parts: int = 64) -> int:
    """Checkpoint partition of a doc: contiguous index ranges (shared by the
    corpus builder and the single-process oracle so urls agree)."""
    per_part = max(1, -(-n_docs // n_parts))
    return min(doc_index // per_part, n_parts - 1)


def pages_batch(
    indices: list[int],
    seed: int,
    langs: list[str],
    fillers: list[list[str]],
    head_every: int = 97,
    n_docs: int | None = None,
    n_parts: int = 64,
) -> tuple[list[dict], list[dict]]:
    """Vector-of-rows builder used inside ``map_batches`` by the corpus
    pipeline: each index is assigned a lang + filler deterministically.
    Parts are contiguous doc-index ranges (see :func:`make_page`)."""
    pages: list[dict] = []
    gold: list[dict] = []
    nd = n_docs or max(indices) + 1
    for i in indices:
        lang = langs[i % len(langs)] if langs else "en"
        filler = fillers[i % len(fillers)] if fillers else []
        page, gold_rows = make_page(
            i,
            seed,
            filler,
            lang=lang,
            head_url=(i % head_every == 0),
            part=part_for(i, nd, n_parts),
        )
        pages.append(page)
        gold.extend(gold_rows)
    return pages, gold
