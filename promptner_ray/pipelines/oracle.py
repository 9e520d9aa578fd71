"""Single-process oracle: the same extraction semantics with zero Ray.

Runs the identical kernels (extract → gate → split → stub-model detect →
triple induction → canonicalization) in one thread over the same
deterministic corpus, giving the ground truth for the distributed pipeline's
triple P/R ≥ 0.95 gate (BASELINE.md).  Any parallelism-induced divergence in
the Ray pipeline shows up as a P/R drop against this.
"""

from __future__ import annotations

from collections import Counter

from .. import synth
from ..configs import make_task_spec
from ..kernels.cleaning import normalize_surface, surface_hash64
from ..kernels.textextract import extract_text
from ..model import make_model
from ..stages.detect import detect_mentions_in_text
from ..stages.induce import induce_triples_for_sentence


def oracle_run(
    n_docs: int,
    seed: int = 42,
    sf_dir: str = "/root/testdata/sf0.001",
    task: str = "conll",
    lang: str = "en",
) -> dict:
    """Full single-process run; returns mentions/triples/links/edges."""
    from ..sources.corpus import _load_filler

    langs, fillers = _load_filler(sf_dir)
    spec = make_task_spec(task=task)
    model = make_model("stub")

    mentions: list[tuple] = []
    triples: list[tuple] = []
    for i in range(n_docs):
        page, _ = synth.make_page(
            i,
            seed,
            fillers[i % len(fillers)] if fillers else [],
            lang=langs[i % len(langs)] if langs else "en",
            head_url=(i % 97 == 0),
            part=synth.part_for(i, n_docs),
        )
        text = extract_text(page["html"])
        assert text == page["text"], f"byte-identity broken for {page['url']}"
        if page["lang"] != lang:
            continue
        for sent_id, line in enumerate(text.split("\n")):
            if not line:
                continue
            ms = detect_mentions_in_text(line, model, spec)
            for m in ms:
                mentions.append(
                    (page["url"], sent_id, m["surface"], m["mtype"])
                )
            tokens = line.split(" ")
            for subj, pred, obj, st, ot in induce_triples_for_sentence(
                tokens, ms
            ):
                triples.append((page["url"], sent_id, subj, pred, obj))

    link_counts: Counter[str] = Counter()
    canon_counts: dict[str, Counter] = {}
    for _, _, surface, _ in mentions:
        norm = normalize_surface(surface)
        if not norm:
            continue
        link_counts[norm] += 1
        canon_counts.setdefault(norm, Counter())[surface] += 1
    links = {
        norm: (
            min(c, key=lambda s: (-c[s], s)),
            surface_hash64(norm),
            n,
        )
        for norm, n in link_counts.items()
        for c in [canon_counts[norm]]
    }
    edge_counts: Counter[tuple] = Counter()
    for _, _, subj, pred, obj in triples:
        edge_counts[
            (
                surface_hash64(normalize_surface(subj)),
                pred,
                surface_hash64(normalize_surface(obj)),
            )
        ] += 1
    return {
        "mentions": mentions,
        "triples": triples,
        "links": links,
        "edges": dict(edge_counts),
    }


def triple_prf(
    predicted: list[tuple], reference: list[tuple]
) -> dict[str, float]:
    """Multiset P/R/F1 over (url, sent_id, subj, pred, obj) triples."""
    p_counts = Counter(predicted)
    r_counts = Counter(reference)
    tp = sum(min(n, r_counts.get(t, 0)) for t, n in p_counts.items())
    prec = tp / sum(p_counts.values()) if p_counts else 0.0
    rec = tp / sum(r_counts.values()) if r_counts else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1}
