"""Tagged-dataset connectors (reference S3–S6: ``data.py:108-309``).

The reference pulls TweetNER7 / FabNER / CoNLL-2003 / OntoNotes from the
HuggingFace hub and decodes integer BIO tags inline, four near-identical
copies (``data.py:139-157, 202-219, 242-259, 285-302``).  Here the decode
is ONE shared vectorized batch kernel over the hub datasets' on-disk
schema — ``tokens: list<string>``, ``tags: list<int>`` — read from local
Parquet fixtures (this sandbox has no network; a hub snapshot saved with
``datasets.Dataset.to_parquet`` has exactly this schema, so the connector
works unchanged against real snapshots).

Tag maps are the public id→label tables of each dataset (identical to the
reference's inline dicts).  Output is the engine's sentence-record table
(text, tokens, entities, etypes, bio) — ``etypes`` is a parallel list, not
the reference's collision-lossy surface→type dict (SURVEY.md §1.2).

TweetNER quirk: tweet tokens may themselves contain spaces after
detokenization, so ``text.split(" ")`` ≠ ``tokens``; the reference carries
``true_tokens`` for this (``data.py:109-132``) — here ``tokens`` IS the
true token list, carried explicitly for every dataset.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.bio import decode_bio
from .iob2 import SENTENCE_SCHEMA

TWEETNER_TAGS = {
    0: "B-corporation", 1: "B-creative_work", 2: "B-event", 3: "B-group",
    4: "B-location", 5: "B-person", 6: "B-product", 7: "I-corporation",
    8: "I-creative_work", 9: "I-event", 10: "I-group", 11: "I-location",
    12: "I-person", 13: "I-product", 14: "O",
}

FABNER_TAGS = {
    0: "O", 1: "B-MATE", 2: "I-MATE", 3: "B-MANP", 4: "I-MANP",
    5: "B-MACEQ", 6: "I-MACEQ", 7: "B-APPL", 8: "I-APPL", 9: "B-FEAT",
    10: "I-FEAT", 11: "B-PRO", 12: "I-PRO", 13: "B-CHAR", 14: "I-CHAR",
    15: "B-PARA", 16: "I-PARA", 17: "B-ENAT", 18: "I-ENAT", 19: "B-CONPRI",
    20: "I-CONPRI", 21: "B-MANS", 22: "I-MANS", 23: "B-BIOP", 24: "I-BIOP",
}

CONLL_TAGS = {
    0: "O", 1: "B-PER", 2: "I-PER", 3: "B-ORG", 4: "I-ORG",
    5: "B-LOC", 6: "I-LOC", 7: "B-MISC", 8: "I-MISC",
}

_ONTO_TYPES = (
    "PERSON NORP FAC ORG GPE LOC PRODUCT DATE TIME PERCENT MONEY QUANTITY "
    "ORDINAL CARDINAL EVENT WORK_OF_ART LAW LANGUAGE"
).split()
ONTONOTES_TAGS: dict[int, str] = {0: "O"}
for _i, _t in enumerate(_ONTO_TYPES):
    ONTONOTES_TAGS[1 + 2 * _i] = f"B-{_t}"
    ONTONOTES_TAGS[2 + 2 * _i] = f"I-{_t}"

TAG_MAPS: dict[str, dict[int, str]] = {
    "tweetner": TWEETNER_TAGS,
    "fabner": FABNER_TAGS,
    "conll2003": CONLL_TAGS,
    "ontonotes": ONTONOTES_TAGS,
}


def decode_tagged_rows(
    token_lists: list[list[str]],
    tag_lists: list[list[int]],
    tag_map: dict[int, str],
    source: str,
) -> pa.Table:
    """Shared int-tag decoder: the reference's four inline copies, once."""
    rows = []
    for sent_id, (tokens, tag_ids) in enumerate(zip(token_lists, tag_lists)):
        bio = [tag_map[t] for t in tag_ids]
        entities, pairs = decode_bio(tokens, bio)
        rows.append(
            {
                "source": source,
                "sent_id": sent_id,
                "text": " ".join(tokens),
                "tokens": list(tokens),
                "entities": entities,
                "etypes": [t for _, t in pairs],
                "bio": bio,
            }
        )
    return pa.Table.from_pylist(rows, schema=SENTENCE_SCHEMA)


def read_tagged_parquet(
    path: str,
    dataset: str,
    tokens_col: str = "tokens",
    tags_col: str = "ner_tags",
):
    """HF-snapshot Parquet → sentence-record Dataset (shared decoder)."""
    import ray

    tag_map = TAG_MAPS[dataset]

    def _decode(batch: pa.Table) -> pa.Table:
        return decode_tagged_rows(
            batch.column(tokens_col).to_pylist(),
            batch.column(tags_col).to_pylist(),
            tag_map,
            dataset,
        )

    return ray.data.read_parquet(
        path, columns=[tokens_col, tags_col]
    ).map_batches(_decode, batch_format="pyarrow")


#: Live hub coordinates for each connector (reference ``data.py:128,
#: 163, 226, 266``): (hub id, config, split template, tokens col,
#: tags col).  ``{split}`` expands to the requested split name;
#: tweetner's hub splits carry a year suffix (``data.py:128``).
HUB_COORDS: dict[str, tuple] = {
    "tweetner": ("tner/tweetner7", None, "{split}_2021", "tokens", "tags"),
    "fabner": ("DFKI-SLT/fabner", "fabner_bio", "{split}", "tokens",
               "ner_tags"),
    "conll2003": ("conll2003", None, "{split}", "tokens", "ner_tags"),
}


def read_hf_hub(dataset: str, split: str = "train"):
    """Live HuggingFace-hub connector (reference S3–S6 online path).

    Pulls the dataset with ``datasets.load_dataset`` and feeds the SAME
    shared decoder the parquet fixtures use — the hub rows have exactly
    the fixture schema, so the two paths are one code path after the
    fetch.  Gated behind an import-try: this sandbox has no network and
    no ``datasets`` package, so offline callers get a clear error
    pointing at :func:`read_tagged_parquet` + a saved snapshot instead.
    """
    try:
        from datasets import load_dataset  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - exercised offline
        raise ImportError(
            "read_hf_hub needs the `datasets` package and network access; "
            "offline, save a hub snapshot with Dataset.to_parquet and use "
            "read_tagged_parquet / read_ontonotes_parquet instead"
        ) from exc
    import ray

    if dataset == "ontonotes":  # nested split, own decoder
        rows = load_dataset("conll2012_ontonotesv5", "english_v4")[split]
        ds = ray.data.from_huggingface(rows)

        def _decode_onto(batch: pa.Table) -> pa.Table:
            token_lists: list[list[str]] = []
            tag_lists: list[list[int]] = []
            for sentences in batch.column("sentences").to_pylist():
                for sent in sentences:
                    token_lists.append(sent["words"])
                    tag_lists.append(sent["named_entities"])
            return decode_tagged_rows(
                token_lists, tag_lists, ONTONOTES_TAGS, "ontonotes"
            )

        return ds.map_batches(_decode_onto, batch_format="pyarrow")
    hub_id, config, split_tpl, tokens_col, tags_col = HUB_COORDS[dataset]
    args = (hub_id, config) if config else (hub_id,)
    rows = load_dataset(*args)[split_tpl.format(split=split)]
    tag_map = TAG_MAPS[dataset]

    def _decode(batch: pa.Table) -> pa.Table:
        return decode_tagged_rows(
            batch.column(tokens_col).to_pylist(),
            batch.column(tags_col).to_pylist(),
            tag_map,
            dataset,
        )

    return ray.data.from_huggingface(rows).map_batches(
        _decode, batch_format="pyarrow"
    )


def read_ontonotes_parquet(path: str):
    """OntoNotes snapshot: nested documents flattened to sentence rows
    (reference ``data.py:274-275`` doc→sentences loop → flat-map kernel)."""
    import ray

    def _decode(batch: pa.Table) -> pa.Table:
        token_lists: list[list[str]] = []
        tag_lists: list[list[int]] = []
        for sentences in batch.column("sentences").to_pylist():
            for sent in sentences:
                token_lists.append(sent["words"])
                tag_lists.append(sent["named_entities"])
        return decode_tagged_rows(
            token_lists, tag_lists, ONTONOTES_TAGS, "ontonotes"
        )

    return ray.data.read_parquet(path, columns=["sentences"]).map_batches(
        _decode, batch_format="pyarrow"
    )
