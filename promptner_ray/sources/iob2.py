"""IOB2 dataset source/sink (reference S1/S2: ``data.py:18-105``).

``word\\ttag`` lines, blank-line sentence boundaries.  The parse itself is
the shared pure kernel :func:`parse_iob2_text`; the Ray source reads whole
files (sentence boundaries must not straddle block splits, and NER fixture
files are small — the 100-TB path is the Parquet pages table, not IOB2)
and explodes them into sentence rows via ``flat_map``-style ``map_batches``.

Semantics mirrored from the reference reader:

* classic ``B-X``/``I-X`` runs fold into entity surfaces; a tag containing
  ``-`` inside the *type name* (FewNERD ``maintype-subtype``) carries no
  B/I prefix and adjacent equal tags fold into one entity
  (``data.py:60-80``).
* FewNERD normalization ``government/governmentagency`` → ``government``
  (``data.py:79-80``).
* The reference's ``tag.split() == "O"`` quirk (``data.py:60``, a list
  compared to a str, always False) means "O" rows flow through the
  no-dash branch — observable behavior is simply "O ends any entity",
  which is what this kernel implements directly.

Output schema matches the engine's sentence-record table (SURVEY.md §1.2):
``text`` (space-joined tokens), ``tokens``, ``entities``, ``etypes``
(parallel list — NOT the reference's collision-lossy dict, SURVEY.md
§1.2 mapping notes), ``bio``.
"""

from __future__ import annotations

import pathlib

import pyarrow as pa

SENTENCE_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("sent_id", pa.int32()),
        ("text", pa.string()),
        ("tokens", pa.list_(pa.string())),
        ("entities", pa.list_(pa.string())),
        ("etypes", pa.list_(pa.string())),
        ("bio", pa.list_(pa.string())),
    ]
)

_FEWNERD_NORMALIZE = {"government/governmentagency": "government"}


def _normalize_tag(tag: str) -> str:
    if "-" in tag and not tag.startswith(("B-", "I-")):
        main, _, sub = tag.partition("-")
        sub = _FEWNERD_NORMALIZE.get(sub, sub)
        return f"{main}-{sub}"
    return tag


def parse_iob2_text(content: str) -> list[dict]:
    """One IOB2 file → sentence rows (pure kernel, no Ray)."""
    from ..kernels.bio import decode_bio

    sentences: list[dict] = []
    tokens: list[str] = []
    tags: list[str] = []

    def flush() -> None:
        nonlocal tokens, tags
        if tokens:
            entities, pairs = decode_bio(tokens, tags)
            sentences.append(
                {
                    "sent_id": len(sentences),
                    "text": " ".join(tokens),
                    "tokens": list(tokens),
                    "entities": entities,
                    "etypes": [t for _, t in pairs],
                    "bio": list(tags),
                }
            )
        tokens, tags = [], []

    for raw in content.split("\n"):
        line = raw.rstrip("\r")
        if not line.strip():
            flush()
            continue
        word, _, tag = line.partition("\t")
        if not tag:
            parts = line.rsplit(" ", 1)
            word, tag = (parts[0], parts[1]) if len(parts) == 2 else (line, "O")
        tokens.append(word)
        tags.append(_normalize_tag(tag.strip()))
    flush()
    return sentences


def _parse_files_batch(batch: pa.Table) -> pa.Table:
    rows: list[dict] = []
    for path, data in zip(
        batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
    ):
        name = pathlib.Path(path).name
        for row in parse_iob2_text(data.decode("utf-8")):
            rows.append({"source": name, **row})
    return pa.Table.from_pylist(rows, schema=SENTENCE_SCHEMA)


def read_iob2(paths: list[str] | str):
    """IOB2 file(s) → sentence-record Dataset.

    Whole-file read (``read_binary_files(include_paths=True)``) so sentence
    boundaries never straddle blocks; one task per file.
    """
    import ray

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(_parse_files_batch, batch_format="pyarrow")


def write_iob2(rows: list[dict], path: str | pathlib.Path) -> None:
    """Sentence rows → IOB2 text file (reference ``write_ob2``,
    ``data.py:91-105``): ``word\\ttag`` lines, blank line per sentence."""
    lines: list[str] = []
    for row in rows:
        for tok, tag in zip(row["tokens"], row["bio"]):
            lines.append(f"{tok}\t{tag}")
        lines.append("")
    pathlib.Path(path).write_text("\n".join(lines) + "\n", encoding="utf-8")
