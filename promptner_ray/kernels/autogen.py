"""CoT-exemplar autogeneration (reference M13/M14, offline driver utility).

Reimplements ``BaseAlgorithm.get_annotation`` / ``generate_annotations`` /
``Config.autogenerate_annotations`` (reference ``algorithms.py:227-279``,
``543-552``): for each token of a gold-labelled sentence, ask the model to
explain in one line why the token is / is not an entity, then render the
numbered ``tok | True/False | explanation(type)`` CoT block.

Differences from the reference (intentional, SURVEY.md §2.2 M14):

* the negative-example cap uses a SEEDED ``random.Random`` (the reference's
  bare ``np.random.choice``, ``algorithms.py:259``, is nondeterministic);
* the stopword set is the frozen module constant, not nltk re-loaded per
  token (``algorithms.py:252``) — same membership for English function
  words used here.

This runs on ≤3 sentences per task (reference ``run.py:80-84``) — a driver
step, not a data-plane operator; it needs no Ray.
"""

from __future__ import annotations

import random
import string

from .stopwords import STOPWORD_SET

ENTITY_TOKEN_TASK = (
    "In the sentence '[sent]'. The phrase '[token]' is an entity of type "
    "[type]. In one line explain why. \nAnswer: The phrase '[token]' is an "
    "entity of type [type] because"
)
NONENTITY_TOKEN_TASK = (
    "In the sentence '[sent]'. The phrase '[token]' is not an entity. In "
    "one line explain why. \nAnswer: The phrase '[token]' is not an entity "
    "because"
)


def render_annotation_prompt(
    defn: str, sent: str, token: str, ner_label: str
) -> str:
    """[sent]/[token]/[type] substitution (reference ``algorithms.py:227-241``)."""
    if ner_label == "O":
        task = NONENTITY_TOKEN_TASK
    else:
        task = ENTITY_TOKEN_TASK.replace("[type]", ner_label)
    task = task.replace("[sent]", sent).replace("[token]", token)
    return defn + "\n" + task


def generate_exemplar(
    model,
    defn: str,
    sent: str,
    tokens: list[str],
    ner_labels: list[str],
    max_falses: int = 3,
    seed: int = 42,
) -> str:
    """One gold sentence → a rendered CoT exemplar block.

    Entity tokens always get an explanation; non-entity tokens are skipped
    when punctuation/stopword/numeric, and at most ``max_falses`` negatives
    survive (seeded choice).  All model queries go through ONE batched
    ``generate`` call.
    """
    keep: list[tuple[int, bool]] = []  # (token index, is_entity)
    false_indices: list[int] = []
    for i, token in enumerate(tokens):
        if ner_labels[i] != "O":
            keep.append((i, True))
        elif (
            token.strip().strip(string.punctuation).strip() == ""
            or token.strip() in STOPWORD_SET
            or token.isnumeric()
        ):
            continue
        else:
            false_indices.append(i)
            keep.append((i, False))
    if len(false_indices) > max_falses:
        chosen = sorted(
            random.Random(seed).sample(false_indices, max_falses)
        )
    else:
        chosen = false_indices

    queried = [
        (i, is_ent)
        for i, is_ent in keep
        if is_ent or i in chosen
    ]
    prompts = [
        render_annotation_prompt(
            defn, sent, tokens[i], ner_labels[i] if is_ent else "O"
        )
        for i, is_ent in queried
    ]
    annots = model.generate(prompts) if prompts else []

    lines = ["Answer: "]
    no = 1
    for (i, is_ent), annot in zip(queried, annots):
        token = tokens[i]
        if is_ent:
            label = ner_labels[i]
            if label[:2] in ("B-", "I-"):
                label = label[2:]
            lines.append(f"{no}. {token} | True | {annot}({label})")
        else:
            lines.append(f"{no}. {token} | False | {annot}")
        no += 1
    return "\n".join(lines)


def sample_all_types(
    rows: list[dict], min_k: int = 5, seed: int = 42
) -> list[dict]:
    """G4 exemplar sampler (reference ``sample_all_types``,
    ``data.py:352-375``): rejection-sample ``k`` sentence rows until the
    sample covers every entity type present in ``rows``; ``k`` grows by one
    every 10 failed attempts.  Seeded (the reference's ``df.sample`` is
    not), so exemplar selection is reproducible across runs.
    """

    def row_types(row: dict) -> set[str]:
        out = set()
        for tag in row["bio"]:
            if tag and tag != "O":
                out.add(tag[2:] if tag[:2] in ("B-", "I-") else tag)
        return out

    total = set()
    for row in rows:
        total |= row_types(row)
    rng = random.Random(seed)
    k = min(min_k, len(rows))
    attempt = 0
    while True:
        sample = rng.sample(rows, k)
        covered = set()
        for row in sample:
            covered |= row_types(row)
        if covered == total:
            return sample
        attempt += 1
        if attempt % 10 == 0 and k < len(rows):
            k += 1


def autogenerate_exemplars(
    model,
    defn: str,
    sentences: list[dict],
    max_examples: int = 3,
    max_falses: int = 3,
    seed: int = 42,
) -> list[str]:
    """Gold sentence rows (text/tokens/bio) → CoT exemplar strings
    (reference ``Config.autogenerate_annotations``, ``algorithms.py:543-552``)."""
    out = []
    for row in sentences[:max_examples]:
        block = generate_exemplar(
            model,
            defn,
            row["text"],
            list(row["tokens"]),
            list(row["bio"]),
            max_falses=max_falses,
            seed=seed,
        )
        out.append("\n" + row["text"] + "\n\n" + block + "\n")
    return out
