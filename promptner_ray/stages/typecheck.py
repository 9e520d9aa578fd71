"""Second-pass type verification + dispute resolution (reference M15/M16).

Reimplements ``MultiAlgorithm.get_type`` / ``resolve_dispute`` (reference
``algorithms.py:371-401``; task strings from ``Config.set_config``,
``algorithms.py:456-476``) as an OPTIONAL actor-pool stage over the
detected-sentences table: for every mention, ask the model the entity type
again; on disagreement with the first pass, a third dispute query decides;
any unparseable answer falls back to the first-pass type (the reference
``types == -1`` path).

The reference issues one blocking HTTP call per phrase (2–3× its sequential
cost, SURVEY.md §6); here all type queries of a batch go through ONE batched
``model.generate`` call, and dispute queries (the rare case) through a
second.  Note: the reference's ``resolve_dispute`` has a latent NameError
(``answers`` vs ``answer``, ``algorithms.py:395-396``) proving the
completion path never ran; this stage implements the *intended* semantics.
"""

from __future__ import annotations

import pyarrow as pa

from ..configs import make_task_spec
from ..model import make_model
from ..task_data import TASK_DATA
from .detect import MENTION_STRUCT

TYPE_TASK = (
    "Q: Given the paragraph below and the entity phrase, identify what type "
    "the entity is \nParagraph:"
)
DISPUTE_TASK = (
    "Q: Given the paragraph below, the entity phrase and two proposed entity "
    "types, identify what the actual type of the entity is \nParagraph:"
)


def _chain(task: str, exemplars: list[str] | tuple[str, ...]) -> str:
    out = ""
    for ex in exemplars:
        out += task + "\n" + ex + "\n"
    return out + task + "\n"


def _paren_type(answer: str) -> str | None:
    """Type between the first '(' and first ')' — None on failure
    (reference returns -1, ``algorithms.py:381-385``)."""
    if "(" in answer and ")" in answer:
        return answer[answer.find("(") + 1 : answer.find(")")]
    return None


class TypeVerifier:
    """Actor-pool stage: re-query + (optionally) dispute mention types."""

    def __init__(
        self,
        task: str = "conll",
        model_kind: str = "stub",
        model_kwargs: dict | None = None,
        resolve_disputes: bool = True,
    ) -> None:
        self.spec = make_task_spec(task=task)
        data = TASK_DATA[task]
        self.type_prompt_prefix = (
            self.spec.prompt.defn
            + "\n"
            + _chain(TYPE_TASK, data.get("type_exemplars", ()))
        )
        self.dispute_prompt_prefix = (
            self.spec.prompt.defn
            + "\n"
            + _chain(DISPUTE_TASK, data.get("dispute_exemplars", ()))
        )
        self.model = make_model(model_kind, **(model_kwargs or {}))
        self.resolve_disputes = resolve_disputes

    def _type_prompt(self, para: str, phrase: str) -> str:
        return (
            self.type_prompt_prefix
            + f" '{para}' \nEntity Phrase: {phrase} \nAnswer:"
        )

    def _dispute_prompt(
        self, para: str, phrase: str, opt1: str, opt2: str
    ) -> str:
        return (
            self.dispute_prompt_prefix
            + f" '{para}' \nEntity Phrase: {phrase}, "
            + f"Options: ({opt1}), ({opt2}) \nAnswer:"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        mention_lists = batch.column("mentions").to_pylist()

        # pass 1: one batched generate over ALL mentions in the batch
        index: list[tuple[int, int]] = []
        prompts: list[str] = []
        for row_i, (text, mlist) in enumerate(zip(texts, mention_lists)):
            for m_i, m in enumerate(mlist):
                # reference queries the lowercased stripped answer
                # (algorithms.py:299-300 via parse_span's answer handling)
                index.append((row_i, m_i))
                prompts.append(
                    self._type_prompt(text, m["surface"].strip().lower())
                )
        answers = self.model.generate(prompts) if prompts else []

        # pass 2: disputes only where the second opinion disagrees
        disputes: list[tuple[int, int, str]] = []
        d_prompts: list[str] = []
        for (row_i, m_i), ans in zip(index, answers):
            second = _paren_type(ans)
            first = mention_lists[row_i][m_i]["mtype"]
            if second is None or second == first:
                if second is not None:
                    mention_lists[row_i][m_i]["mtype"] = second
                continue
            if not self.resolve_disputes:
                mention_lists[row_i][m_i]["mtype"] = second
                continue
            phrase = mention_lists[row_i][m_i]["surface"].strip().lower()
            disputes.append((row_i, m_i, first))
            d_prompts.append(
                self._dispute_prompt(texts[row_i], phrase, first, second)
            )
        if d_prompts:
            for (row_i, m_i, first), ans in zip(
                disputes, self.model.generate(d_prompts)
            ):
                resolved = _paren_type(ans)
                mention_lists[row_i][m_i]["mtype"] = (
                    resolved if resolved is not None else first
                )

        return pa.table(
            {
                "url": batch.column("url"),
                "sent_id": batch.column("sent_id"),
                "text": batch.column("text"),
                "mentions": pa.array(
                    mention_lists, type=pa.list_(MENTION_STRUCT)
                ),
            }
        )


def verify_types(detected, task: str = "conll", concurrency=(1, 4), **kwargs):
    """detected → detected with second-pass-verified mention types."""
    return detected.map_batches(
        TypeVerifier,
        fn_constructor_kwargs={"task": task, **kwargs},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
