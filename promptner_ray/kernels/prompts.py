"""Prompt assembly: definition + CoT exemplars + format blocks.

Reproduces the reference's prompt construction exactly, re-expressed as an
immutable spec built once at pipeline-build time and broadcast to actors
(instead of mutable fields poked onto an Algorithm object):

* flag grid (exemplar x coT x tf x defn) -> task strings:
  ``Config.set_config`` (reference ``algorithms.py:453-541``);
* completion-mode render: ``defn + "\\n" + exemplar_task + " '{para}' \\nAnswer:"``
  (``algorithms.py:186-193``);
* chat-mode render: system = chatbot_init + defn + " " + whole_task; each
  exemplar split at the literal ``"Answer:"`` (index+7) into a user/assistant
  message pair; final user message ``"\\nParagraph: {para} \\nAnswer:"``
  (``algorithms.py:202-225``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

CHATBOT_INIT = "You are an entity recognition system. "

# The four answer-format blocks (reference algorithms.py:427-451).  Written
# with explicit escapes because they contain significant trailing whitespace
# that editors would strip from a triple-quoted literal.
COT_FORMAT = (
    "\n    Format: \n    \n"
    "    1. First Candidate | True | Explanation why the word is an entity (entity_type)\n"
    "    2. Second Candidate | False | Explanation why the word is not an entity (entity_type)\n    "
)

NO_TF_FORMAT = (
    "\n    1. First Entity | Explanation why the word is an entity (entity_type)\n"
    "    2. Second Entity | Explanation why the word is not an entity (entity_type)\n    "
)

TF_FORMAT = (
    "\n    Format: \n\n"
    "    1. First Candidate | True | (entity_type)\n"
    "    2. Second Candidate | False | (entity_type)\n    "
)

EXEMPLAR_FORMAT = (
    "\n    Format:    \n    \n"
    "    1. First Entity | (entity_type)\n"
    "    2. Second Entity | (entity_type)\n    "
)


@dataclass(frozen=True)
class CompletionPrompt:
    """Lazy completion prompt: shared constant prefix + per-row paragraph.

    ``text`` materializes the exact reference prompt string
    (``algorithms.py:186-193``).  The hot path ships (prefix-ref, para)
    instead of one materialized ~6 KB string per sentence — at millions of
    sentences per node the repeated prefix memcpy saturates DRAM bandwidth
    and caps multicore scaling; clients that need the full string (HTTP
    APIs) call ``.text`` at request time.
    """

    prefix: str
    para: str
    exemplar_mode: bool

    @property
    def text(self) -> str:
        if self.exemplar_mode:
            return self.prefix + f" '{self.para}' \nAnswer:"
        return self.prefix + f"\nParagraph: {self.para} \nAnswer:"


@dataclass(frozen=True)
class PromptSpec:
    """Fully-assembled prompt state for one task configuration.

    Exactly one of ``exemplar_task`` / ``format_task`` is set, mirroring the
    reference's mutually-exclusive Algorithm fields.
    """

    defn: str
    whole_task: str | None = None
    exemplars: tuple[str, ...] = field(default=())
    exemplar_task: str | None = None
    format_task: str | None = None

    @cached_property
    def completion_prefix_parts(self) -> tuple[str, bool]:
        """(shared constant prefix, exemplar-mode flag), built ONCE per spec
        (cached_property writes to __dict__ directly, bypassing frozen)."""
        if self.exemplar_task is not None:
            return self.defn + "\n" + self.exemplar_task, True
        return self.defn + "\n" + self.format_task, False

    def completion_prefix(self) -> tuple[str, bool]:
        return self.completion_prefix_parts

    def render_completion_lazy(self, para: str) -> CompletionPrompt:
        """Lazy prompt for the batch hot path (see :class:`CompletionPrompt`)."""
        prefix, exemplar_mode = self.completion_prefix()
        return CompletionPrompt(prefix, para, exemplar_mode)

    def render_completion(self, para: str) -> str:
        """One prompt string (reference ``algorithms.py:186-193``)."""
        return self.render_completion_lazy(para).text

    def render_chat(self, para: str) -> list[tuple[str, str]]:
        """(content, role) message list (reference ``algorithms.py:202-219``)."""
        if self.exemplar_task is not None:
            msgs = [(CHATBOT_INIT + self.defn + " " + self.whole_task, "system")]
            for ex in self.exemplars:
                if "Answer:" not in ex:
                    raise ValueError(
                        f"Something is wrong, exemplar: \n{ex} \n Does not have an 'Answer:'"
                    )
            for ex in self.exemplars:
                cut = ex.index("Answer:") + len("Answer:")
                msgs.append((ex[: cut].strip(), "user"))
                msgs.append((ex[cut:].strip(), "assistant"))
            msgs.append((f"\nParagraph: {para} \nAnswer:", "user"))
            return msgs
        return [
            (CHATBOT_INIT + self.defn + " " + self.format_task, "system"),
            (f"\nParagraph: {para} \nAnswer:", "user"),
        ]


def _chain(whole_task: str, exemplars: list[str] | tuple[str, ...]) -> str:
    """task+exemplar interleaving ending with a trailing task
    (reference ``algorithms.py:511-516`` pattern)."""
    out = ""
    for ex in exemplars:
        out += whole_task + "\n" + ex + "\n"
    return out + whole_task + "\n"


def build_prompt_spec(
    defn: str,
    cot_exemplars: list[str] | tuple[str, ...] = (),
    no_tf_exemplars: list[str] | tuple[str, ...] = (),
    tf_exemplars: list[str] | tuple[str, ...] = (),
    plain_exemplars: list[str] | tuple[str, ...] = (),
    exemplar: bool = True,
    coT: bool = True,
    tf: bool = True,
    use_defn: bool = True,
) -> PromptSpec:
    """The ``set_config`` flag grid (reference ``algorithms.py:453-541``)."""
    d = defn if use_defn else ""
    if not exemplar:
        if coT:
            if tf:
                whole = (
                    "Q: Given the paragraph below, identify a list of possible entities "
                    "and for each entry explain why it either is or is not an entity. Answer in the format: \n"
                )
                fmt = whole + COT_FORMAT
            else:
                whole = (
                    "Q: Given the paragraph below, identify a list of entities "
                    "and for each entry explain why it is an entity. Answer in the format: \n"
                )
                fmt = whole + NO_TF_FORMAT
        else:
            whole = (
                "Q: Given the paragraph below, identify the list of entities "
                "Answer in the format: \n"
            )
            fmt = whole + (TF_FORMAT if tf else EXEMPLAR_FORMAT)
        return PromptSpec(defn=d, whole_task=whole, format_task=fmt)

    if coT:
        if tf:
            whole = (
                "Q: Given the paragraph below, identify a list of possible entities "
                "and for each entry explain why it either is or is not an entity. \nParagraph:"
            )
            ex = tuple(cot_exemplars)
        else:
            whole = (
                "Q: Given the paragraph below, identify a list of entities "
                "and for each entry explain why it is an entity. \nParagraph:"
            )
            ex = tuple(no_tf_exemplars)
    else:
        whole = "Q: Given the paragraph below, identify the list of entities \nParagraph:"
        ex = tuple(tf_exemplars if tf else plain_exemplars)
    return PromptSpec(
        defn=d, whole_task=whole, exemplars=ex, exemplar_task=_chain(whole, ex)
    )
