"""TaskSpec: validated, immutable task configuration for the extraction stage.

Replaces the reference's mutable ``Algorithm`` + ``Config.set_config`` state
(reference ``algorithms.py:20-29,453-541``) with a frozen spec built once at
pipeline-build time and shipped to actors as a constructor argument.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .kernels.prompts import PromptSpec, build_prompt_spec
from .task_data import TASK_DATA

# Coarse entity-type systems per task (used by the synthetic corpus generator
# and the stub model; mirrors each reference Config's definition text).
TASK_TYPES: dict[str, tuple[str, ...]] = {
    "conll": ("PER", "ORG", "LOC", "MISC"),
    "genia": ("protein", "DNA", "RNA", "cell_type", "cell_line"),
}


@dataclass(frozen=True)
class TaskSpec:
    """Everything the mention-detection stage needs, immutable."""

    name: str
    prompt: PromptSpec
    entity_types: tuple[str, ...] = ()
    separator: str = "|"
    true_only: bool = True
    identify_types: bool = True
    split_phrases: bool = False
    bug_compat: bool = False
    # FewNERD-style tasks use bare "main-sub" tags with no B/I prefix; the
    # span aligner detects this from "-" in the type, but downstream BIO
    # decoding needs to know the tag style explicitly.
    fewnerd_tags: bool = False


def make_task_spec(
    task: str = "conll",
    exemplar: bool = True,
    coT: bool = True,
    tf: bool = True,
    use_defn: bool = True,
    bug_compat: bool = False,
    split_phrases: bool = False,
) -> TaskSpec:
    """Build a TaskSpec from the shipped task data (the reference's
    ``Config().set_config(alg, ...)`` flag grid)."""
    if task not in TASK_DATA:
        raise KeyError(f"unknown task {task!r}; available: {sorted(TASK_DATA)}")
    data = TASK_DATA[task]
    prompt = build_prompt_spec(
        defn=data["defn"],
        cot_exemplars=data.get("cot_exemplars", ()),
        no_tf_exemplars=data.get("no_tf_exemplars", ()),
        tf_exemplars=data.get("tf_exemplars", ()),
        plain_exemplars=data.get("exemplars", ()),
        exemplar=exemplar,
        coT=coT,
        tf=tf,
        use_defn=use_defn,
    )
    return TaskSpec(
        name=task,
        prompt=prompt,
        entity_types=TASK_TYPES.get(task, ()),
        bug_compat=bug_compat,
        split_phrases=split_phrases,
        fewnerd_tags=task.startswith("fewnerd"),
    )
