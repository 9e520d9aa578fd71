"""CLI entry point: ``ray job submit -- python -m promptner_ray.cli …``.

Subcommands::

    synth   --out DIR --n-docs N [--sf-dir D] [--seed S]
    run     --input CORPUS_ROOT --out DIR [--task conll] [--lang en]
            [--wave-size K] [--max-waves W] [--skip-graph]
    eval    --input CORPUS_ROOT --out DIR        # span-F1 vs corpus gold
    save    --input SPLIT_DIR --out DIR          # IOB2 + 5-shot export (S11)
    bench   (use bench.py at the repo root instead)

The driver owns the Ray session: ``main()`` initialises Ray only when no
session exists (``ray job submit`` runs this as the job entrypoint inside
the cluster, where ``ray.init(address="auto")`` attaches).  The ``run``
command is resumable: re-running with the same ``--out`` skips committed
partitions via the lineage manifests.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if "--cluster" in sys.argv else "local")


def cmd_synth(args: argparse.Namespace) -> dict:
    from .sources.corpus import ensure_corpus

    root = ensure_corpus(
        args.out, n_docs=args.n_docs, seed=args.seed, sf_dir=args.sf_dir
    )
    return {"corpus_root": str(root), "n_docs": args.n_docs}


def cmd_run(args: argparse.Namespace) -> dict:
    from .pipelines.kg import KGConfig, run_extraction, run_graph

    cfg = KGConfig(task=args.task, lang=args.lang, wave_size=args.wave_size)
    summary = run_extraction(
        args.input, args.out, cfg, max_waves=args.max_waves
    )
    if not args.skip_graph and args.max_waves is None:
        summary.update(run_graph(args.out))
    return summary


def cmd_save(args: argparse.Namespace) -> dict:
    """S11 per-split export (reference ``save``, ``data.py:378-386``):
    each ``<split>.txt`` IOB2 file in ``--input`` is rewritten under
    ``--out`` (``validation`` renamed ``dev``, reference data.py:381-383)
    together with a seeded ``5shot<split>.txt`` subset covering every
    entity type (``sample_all_types``, reference data.py:385-386)."""
    import pathlib

    from .kernels.autogen import sample_all_types
    from .sources.iob2 import read_iob2, write_iob2

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    summary: dict = {}
    for split_file in sorted(pathlib.Path(args.input).glob("*.txt")):
        split = split_file.stem
        if split == "validation":
            split = "dev"
        rows = read_iob2(str(split_file)).take_all()  # NER splits are small
        write_iob2(rows, out / f"{split}.txt")
        shot = sample_all_types(rows, min_k=args.min_k, seed=args.seed)
        write_iob2(shot, out / f"5shot{split}.txt")
        summary[split] = {"sentences": len(rows), "5shot": len(shot)}
    return summary


def cmd_eval(args: argparse.Namespace) -> dict:
    import pathlib

    import ray

    from .pipelines import kg
    from .pipelines.eval import evaluate_f1
    from .sources.corpus import read_pages

    cfg = kg.KGConfig(task=args.task, lang=args.lang)
    pages = read_pages(
        args.input, columns=["url", "warc_ts", "html", "lang"]
    )
    det = kg.detected(kg.sentences(kg.docs_text(pages, cfg), cfg), cfg)
    gold = ray.data.read_parquet(str(pathlib.Path(args.input) / "gold"))
    return evaluate_f1(det, gold)


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(prog="promptner_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth", help="generate a deterministic pages corpus")
    sp.add_argument("--out", required=True)
    sp.add_argument("--n-docs", type=int, default=4096)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    rp = sub.add_parser("run", help="checkpointed KG build (resumable)")
    rp.add_argument("--input", required=True)
    rp.add_argument("--out", required=True)
    rp.add_argument("--task", default="conll")
    rp.add_argument("--lang", default="en")
    rp.add_argument("--wave-size", type=int, default=16)
    rp.add_argument("--max-waves", type=int, default=None)
    rp.add_argument("--skip-graph", action="store_true")
    rp.add_argument("--cluster", action="store_true")

    ep = sub.add_parser("eval", help="span-F1 of detection vs corpus gold")
    ep.add_argument("--input", required=True)
    ep.add_argument("--task", default="conll")
    ep.add_argument("--lang", default="en")

    vp = sub.add_parser(
        "save", help="per-split IOB2 export + seeded 5-shot subsets"
    )
    vp.add_argument("--input", required=True, help="dir of <split>.txt files")
    vp.add_argument("--out", required=True)
    vp.add_argument("--min-k", type=int, default=5)
    vp.add_argument("--seed", type=int, default=42)

    args = ap.parse_args(argv)
    _ensure_ray()
    out = {
        "synth": cmd_synth,
        "run": cmd_run,
        "eval": cmd_eval,
        "save": cmd_save,
    }[args.cmd](args)
    print(json.dumps(out, default=str))
    return out


if __name__ == "__main__":
    main()
    import ray

    if ray.is_initialized():
        ray.shutdown()
