"""M18 human-survey tooling (reference ``eval.py:100-297``) Ray-Data-first.

The reference assembles an MTurk A/B survey from per-dataset eval frames
with unseeded ``random``/``np.random`` calls and writes one CSV per
worker, then aggregates the returned judgments with nested driver-side
loops.  Here the same surface is re-expressed so it still works when the
eval corpus is huge and the judgment stream is millions of rows:

* **Candidate derivation runs distributed** (`survey_candidates`): the
  skip-list filter, the keep-15%-of-perfect-rows gate, list dedup, the
  blind A/B flip and the sampling rank are all PURE per-row functions of
  an md5 hash keyed on ``(seed, dataset, sentence)`` — reproducible
  across runs, engines and cluster sizes (same idiom as
  :mod:`..functions.sampling`), where the reference draws from global
  RNG state.
* **Stratified sampling is a bounded per-group top-N** (smallest rank
  hash per dataset), so the driver only ever collects
  ``n_datasets × examples_per_dataset`` rows no matter how large the
  eval table is.
* **Worker assignment** (`assign_workers`) replicates the reference's
  greedy capacity-capped round-robin (``eval.py:158-172``) but picks
  workers by hash order instead of ``np.random.choice``, and returns one
  tidy frame with a ``worker`` column instead of ten loose CSVs
  (`write_survey_csvs` still emits the reference's file layout).
* **Response aggregation runs distributed** (`aggregate_responses`):
  majority vote + agreement + missing/extra means per example
  (reference ``process_batch_row``/``summarize``, ``eval.py:215-240``,
  ``243-253``) as one vectorized partial + a
  :func:`..shuffle.hash_grouped` exchange — one row per example crosses
  the shuffle, never the raw judgments.

Semantics notes vs the reference:

* mode tie-break: ``pd.Series.value_counts().index[0]`` resolves ties by
  first appearance; here the EARLIEST response (lowest ``resp_order``)
  wins — same "first seen" spirit, but well-defined under distribution.
* agreement: 1 when all responses agree, 0 on a 2-response split, 0.5
  otherwise — exactly the reference's three branches.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# Quoted survey prompt config (reference eval.py:100-107) — data, not code.
DEF_PRE = "Named entities are phrases that represent the name of a "
DEFN_MAP = {
    "ai": "field, task, product, algorithm, researcher, metrics, "
    "university, country, person, organization or location",
    "lit": "book, writer, award, poem, event, magazine, person, location, "
    "organization, country, miscellaneous",
    "music": "music genre, song, band, album, musical artist, musical "
    "instrument, award, event, country, location, organization or person",
    "pol": "politician, person, organization, political party, event, "
    "election, country or location",
    "science": "scientist, person, university, organization, country, "
    "location, discipline, enzyme, protein, chemical compound, chemical "
    "element, event, astronomical object, academic journal, award or theory",
    "conll": "person, organization or location",
}
_GENERIC_DEFN = "person, organization or location"

SKIP_DATASETS = ("fewnerd", "conll")
KEEP_PERFECT_FRACTION = 0.15  # reference keeps f1==1 rows w.p. 0.15


def _u01(*parts) -> float:
    """Deterministic uniform in [0,1) from the md5 of the joined parts."""
    digest = hashlib.md5(
        ":".join(str(p) for p in parts).encode("utf-8")
    ).digest()[:8]
    return int.from_bytes(digest, "big") / 2**64


def _dedup_shuffled(items: list[str], key: str, seed: int) -> list[str]:
    """set() + np.random.shuffle of the reference, deterministically:
    unique items ordered by a per-item hash."""
    return sorted(set(items), key=lambda it: _u01("item", seed, key, it))


_CAND_SCHEMA = pa.schema(
    [
        ("defn", pa.string()),
        ("sentence", pa.string()),
        ("list1", pa.string()),
        ("list2", pa.string()),
        ("gptlist", pa.int64()),
        ("f1", pa.float64()),
        ("dataset", pa.string()),
        ("rank", pa.float64()),
    ]
)


def _candidates_batch(batch: pa.Table, seed: int, skip: tuple) -> pa.Table:
    rows = []
    for ds_name, para, preds, ents, f1 in zip(
        batch.column("dataset").to_pylist(),
        batch.column("para").to_pylist(),
        batch.column("preds").to_pylist(),
        batch.column("entities").to_pylist(),
        batch.column("f1").to_pylist(),
    ):
        if ds_name in skip:
            continue
        key = f"{ds_name}:{para}"
        if f1 == 1 and _u01("keep", seed, key) >= KEEP_PERFECT_FRACTION:
            continue
        true = _dedup_shuffled(list(ents or ()), key, seed)
        if not true:
            continue
        pred = _dedup_shuffled(list(preds or ()), key, seed)
        pred_s, true_s = ", ".join(pred), ", ".join(true)
        if _u01("flip", seed, key) > 0.5:
            gptlist, list1, list2 = 1, pred_s, true_s
        else:
            gptlist, list1, list2 = 2, true_s, pred_s
        rows.append(
            {
                "defn": DEF_PRE + DEFN_MAP.get(ds_name, _GENERIC_DEFN),
                "sentence": para,
                "list1": list1,
                "list2": list2,
                "gptlist": gptlist,
                "f1": float(f1),
                "dataset": ds_name,
                "rank": _u01("rank", seed, key),
            }
        )
    if not rows:
        return _CAND_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=_CAND_SCHEMA)


def survey_candidates(results, seed: int = 0, skip: tuple = SKIP_DATASETS):
    """results (dataset, para, preds, entities, f1) → blinded candidate
    rows (reference ``eval.py:110-146``), fully distributed."""
    return results.map_batches(
        _candidates_batch,
        fn_kwargs={"seed": seed, "skip": tuple(skip)},
        batch_format="pyarrow",
    )


def survey_format(
    results,
    seed: int = 0,
    examples_per_dataset: int = 20,
    n_attentions: int = 2,
    n_workers: int = 10,
    n_examples_per_worker: int = 30,
    skip: tuple = SKIP_DATASETS,
):
    """Reference ``get_survey_format`` (``eval.py:110-176``).

    Returns ``(survey_df, assignments_df)``: the shuffled id-stamped
    survey table, and one row per (worker, example) including each
    worker's attention checks (``id == -1``).  Only
    ``n_datasets × examples_per_dataset`` sampled rows plus a
    ``n_workers × n_attentions``-bounded attention pool ever reach the
    driver.
    """
    cands = survey_candidates(results, seed=seed, skip=skip)

    def top_n(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("rank").to_numpy())
        return group.take(order[:examples_per_dataset])

    sampled = (
        cands.filter(expr="f1 != 1.0")
        .groupby("dataset")
        .map_groups(top_n, batch_format="pyarrow")
    )
    attn_pool = (
        cands.filter(expr="f1 == 1.0")
        .sort("rank")
        .limit(max(n_workers * n_attentions, n_attentions))
    )

    survey_df = sampled.to_pandas()
    # global shuffle = order by the rank hash; id = position (eval.py:155-157)
    survey_df = survey_df.sort_values("rank", kind="stable").reset_index(
        drop=True
    )
    survey_df["id"] = survey_df.index
    attn_df = attn_pool.to_pandas()
    attn_df["id"] = -1

    assignments_df = assign_workers(
        survey_df,
        attn_df,
        seed=seed,
        n_attentions=n_attentions,
        n_workers=n_workers,
        n_examples_per_worker=n_examples_per_worker,
    )
    return survey_df.drop(columns=["rank"]), assignments_df


def assign_workers(
    survey_df: pd.DataFrame,
    attn_df: pd.DataFrame,
    seed: int = 0,
    n_attentions: int = 2,
    n_workers: int = 10,
    n_examples_per_worker: int = 30,
) -> pd.DataFrame:
    """Greedy capacity-capped assignment (reference ``eval.py:158-172``):
    each example goes to ``workers_per_example`` distinct workers, a
    worker leaves the pool at ``n_examples_per_worker`` rows, the pool
    refills when it gets too small; each worker then receives
    ``n_attentions`` attention rows.  Worker choice is by hash order
    (deterministic) instead of ``np.random.choice``."""
    n_examples = len(survey_df)
    out_frames = []
    if n_examples:
        workers_per_example = min(
            max((n_examples_per_worker * n_workers) // n_examples, 1),
            n_workers,
        )
        loads = {w: 0 for w in range(n_workers)}
        pool = list(range(n_workers))
        picks: list[tuple[int, int]] = []  # (worker, survey row position)
        for pos in range(n_examples):
            ex_id = int(survey_df["id"].iloc[pos])
            chosen = sorted(
                pool, key=lambda w: _u01("assign", seed, ex_id, w)
            )[:workers_per_example]
            for w in chosen:
                picks.append((w, pos))
                loads[w] += 1
                if loads[w] >= n_examples_per_worker and w in pool:
                    pool.remove(w)
            if len(pool) < workers_per_example:
                pool = list(range(n_workers))  # refill, as eval.py:171-172
        for w, pos in picks:
            row = survey_df.iloc[[pos]].copy()
            row["worker"] = w
            out_frames.append(row)
    for w in range(n_workers):
        if len(attn_df) == 0:
            break
        order = sorted(
            range(len(attn_df)),
            key=lambda i: _u01("attn", seed, w, i),
        )[:n_attentions]
        rows = attn_df.iloc[order].copy()
        rows["worker"] = w
        out_frames.append(rows)
    if not out_frames:
        cols = list(survey_df.columns) + ["worker"]
        return pd.DataFrame(columns=cols)
    out = pd.concat(out_frames, ignore_index=True)
    # per-worker presentation shuffle (eval.py:174), deterministic
    out["_ord"] = [
        _u01("present", seed, w, i)
        for i, w in zip(out["id"], out["worker"])
    ]
    out = (
        out.sort_values(["worker", "_ord"], kind="stable")
        .drop(columns=["_ord", "rank"], errors="ignore")
        .reset_index(drop=True)
    )
    return out


def write_survey_csvs(
    survey_df: pd.DataFrame,
    assignments_df: pd.DataFrame,
    out_dir,
    save_name: str = "survey_data",
) -> list[str]:
    """Reference file layout (``eval.py:156-175``): ``<save_name>.csv``
    plus one ``<save_name>_<worker>.csv`` per worker."""
    import pathlib

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = [str(out_dir / f"{save_name}.csv")]
    survey_df.to_csv(paths[0], index=False)
    for w, grp in assignments_df.groupby("worker"):
        p = str(out_dir / f"{save_name}_{w}.csv")
        grp.drop(columns=["worker"]).to_csv(p, index=False)
        paths.append(p)
    return paths


# MTurk export boilerplate columns (reference eval.py:187-195).
_TURK_META_COLS = [
    "HITId", "HITTypeId", "Title", "Description", "Keywords", "Reward",
    "CreationTime", "MaxAssignments", "RequesterAnnotation",
    "AssignmentDurationInSeconds", "AutoApprovalDelayInSeconds",
    "Expiration", "NumberOfSimilarHITs", "LifetimeInSeconds",
    "AssignmentId", "WorkerId", "AssignmentStatus", "AcceptTime",
    "SubmitTime", "AutoApprovalTime", "ApprovalTime", "RejectionTime",
    "RequesterFeedback", "WorkTimeInSeconds", "LifetimeApprovalRate",
    "Last30DaysApprovalRate", "Last7DaysApprovalRate",
]


def process_batch_frame(batch: pd.DataFrame) -> pd.DataFrame:
    """Reference ``process_batch`` (``eval.py:185-206``): strip the MTurk
    boilerplate columns and flatten ``Input.x``/``Answer.x`` to ``x``."""
    batch = batch.drop(
        columns=[c for c in _TURK_META_COLS if c in batch.columns]
    )
    renames = {
        c: c.split(".", 1)[1]
        for c in batch.columns
        if c.startswith(("Input.", "Answer."))
    }
    return batch.rename(columns=renames)


def read_turk_batches(
    survey_dir,
    turk_name: str = "survey_result",
    n_workers: int | None = None,
):
    """Per-worker MTurk batch-result CSVs → one judgment Dataset ready
    for :func:`aggregate_responses` (reference ``connect_turk_output``,
    ``eval.py:209-213``, which concatenates ``{turk_name}_{w}.csv`` for
    w in range(n_workers)).

    ``n_workers=None`` globs every ``{turk_name}_*.csv`` under
    ``survey_dir``.  Files are read driver-side with pandas on purpose:
    Turk batch results are human-sized (one row per paid judgment — the
    reference's whole survey is 10 files), so a distributed read would
    be ceremony; the DISTRIBUTED stage is the aggregation that follows.
    ``resp_order`` is the (worker, row-in-file) lexicographic rank —
    the "earliest response" tie-break the aggregation's grouped Min
    needs, well-defined and reproducible across runs.
    """
    import pathlib

    import ray

    root = pathlib.Path(survey_dir)
    if n_workers is None:
        files = sorted(
            root.glob(f"{turk_name}_*.csv"),
            key=lambda p: int(p.stem.rsplit("_", 1)[1]),
        )
    else:
        files = [root / f"{turk_name}_{w}.csv" for w in range(n_workers)]
    frames = []
    order0 = 0
    for f in files:
        frame = process_batch_frame(pd.read_csv(f))
        frame["resp_order"] = range(order0, order0 + len(frame))
        order0 += len(frame)
        frames.append(frame)
    if not frames:
        raise FileNotFoundError(
            f"no {turk_name}_*.csv batch files under {root}"
        )
    return ray.data.from_pandas(pd.concat(frames, ignore_index=True))


# ---------------------------------------------------------------------------
# MTurk submission/collection client (the gap between write_survey_csvs
# and read_turk_batches)
# ---------------------------------------------------------------------------

_TURK_ANSWER_FIELDS = (
    "l1correct", "l2correct", "better",
    "l1missing", "l1extra", "l2missing", "l2extra",
)


def _no_network_transport(op: str, payload: dict) -> dict:
    raise NotImplementedError(
        "TurkSubmissionClient has no live transport in this environment "
        "(no network): inject a transport callable wrapping the MTurk "
        "requester API, or use LocalTurkTransport for a deterministic "
        "in-process double.  The reference itself (eval.py:254-297) "
        "worked from batch CSVs downloaded out of band."
    )


class LocalTurkTransport:
    """Deterministic in-process stand-in for the MTurk requester API:
    every submitted HIT is 'answered' immediately with hash-derived
    worker judgments (the same ``_u01`` digest scheme the sampler and
    assigner use), so the full submit → poll → download →
    :func:`read_turk_batches` → :func:`aggregate_responses` loop is
    executable and testable without a network."""

    def __init__(self, seed: int = 0) -> None:
        self.seed = seed
        self._hits: dict[str, dict] = {}

    def __call__(self, op: str, payload: dict) -> dict:
        if op == "create_hit":
            hit_id = f"HIT{len(self._hits):06d}"
            self._hits[hit_id] = dict(payload)
            return {"hit_id": hit_id}
        if op == "list_assignments":
            hit = self._hits[payload["hit_id"]]
            ex_id = int(hit["inputs"]["id"])
            w = int(hit["worker"])
            ans = {
                "l1correct": int(_u01("l1c", self.seed, ex_id, w) < 0.5),
                "l2correct": int(_u01("l2c", self.seed, ex_id, w) < 0.5),
                "better": 1 + int(_u01("bet", self.seed, ex_id, w) < 0.5),
                "l1missing": (
                    "a,b" if _u01("l1m", self.seed, ex_id, w) < 0.3 else ""
                ),
                "l1extra": "",
                "l2missing": "",
                "l2extra": (
                    "c" if _u01("l2e", self.seed, ex_id, w) < 0.3 else ""
                ),
            }
            return {
                "assignments": [
                    {"status": "Submitted", "answers": ans}
                ]
            }
        raise ValueError(f"unknown op {op!r}")


class TurkSubmissionClient:
    """Submission/collection lifecycle for the paid-MTurk survey.

    The reference's survey analysis (``eval.py:254-297``) starts from
    batch-result CSVs a human downloaded from the MTurk console; this
    client covers the two steps in between — submit one HIT per
    (worker, example) assignment row, then collect the responses into
    exactly the per-worker ``{turk_name}_{w}.csv`` layout
    :func:`read_turk_batches` consumes.  The wire protocol is an
    injected ``transport(op, payload) -> dict`` callable; the default
    raises (no network in this environment — a half-implemented AWS
    signer would be worse than an explicit seam).
    """

    def __init__(self, transport=None, title: str = "Compare entity lists",
                 reward: str = "0.10") -> None:
        self.transport = transport or _no_network_transport
        self.title = title
        self.reward = reward
        # hit_id -> (worker, input row dict)
        self._submitted: dict[str, tuple[int, dict]] = {}

    def submit_hits(self, assignments_df: pd.DataFrame) -> list[str]:
        """One HIT per assignment row (columns: ``worker`` + the survey
        input columns).  Returns the created HIT ids in row order."""
        hit_ids = []
        input_cols = [c for c in assignments_df.columns if c != "worker"]
        for _, row in assignments_df.iterrows():
            inputs = {c: row[c] for c in input_cols}
            resp = self.transport(
                "create_hit",
                {
                    "title": self.title,
                    "reward": self.reward,
                    "worker": int(row["worker"]),
                    "inputs": inputs,
                },
            )
            self._submitted[resp["hit_id"]] = (int(row["worker"]), inputs)
            hit_ids.append(resp["hit_id"])
        return hit_ids

    def collect_batches(
        self, out_dir, turk_name: str = "survey_result"
    ) -> list[str]:
        """Poll every submitted HIT and write the per-worker batch-result
        CSVs (``Input.*``/``Answer.*`` + minimal boilerplate) under
        ``out_dir`` — the exact format :func:`read_turk_batches` reads."""
        import pathlib

        out_dir = pathlib.Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        rows_by_worker: dict[int, list[dict]] = {}
        for hit_id, (worker, inputs) in self._submitted.items():
            resp = self.transport("list_assignments", {"hit_id": hit_id})
            for a in resp["assignments"]:
                row = {
                    "HITId": hit_id,
                    "WorkerId": f"W{worker}",
                    "AssignmentStatus": a.get("status", "Submitted"),
                }
                row.update({f"Input.{k}": v for k, v in inputs.items()})
                row.update(
                    {f"Answer.{k}": a["answers"].get(k, "")
                     for k in _TURK_ANSWER_FIELDS}
                )
                rows_by_worker.setdefault(worker, []).append(row)
        paths = []
        for w in sorted(rows_by_worker):
            p = str(out_dir / f"{turk_name}_{w}.csv")
            pd.DataFrame(rows_by_worker[w]).to_csv(p, index=False)
            paths.append(p)
        return paths


_BIN_METRICS = ("gptcorrect", "truecorrect", "gptbetter", "gptworse")
_MEAN_METRICS = ("gptmissing", "gptextra", "truemissing", "trueextra")


def _responses_partial(batch: pa.Table) -> pa.Table:
    """One response row → the 8 per-judgment measures of the reference's
    ``process_batch_row`` (``eval.py:215-240``), vectorized."""
    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "id": pa.array([], type=pa.int64()),
                "resp_order": pa.array([], type=pa.int64()),
                **{m: pa.array([], type=pa.int64()) for m in _BIN_METRICS},
                **{m: pa.array([], type=pa.int64()) for m in _MEAN_METRICS},
            }
        )
    gptno = batch.column("gptlist").to_numpy(zero_copy_only=False).astype(np.int64)
    trueno = np.where(gptno == 2, 1, 2)
    l1c = batch.column("l1correct").to_numpy(zero_copy_only=False).astype(np.int64)
    l2c = batch.column("l2correct").to_numpy(zero_copy_only=False).astype(np.int64)
    better = batch.column("better").to_numpy(zero_copy_only=False).astype(np.int64)

    def n_items(col: str) -> np.ndarray:
        vals = batch.column(col).to_pylist()
        return np.array(
            [
                len(v.split(",")) if isinstance(v, str) and v != "" else 0
                for v in vals
            ],
            dtype=np.int64,
        )

    l1m, l2m = n_items("l1missing"), n_items("l2missing")
    l1e, l2e = n_items("l1extra"), n_items("l2extra")
    pick = lambda a, b, no: np.where(no == 1, a, b)  # noqa: E731
    return pa.table(
        {
            "id": batch.column("id").cast(pa.int64()),
            "resp_order": batch.column("resp_order").cast(pa.int64()),
            "gptcorrect": pa.array(pick(l1c, l2c, gptno), type=pa.int64()),
            "truecorrect": pa.array(pick(l1c, l2c, trueno), type=pa.int64()),
            "gptbetter": pa.array(
                (better == gptno).astype(np.int64), type=pa.int64()
            ),
            "gptworse": pa.array(
                (better == trueno).astype(np.int64), type=pa.int64()
            ),
            "gptmissing": pa.array(pick(l1m, l2m, gptno), type=pa.int64()),
            "gptextra": pa.array(pick(l1e, l2e, gptno), type=pa.int64()),
            "truemissing": pa.array(pick(l1m, l2m, trueno), type=pa.int64()),
            "trueextra": pa.array(pick(l1e, l2e, trueno), type=pa.int64()),
        }
    )


def aggregate_responses(responses, num_partitions: int | None = None):
    """Judgment stream → one row per example id (reference
    ``process_turk``, ``eval.py:255-283``).

    Input columns: ``id, resp_order, gptlist, l1correct, l2correct,
    better, l1missing, l1extra, l2missing, l2extra``.  Output per id:
    ``num``, and for each binary metric its majority ``<m>`` +
    ``<m>_agreement``, plus the four missing/extra means.

    Shuffle volume is one aggregate row per example: the per-response
    measures and the tie-break packing (``resp_order*2 + value``, so a
    grouped Min recovers the earliest response's value) are computed
    map-side; :func:`..shuffle.hash_grouped` moves only the partials.
    """
    from ..shuffle import hash_grouped

    def pack(batch: pa.Table) -> pa.Table:
        t = _responses_partial(batch)
        if len(t) == 0:
            cols = {c: t.column(c) for c in t.column_names}
            for m in _BIN_METRICS:
                cols[f"{m}_tie"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        order = t.column("resp_order").to_numpy()
        cols = {c: t.column(c) for c in t.column_names}
        for m in _BIN_METRICS:
            v = t.column(m).to_numpy()
            cols[f"{m}_tie"] = pa.array(order * 2 + v, type=pa.int64())
        return pa.table(cols)

    packed = responses.map_batches(pack, batch_format="pyarrow")
    aggs = (
        [([], "count_all")]
        + [(m, "sum") for m in _BIN_METRICS + _MEAN_METRICS]
        + [(f"{m}_tie", "min") for m in _BIN_METRICS]
    )
    grouped = hash_grouped(
        packed,
        ["id"],
        aggs,
        rename={"count_all": "num"},
        num_partitions=num_partitions,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            names = (
                ["id", "num"]
                + [x for m in _BIN_METRICS for x in (m, f"{m}_agreement")]
                + list(_MEAN_METRICS)
            )
            return pa.table(
                {
                    "id": pa.array([], type=pa.int64()),
                    "num": pa.array([], type=pa.int64()),
                    **{
                        n: pa.array(
                            [],
                            type=pa.int64()
                            if not n.endswith("agreement")
                            and n in _BIN_METRICS
                            else pa.float64(),
                        )
                        for n in names
                        if n not in ("id", "num")
                    },
                }
            )
        n = batch.column("num").to_numpy()
        cols = {
            "id": batch.column("id"),
            "num": batch.column("num"),
        }
        for m in _BIN_METRICS:
            k = batch.column(f"{m}_sum").to_numpy()
            tie_val = batch.column(f"{m}_tie_min").to_numpy() & 1
            mode = np.where(k * 2 > n, 1, np.where(k * 2 < n, 0, tie_val))
            agreement = np.where(
                (k == 0) | (k == n),
                1.0,
                np.where(n == 2, 0.0, 0.5),
            )
            cols[m] = pa.array(mode, type=pa.int64())
            cols[f"{m}_agreement"] = pa.array(agreement, type=pa.float64())
        for m in _MEAN_METRICS:
            cols[m] = pa.array(
                batch.column(f"{m}_sum").to_numpy() / n, type=pa.float64()
            )
        return pa.table(cols)

    return grouped.map_batches(finalize, batch_format="pyarrow")
