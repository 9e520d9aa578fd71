"""Distributed NER evaluation: the reference's sequential seqeval loop
(``run.py:36-52``) as partial+final aggregation (SURVEY.md §2.5 G1).

Plan::

    detected (url, sent_id, text, mentions)
      → pred-BIO batch kernel
      ⋈ gold (url, sent_id, bio)           # hash join on the sentence key
      → per-batch per-type (tp, n_pred, n_truth) partials
      → groupby(etype).map_groups sum      # tiny table: one row per type
      → driver-side micro/macro P/R/F1     # constant-size reduction

Micro = global sums, macro = mean over per-type F1 — same definitions as
seqeval / the reference's printed metrics (``run.py:50-52``).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..kernels.bio import prf_from_counts, span_prf_counts


def pred_bio_batch(batch: pa.Table) -> pa.Table:
    """detected rows → (url, sent_id, pred_bio) from the mention spans."""
    urls, sids, bios = [], [], []
    for url, sid, text, mlist in zip(
        batch.column("url").to_pylist(),
        batch.column("sent_id").to_pylist(),
        batch.column("text").to_pylist(),
        batch.column("mentions").to_pylist(),
    ):
        n = len(text.split(" "))
        tags = ["O"] * n
        for m in mlist:
            mtype = m["mtype"]
            s, e = m["span_start"], m["span_end"]
            if "-" in mtype:  # FewNERD style: bare tag, no B/I prefix
                for j in range(s, e):
                    tags[j] = mtype
            else:
                tags[s] = "B-" + mtype
                for j in range(s + 1, e):
                    tags[j] = "I-" + mtype
        urls.append(url)
        sids.append(sid)
        # space-joined: Arrow's hash join rejects list<> payload columns,
        # and BIO tags never contain spaces
        bios.append(" ".join(tags))
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "sent_id": pa.array(sids, type=pa.int32()),
            "pred_bio": pa.array(bios, type=pa.string()),
        }
    )


def _gold_bio_str_batch(batch: pa.Table) -> pa.Table:
    bios = [" ".join(b) for b in batch.column("bio").to_pylist()]
    return pa.table(
        {
            "url": batch.column("url"),
            "sent_id": batch.column("sent_id").cast(pa.int32()),
            "bio": pa.array(bios, type=pa.string()),
        }
    )


def _f1_partial_batch(batch: pa.Table) -> pa.Table:
    counts: Counter[tuple[str, str]] = Counter()
    for truth, pred in zip(
        batch.column("bio").to_pylist(), batch.column("pred_bio").to_pylist()
    ):
        for etype, (tp, n_pred, n_truth) in span_prf_counts(
            truth.split(" "), pred.split(" ")
        ).items():
            counts[(etype, "tp")] += tp
            counts[(etype, "n_pred")] += n_pred
            counts[(etype, "n_truth")] += n_truth
    types = sorted({t for t, _ in counts})
    return pa.table(
        {
            "etype": pa.array(types, type=pa.string()),
            "tp": pa.array([counts[(t, "tp")] for t in types], type=pa.int64()),
            "n_pred": pa.array(
                [counts[(t, "n_pred")] for t in types], type=pa.int64()
            ),
            "n_truth": pa.array(
                [counts[(t, "n_truth")] for t in types], type=pa.int64()
            ),
        }
    )




def f1_counts(detected, gold, num_partitions: int = 8):
    """Per-type exact-span (tp, n_pred, n_truth) table, fully distributed.

    ``gold`` needs columns (url, sent_id, bio); ``detected`` is the
    mention-detection output.  The join is a hash shuffle on the sentence
    key — both sides are per-sentence tables, no skew (keys are unique).
    """
    preds = detected.map_batches(pred_bio_batch, batch_format="pyarrow")
    gold_sel = gold.select_columns(["url", "sent_id", "bio"]).map_batches(
        _gold_bio_str_batch, batch_format="pyarrow"
    )
    joined = gold_sel.join(
        preds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("url", "sent_id"),
    )
    from ray.data.aggregate import Sum

    partials = joined.map_batches(_f1_partial_batch, batch_format="pyarrow")
    merged = partials.groupby("etype").aggregate(
        Sum("tp"), Sum("n_pred"), Sum("n_truth")
    )
    return merged.rename_columns(
        {"sum(tp)": "tp", "sum(n_pred)": "n_pred", "sum(n_truth)": "n_truth"}
    )


def postprocess_results_batch(batch: pa.Table) -> pa.Table:
    """M17 results post-processor (reference ``basic_process_results``,
    ``eval.py:24-50``): derive per-token ``word | TAG`` display strings and
    the exact-match ``correct`` flag from joined (gold, pred) rows.

    The reference parses stringified list columns with ``eval()`` and
    rewrites CSVs in place; here columns are native and the transform is a
    pure batch kernel over the joined eval table.
    """
    texts = batch.column("text").to_pylist()
    truths = batch.column("bio").to_pylist()
    preds = batch.column("pred_bio").to_pylist()
    pred_texts, truth_texts, corrects = [], [], []
    for text, truth, pred in zip(texts, truths, preds):
        words = text.split(" ")
        t_tags = truth.split(" ") if isinstance(truth, str) else list(truth)
        p_tags = pred.split(" ") if isinstance(pred, str) else list(pred)
        pred_texts.append(
            " ".join(f"{w} | {t}" for w, t in zip(words, p_tags))
        )
        truth_texts.append(
            " ".join(f"{w} | {t}" for w, t in zip(words, t_tags))
        )
        corrects.append(t_tags == p_tags)
    return batch.append_column(
        "pred_text", pa.array(pred_texts, type=pa.string())
    ).append_column(
        "truth_text", pa.array(truth_texts, type=pa.string())
    ).append_column("correct", pa.array(corrects, type=pa.bool_()))


def evaluate_f1(detected, gold, num_partitions: int = 8) -> dict:
    """Micro/macro P/R/F1 summary (driver-side constant-size reduction)."""
    tbl = f1_counts(detected, gold, num_partitions).to_pandas()
    # ascending-type order pins the macro-F1 float summation order to the
    # SQL oracle's `list(f ORDER BY etype)` — bit-identical, not close
    counts = {
        r.etype: (int(r.tp), int(r.n_pred), int(r.n_truth))
        for r in tbl.sort_values("etype").itertuples()
    }
    return prf_from_counts(counts)


# ---------------------------------------------------------------------------
# G7 analytics: confusion matrix + metric correlations
# (reference ``analytics``, eval.py:74-97 — sklearn confusion_matrix +
# ``d.corr()["f1"]`` — re-expressed as distributed partial aggregates)
# ---------------------------------------------------------------------------

def analytics_batch(batch: pa.Table) -> pa.Table:
    """results rows → + (text_len, n_entities) feature columns
    (reference eval.py:75-76)."""
    import pyarrow.compute as pc

    lens = pa.array(
        [len(t.split(" ")) for t in batch.column("text").to_pylist()],
        type=pa.int64(),
    )
    ents = pc.list_value_length(batch.column("entities")).cast(pa.int64())
    return batch.append_column("text_len", lens).append_column(
        "n_entities", ents
    )


def _confusion_partial_batch(batch: pa.Table) -> pa.Table:
    """(truth-tags, pred-tags) rows → per-block (truth, pred, n) counts."""
    counts: Counter[tuple[str, str]] = Counter()
    for truth, pred in zip(
        batch.column("bio").to_pylist(), batch.column("pred_bio").to_pylist()
    ):
        t_tags = truth.split(" ") if isinstance(truth, str) else list(truth)
        p_tags = pred.split(" ") if isinstance(pred, str) else list(pred)
        counts.update(zip(t_tags, p_tags))
    keys = sorted(counts)
    return pa.table(
        {
            "truth": pa.array([k[0] for k in keys], type=pa.string()),
            "pred": pa.array([k[1] for k in keys], type=pa.string()),
            "n": pa.array([counts[k] for k in keys], type=pa.int64()),
        }
    )


def confusion_counts(detected, gold, num_partitions: int = 8):
    """Token-level confusion table (truth, pred, n), fully distributed.

    Long-form equivalent of the reference's sklearn
    ``confusion_matrix(truths, preds)`` (eval.py:93): join gold and
    predicted BIO per sentence, count tag pairs per block, native grouped
    Sum.  Pivot driver-side with :func:`confusion_matrix_df` when a square
    matrix is wanted (one row per tag pair — constant-size output).
    """
    from ray.data.aggregate import Sum

    preds = detected.map_batches(pred_bio_batch, batch_format="pyarrow")
    gold_sel = gold.select_columns(["url", "sent_id", "bio"]).map_batches(
        _gold_bio_str_batch, batch_format="pyarrow"
    )
    joined = gold_sel.join(
        preds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("url", "sent_id"),
    )
    partials = joined.map_batches(
        _confusion_partial_batch, batch_format="pyarrow"
    )
    merged = partials.groupby(["truth", "pred"]).aggregate(Sum("n"))
    return merged.rename_columns({"sum(n)": "n"})


def confusion_matrix_df(confusion_ds):
    """Pivot the long-form confusion table to the square (labels × labels)
    frame the reference displays (tiny post-aggregate table)."""
    df = confusion_ds.to_pandas()
    labels = sorted(set(df["truth"]) | set(df["pred"]))
    return (
        df.pivot_table(
            index="truth", columns="pred", values="n", fill_value=0
        )
        .reindex(index=labels, columns=labels, fill_value=0)
        .astype(int)
    )


def _corr_partial_batch(batch: pa.Table, cols: tuple, target: str) -> pa.Table:
    """Per-block moment sums for Pearson corr of each col against target."""
    import numpy as np

    y = batch.column(target).to_numpy(zero_copy_only=False).astype(float)
    names, ns, sx, sy, sxy, sxx, syy = [], [], [], [], [], [], []
    for c in cols:
        x = batch.column(c).to_numpy(zero_copy_only=False).astype(float)
        names.append(c)
        ns.append(len(x))
        sx.append(float(x.sum()))
        sy.append(float(y.sum()))
        sxy.append(float((x * y).sum()))
        sxx.append(float((x * x).sum()))
        syy.append(float((y * y).sum()))
    return pa.table(
        {
            "col": pa.array(names, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
            "sx": pa.array(sx, type=pa.float64()),
            "sy": pa.array(sy, type=pa.float64()),
            "sxy": pa.array(sxy, type=pa.float64()),
            "sxx": pa.array(sxx, type=pa.float64()),
            "syy": pa.array(syy, type=pa.float64()),
        }
    )


def f1_correlations(
    results_ds,
    cols: tuple = ("text_len", "n_entities"),
    target: str = "f1",
) -> dict[str, float]:
    """Pearson correlation of each feature column against ``target``
    (reference ``d.corr()["f1"]``, eval.py:92) from distributed moment
    sums — one pass, constant-size driver reduction."""
    import math as _math

    from ray.data.aggregate import Sum

    partials = results_ds.map_batches(
        _corr_partial_batch,
        fn_kwargs={"cols": tuple(cols), "target": target},
        batch_format="pyarrow",
    )
    agg = partials.groupby("col").aggregate(
        Sum("n"), Sum("sx"), Sum("sy"), Sum("sxy"), Sum("sxx"), Sum("syy")
    ).to_pandas()
    out = {}
    for r in agg.itertuples():
        n = r[2]
        sx, sy, sxy, sxx, syy = r[3], r[4], r[5], r[6], r[7]
        cov = sxy - sx * sy / n
        vx = sxx - sx * sx / n
        vy = syy - sy * sy / n
        out[r.col] = (
            cov / _math.sqrt(vx * vy) if vx > 0 and vy > 0 else float("nan")
        )
    return out
