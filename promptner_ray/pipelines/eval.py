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


def _f1_merge_group(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "etype": group.column("etype").slice(0, 1),
            "tp": pa.array(
                [sum(group.column("tp").to_pylist())], type=pa.int64()
            ),
            "n_pred": pa.array(
                [sum(group.column("n_pred").to_pylist())], type=pa.int64()
            ),
            "n_truth": pa.array(
                [sum(group.column("n_truth").to_pylist())], type=pa.int64()
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
    partials = joined.map_batches(_f1_partial_batch, batch_format="pyarrow")
    return partials.groupby("etype").map_groups(
        _f1_merge_group, batch_format="pyarrow"
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
    counts = {
        r.etype: (int(r.tp), int(r.n_pred), int(r.n_truth))
        for r in tbl.itertuples()
    }
    return prf_from_counts(counts)
