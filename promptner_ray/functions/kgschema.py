"""KG schema induction and training-prep operators.

Once triples exist, a KG-construction pipeline needs (a) an induced
*ontology* — which (subj_type, pred, obj_type) signatures a predicate
actually connects, with support counts (schema induction à la NELL /
DBpedia mapping statistics); (b) *noise pruning* that drops extracted
triples violating the dominant signatures of their predicate (the
standard consistency gate over open-IE output); (c) bounded *path
enumeration* for 2-hop pattern queries over the graph; and (d)
*negative sampling* for KG-embedding training (TransE-style corrupted
tails), the canonical training-data export of a constructed KG.

No reference equivalent (the reference stops at per-sentence NER —
`/root/reference/algorithms.py` has no graph plane); these extend the
graph suite the same way `functions/graphops.py` does, and reuse its
conventions: int64 md5-derived keys on every exchange, map-side
combines, data-sized partition counts, DuckDB-replayable arithmetic.

Scale notes (100 TB):
- Schema induction exchanges only distinct (pattern, pair) rows after a
  per-block combine; the final pattern table is bounded by
  |pred vocabulary| × |type|² — potentially large with an open predicate
  vocabulary, so the pruning plan never materializes it on the driver:
  pattern support joins per-pred totals through a tiny digest-keyed
  exchange, and the corpus side is filtered by a size-thresholded
  broadcast of the admissible digests (one int64 per pattern) with a
  distributed semi-join as the over-threshold fallback.
- Path enumeration is bounded by the pivot cap (same argument as
  ``graphops.neighbor_jaccard``): hubs never pivot, so the output is
  ≤ Σ_{capped b} in(b)·out(b).
- Negative sampling ranks the node table with a two-pass
  constant-memory scheme (4096-bucket histogram of the uniform id space
  → driver offsets → per-bucket local sort), then moves each candidate
  through int64-keyed joins; nothing node- or edge-sized is broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.cleaning import surface_hash64
from ..shuffle import (
    hash_grouped,
    hash_partitioned,
    local_hash_join,
    sized_partitions,
)
from ..stages.link import _hash_ids

# Keep a (subj_type, pred, obj_type) pattern iff it carries at least
# 1/SCHEMA_KEEP_DEN of its predicate's triples (integer arithmetic —
# exact in both engines).
SCHEMA_KEEP_DEN = 20

# Admissible-pattern sets up to this size broadcast (one int64 each →
# ≤ 8 MB in the object store); larger sets take the semi-join path.
SCHEMA_BROADCAST_MAX = 1_000_000

# 2-hop paths only pivot through nodes with n_in + n_out <= cap: the
# same hub-safety argument as neighbor_jaccard's pivot-degree cap.
PATH_PIVOT_CAP = 64

# TransE-style corrupted-tail negatives per positive edge.
NEG_K = 2
NEG_SEED = 42

# Wrapping-uint64 mix multipliers (same constants as the deterministic
# random walks — graphops.RW_M*; < 2^32 so the HUGEINT replay's products
# stay < 2^96).
_M1 = 2654435761
_M2 = 40503
_M3 = 2246822519

# Node-ranking histogram: top 12 bits of the uint64 entity id (md5-
# derived, so uniform over the id space).
_RANK_BUCKET_BITS = 12
_RANK_BUCKETS = 1 << _RANK_BUCKET_BITS


def _pattern_key(batch: pa.Table) -> pa.Array:
    """(subj_type, pred, obj_type) → int64 digest column.

    Digest = surface_hash64 of ``subj_type || '|' || pred || '|' ||
    obj_type`` (no normalization — types and preds are already
    canonical), computed once per DISTINCT pattern in the block; the
    DuckDB twin is ``_sql_hash64("subj_type || '|' || pred || '|' ||
    obj_type")``.
    """
    import pyarrow.compute as pc

    comb = pc.binary_join_element_wise(
        batch.column("subj_type").cast(pa.string()),
        batch.column("pred").cast(pa.string()),
        batch.column("obj_type").cast(pa.string()),
        "|",
    )
    if isinstance(comb, pa.ChunkedArray):
        comb = comb.combine_chunks()
    d = pc.dictionary_encode(comb)
    uniq = pa.array(
        [surface_hash64(s) for s in d.dictionary.to_pylist()],
        type=pa.int64(),
    )
    return pc.take(uniq, d.indices)


_PATTERN_COLS = ("subj_type", "pred", "obj_type")


def _pattern_partials(batch: pa.Table) -> pa.Table:
    """Map-side combine: triples → per-block (pk, pattern, n) counts."""
    if len(batch) == 0:
        return pa.table(
            {
                "pk": pa.array([], type=pa.int64()),
                "subj_type": pa.array([], type=pa.string()),
                "pred": pa.array([], type=pa.string()),
                "obj_type": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    tbl = pa.table(
        {
            "pk": _pattern_key(batch),
            "subj_type": batch.column("subj_type").cast(pa.string()),
            "pred": batch.column("pred").cast(pa.string()),
            "obj_type": batch.column("obj_type").cast(pa.string()),
        }
    )
    out = tbl.group_by(["pk", *_PATTERN_COLS]).aggregate([([], "count_all")])
    return pa.table(
        {
            "pk": out.column("pk"),
            "subj_type": out.column("subj_type"),
            "pred": out.column("pred"),
            "obj_type": out.column("obj_type"),
            "n": out.column("count_all").cast(pa.int64()),
        }
    )


def pattern_counts(triples_ds, num_partitions: int | None = None):
    """triples → (pk, subj_type, pred, obj_type, n_triples): one
    digest-keyed exchange over per-block pattern partials."""
    return hash_grouped(
        triples_ds.map_batches(_pattern_partials, batch_format="pyarrow"),
        ["pk", *_PATTERN_COLS],
        [("n", "sum")],
        rename={"n_sum": "n_triples"},
        hash_cols=["pk"],
        num_partitions=num_partitions,
    )


def schema_patterns(triples_ds, num_partitions: int | None = None):
    """Schema induction: (subj_type, pred, obj_type, n_triples, n_pairs).

    ``n_triples`` counts pattern instances; ``n_pairs`` counts DISTINCT
    (subj entity, obj entity) pairs asserting the pattern — the
    diversity signal that separates a genuine relation signature from
    one boilerplate page repeated everywhere.  Two exchanges: distinct
    typed pairs (map-side combined), then the pattern rollup.
    """
    num_partitions = sized_partitions(triples_ds.count(), num_partitions)

    def pair_partials(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "pk": pa.array([], type=pa.int64()),
                    "subj_type": pa.array([], type=pa.string()),
                    "pred": pa.array([], type=pa.string()),
                    "obj_type": pa.array([], type=pa.string()),
                    "subj_id": pa.array([], type=pa.int64()),
                    "obj_id": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        tbl = pa.table(
            {
                "pk": _pattern_key(batch),
                "subj_type": batch.column("subj_type").cast(pa.string()),
                "pred": batch.column("pred").cast(pa.string()),
                "obj_type": batch.column("obj_type").cast(pa.string()),
                "subj_id": _hash_ids(batch.column("subj")),
                "obj_id": _hash_ids(batch.column("obj")),
            }
        )
        out = tbl.group_by(
            ["pk", *_PATTERN_COLS, "subj_id", "obj_id"]
        ).aggregate([([], "count_all")])
        cols = {c: out.column(c) for c in
                ("pk", *_PATTERN_COLS, "subj_id", "obj_id")}
        cols["n"] = out.column("count_all").cast(pa.int64())
        return pa.table(cols)

    pairs = hash_grouped(
        triples_ds.map_batches(pair_partials, batch_format="pyarrow"),
        ["pk", *_PATTERN_COLS, "subj_id", "obj_id"],
        [("n", "sum")],
        rename={"n_sum": "n"},
        hash_cols=["pk", "subj_id", "obj_id"],
        num_partitions=num_partitions,
    )
    pat = hash_grouped(
        pairs,
        ["pk", *_PATTERN_COLS],
        [("n", "sum"), ([], "count_all")],
        rename={"n_sum": "n_triples", "count_all": "n_pairs"},
        hash_cols=["pk"],
        num_partitions=max(1, num_partitions // 4),
    )
    return pat.drop_columns(["pk"])


def schema_filter(triples_ds, num_partitions: int | None = None):
    """Ontology-consistency gate: keep triples whose (subj_type, pred,
    obj_type) signature carries ≥ 1/SCHEMA_KEEP_DEN of the predicate's
    triples — extraction noise (a mis-typed mention pairing) rarely
    repeats with the same type signature, dominant signatures do.

    Fully distributed: pattern supports (one exchange) join per-pred
    totals (tiny digest-keyed exchange), and the admissible pattern set
    semi-joins the corpus on the int64 pattern digest.  The pattern
    table never lands on the driver — with an open predicate vocabulary
    it is vocabulary-sized, not ontology-sized.
    """
    import pyarrow.compute as pc

    num_partitions = sized_partitions(triples_ds.count(), num_partitions)
    # The pattern table is re-consumed (totals join + count + take_all):
    # materialize it once — it is |patterns|-sized, not corpus-sized —
    # and size every pattern-side exchange to ITS cardinality (the
    # 1-partition fast path on toy/bench ontologies; the full-corpus
    # bench paid three CPU-count sort exchanges plus a lineage re-run
    # here, 43 s → ~6 s).
    pat = pattern_counts(
        triples_ds, num_partitions=max(1, num_partitions // 4)
    ).materialize()
    small = sized_partitions(pat.count())

    def add_pred_key(t: pa.Table) -> pa.Table:
        preds = t.column("pred")
        if isinstance(preds, pa.ChunkedArray):
            preds = preds.combine_chunks()
        d = pc.dictionary_encode(preds)
        uniq = pa.array(
            [surface_hash64(p) for p in d.dictionary.to_pylist()],
            type=pa.int64(),
        )
        return t.append_column("pred_key", pc.take(uniq, d.indices))

    pat_k = pat.map_batches(add_pred_key, batch_format="pyarrow")
    totals = hash_grouped(
        pat_k.select_columns(["pred_key", "n_triples"]),
        ["pred_key"],
        [("n_triples", "sum")],
        rename={"n_triples_sum": "pred_total"},
        num_partitions=small,
    )
    pat_schema = pa.schema(
        [
            ("pk", pa.int64()),
            ("subj_type", pa.string()),
            ("pred", pa.string()),
            ("obj_type", pa.string()),
            ("n_triples", pa.int64()),
            ("pred_key", pa.int64()),
        ]
    )
    tot_schema = pa.schema(
        [("pred_key", pa.int64()), ("pred_total", pa.int64())]
    )
    joined = local_hash_join(
        pat_k,
        totals,
        on=["pred_key"],
        left_schema=pat_schema,
        right_schema=tot_schema,
        num_partitions=small,
    )

    def admissible(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.column("n_triples").to_numpy(zero_copy_only=False)
        tot = t.column("pred_total").to_numpy(zero_copy_only=False)
        return t.select(["pk"]).filter(
            pa.array(n * SCHEMA_KEEP_DEN >= tot)
        )

    keep = joined.map_batches(
        admissible, batch_format="pyarrow"
    ).materialize()

    # Size-thresholded switch (the edge-naming idiom, pipelines/kg.py::
    # run_graph): the admissible set is one int64 per pattern.  Under
    # the threshold it broadcasts once (``ray.put``) and the corpus side
    # is a pure streaming ``is_in`` map — no exchange at all, which also
    # sidesteps the pattern-key skew a pk-keyed semi-join suffers (a few
    # dominant signatures own nearly every triple, so hash-partitioning
    # the corpus on pk serializes; measured 43 s → ~3 s at bench scale).
    # Over the threshold (an open predicate vocabulary can reach
    # |preds|·|types|² patterns) it falls back to the distributed
    # semi-join.
    if keep.count() <= SCHEMA_BROADCAST_MAX:
        import ray

        keys = np.sort(
            np.fromiter(
                (r["pk"] for r in keep.take_all()), dtype=np.int64
            )
        )
        keys_ref = ray.put(keys)

        def bfilter(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return batch
            ks = ray.get(keys_ref)
            if len(ks) == 0:
                return batch.slice(0, 0)
            pk = _pattern_key(batch).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(ks, pk)
            idx[idx >= len(ks)] = 0
            return batch.filter(pa.array(ks[idx] == pk))

        return triples_ds.map_batches(bfilter, batch_format="pyarrow")

    def with_pk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("pk", pa.array([], type=pa.int64()))
        return batch.append_column("pk", _pattern_key(batch))

    triple_schema = pa.schema(
        [
            ("url", pa.string()),
            ("sent_id", pa.int32()),
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("subj_type", pa.string()),
            ("obj_type", pa.string()),
            ("pk", pa.int64()),
        ]
    )
    kept = local_hash_join(
        triples_ds.map_batches(with_pk, batch_format="pyarrow"),
        keep,
        on=["pk"],
        left_schema=triple_schema,
        right_schema=pa.schema([("pk", pa.int64())]),
        how="semi",
        num_partitions=num_partitions,
    )
    return kept.drop_columns(["pk"])


def path_counts(
    edges_ds,
    pivot_cap: int = PATH_PIVOT_CAP,
    num_partitions: int | None = None,
):
    """Bounded 2-hop path enumeration: (a)-[p1]->(b)-[p2]->(c) rows with
    evidence weight w = w1·w2, pivoting only through nodes whose total
    edge-row degree (n_in + n_out over distinct (subj, pred, obj) edges)
    is ≤ ``pivot_cap`` and that have both directions — the SPARQL-ish
    2-hop pattern scan, hub-safe by the neighbor_jaccard cap argument
    (output ≤ Σ_{capped b} in(b)·out(b); hubs contribute nothing).

    Plan: degree table → capped pivot ids → two semi-joins trim the edge
    table to in/out legs → ONE int64-keyed join co-locates legs on the
    pivot.  Deterministic (pure joins), oracled by the identical cap
    replay in SQL.
    """
    import pyarrow.compute as pc

    from .graphops import node_degrees

    num_partitions = sized_partitions(edges_ds.count(), num_partitions)
    deg = node_degrees(edges_ds, num_partitions=num_partitions)

    def capped(t: pa.Table) -> pa.Table:
        n_in = t.column("n_in").to_numpy(zero_copy_only=False)
        n_out = t.column("n_out").to_numpy(zero_copy_only=False)
        mask = (n_in + n_out <= pivot_cap) & (n_in > 0) & (n_out > 0)
        return t.select(["entity_id"]).filter(pa.array(mask)).rename_columns(
            ["b"]
        )

    piv = deg.map_batches(capped, batch_format="pyarrow")

    def as_in(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": t.column("subj_id").cast(pa.int64()),
                "p1": t.column("pred").cast(pa.string()),
                "b": t.column("obj_id").cast(pa.int64()),
                "w1": t.column("weight").cast(pa.int64()),
            }
        )

    def as_out(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "b": t.column("subj_id").cast(pa.int64()),
                "p2": t.column("pred").cast(pa.string()),
                "c": t.column("obj_id").cast(pa.int64()),
                "w2": t.column("weight").cast(pa.int64()),
            }
        )

    in_schema = pa.schema(
        [
            ("a", pa.int64()),
            ("p1", pa.string()),
            ("b", pa.int64()),
            ("w1", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("b", pa.int64()),
            ("p2", pa.string()),
            ("c", pa.int64()),
            ("w2", pa.int64()),
        ]
    )
    piv_schema = pa.schema([("b", pa.int64())])
    in_e = local_hash_join(
        edges_ds.map_batches(as_in, batch_format="pyarrow"),
        piv,
        on=["b"],
        left_schema=in_schema,
        right_schema=piv_schema,
        how="semi",
        num_partitions=num_partitions,
    )
    out_e = local_hash_join(
        edges_ds.map_batches(as_out, batch_format="pyarrow"),
        piv,
        on=["b"],
        left_schema=out_schema,
        right_schema=piv_schema,
        how="semi",
        num_partitions=num_partitions,
    )
    paths = local_hash_join(
        in_e,
        out_e,
        on=["b"],
        left_schema=in_schema,
        right_schema=out_schema,
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        w = pc.multiply(
            t.column("w1").cast(pa.int64()), t.column("w2").cast(pa.int64())
        )
        return pa.table(
            {
                "a": t.column("a"),
                "p1": t.column("p1"),
                "b": t.column("b"),
                "p2": t.column("p2"),
                "c": t.column("c"),
                "w": w,
            }
        )

    return paths.map_batches(finish, batch_format="pyarrow")


def _uint64(col: np.ndarray) -> np.ndarray:
    return col.astype(np.int64).view(np.uint64)


def node_ranks(nodes_ds, num_partitions: int | None = None):
    """nodes(entity_id, …) → (rank, entity_id): a dense 0..n-1 ranking
    in uint64(entity_id) order, plus the total count.

    Two-pass constant-memory distributed ranking over the md5-uniform id
    space: (1) a 4096-bucket histogram on the top 12 id bits — one
    constant-size reduce to the driver; (2) each bucket sorts locally
    inside a bucket-keyed exchange and offsets by the driver's exclusive
    cumsum.  The SQL twin is ``row_number() OVER (ORDER BY uint64(id))``.
    Returns ``(ranked_ds, n_nodes)``.
    """
    ids_only = nodes_ds.map_batches(
        lambda t: pa.table(
            {"entity_id": t.column("entity_id").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def hist_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        b = _uint64(
            t.column("entity_id").to_numpy(zero_copy_only=False)
        ) >> np.uint64(64 - _RANK_BUCKET_BITS)
        bucket, cnt = np.unique(b.astype(np.int64), return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(bucket, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    partials = ids_only.map_batches(
        hist_block, batch_format="pyarrow"
    ).take_all()  # ≤ 4096 rows per block — constant-size
    counts = np.zeros(_RANK_BUCKETS, dtype=np.int64)
    for r in partials:
        counts[r["bucket"]] += r["cnt"]
    offsets = np.zeros(_RANK_BUCKETS, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    n_nodes = int(counts.sum())

    def add_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(
                "bucket", pa.array([], type=pa.int64())
            )
        b = _uint64(
            t.column("entity_id").to_numpy(zero_copy_only=False)
        ) >> np.uint64(64 - _RANK_BUCKET_BITS)
        return t.append_column(
            "bucket", pa.array(b.astype(np.int64), type=pa.int64())
        )

    def rank_partition(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "rank": pa.array([], type=pa.int64()),
                    "nid": pa.array([], type=pa.int64()),
                }
            )
        ids = t.column("entity_id").to_numpy(zero_copy_only=False)
        bk = t.column("bucket").to_numpy(zero_copy_only=False)
        u = _uint64(ids)
        order = np.lexsort((u, bk))
        bk_s = bk[order]
        # position within each bucket run (buckets are whole here: the
        # exchange keyed on bucket id)
        starts = np.flatnonzero(np.r_[True, bk_s[1:] != bk_s[:-1]])
        run_id = np.cumsum(np.r_[True, bk_s[1:] != bk_s[:-1]]) - 1
        pos = np.arange(len(bk_s)) - starts[run_id]
        rank = offsets[bk_s] + pos
        return pa.table(
            {
                "rank": pa.array(rank, type=pa.int64()),
                "nid": pa.array(ids[order], type=pa.int64()),
            }
        )

    ranked = hash_partitioned(
        ids_only.map_batches(add_bucket, batch_format="pyarrow"),
        ["bucket"],
        rank_partition,
        num_partitions=sized_partitions(n_nodes, num_partitions),
    )
    return ranked, n_nodes


def negative_samples(
    edges_ds,
    nodes_ds,
    k: int = NEG_K,
    seed: int = NEG_SEED,
    num_partitions: int | None = None,
):
    """TransE-style corrupted-tail negatives: for every distinct edge
    (subj_id, pred, obj_id), ``k`` deterministic corrupt tails drawn
    uniformly from the node table, excluding the true tail, the head,
    and any tail that forms a REAL edge with (subj, pred) — the filtered
    negative-sampling export a KG-embedding trainer consumes.

    Candidate pick is a pure wrapping-uint64 mix of (subj_id, obj_id,
    pred digest, sample index, seed) reduced mod n_nodes and resolved
    through the :func:`node_ranks` table — bit-reproducible at any
    parallelism, HUGEINT-replayable in SQL.  Plan: constant-size rank
    histogram + three int64-keyed exchanges (rank join, degenerate
    filter map-side, true-edge anti via padded left-outer join).
    Output: (subj_id, pred, obj_id, neg_no, neg_id).
    """
    import pyarrow.compute as pc

    num_partitions = sized_partitions(edges_ds.count(), num_partitions)
    ranked, n_nodes = node_ranks(nodes_ds, num_partitions=num_partitions)
    if n_nodes == 0:
        raise ValueError("negative_samples: empty node table")

    def cand_fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "subj_id": pa.array([], type=pa.int64()),
                    "pred": pa.array([], type=pa.string()),
                    "obj_id": pa.array([], type=pa.int64()),
                    "pk": pa.array([], type=pa.int64()),
                    "neg_no": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        preds = batch.column("pred")
        if isinstance(preds, pa.ChunkedArray):
            preds = preds.combine_chunks()
        d = pc.dictionary_encode(preds)
        uniq = pa.array(
            [surface_hash64(p) for p in d.dictionary.to_pylist()],
            type=pa.int64(),
        )
        pk = pc.take(uniq, d.indices)
        s = _uint64(batch.column("subj_id").to_numpy(zero_copy_only=False))
        o = _uint64(batch.column("obj_id").to_numpy(zero_copy_only=False))
        p = _uint64(pk.to_numpy(zero_copy_only=False))
        outs = []
        for i in range(k):
            with np.errstate(over="ignore"):
                h = (
                    s * np.uint64(_M1)
                    + o * np.uint64(_M2)
                    + p * np.uint64(_M3)
                    + np.uint64((i + 1) * _M1 + seed)
                )
            rank = (h % np.uint64(n_nodes)).astype(np.int64)
            outs.append(
                pa.table(
                    {
                        "subj_id": batch.column("subj_id").cast(pa.int64()),
                        "pred": preds,
                        "obj_id": batch.column("obj_id").cast(pa.int64()),
                        "pk": pk,
                        "neg_no": pa.array(
                            np.full(len(batch), i, dtype=np.int64)
                        ),
                        "rank": pa.array(rank, type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    cands = edges_ds.map_batches(cand_fn, batch_format="pyarrow")
    cand_schema = pa.schema(
        [
            ("subj_id", pa.int64()),
            ("pred", pa.string()),
            ("obj_id", pa.int64()),
            ("pk", pa.int64()),
            ("neg_no", pa.int64()),
            ("rank", pa.int64()),
        ]
    )
    rank_schema = pa.schema([("rank", pa.int64()), ("nid", pa.int64())])
    withneg = local_hash_join(
        cands,
        ranked,
        on=["rank"],
        left_schema=cand_schema,
        right_schema=rank_schema,
        num_partitions=num_partitions,
    )

    def drop_degenerate(t: pa.Table) -> pa.Table:
        nid = t.column("nid").to_numpy(zero_copy_only=False)
        s = t.column("subj_id").to_numpy(zero_copy_only=False)
        o = t.column("obj_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((nid != o) & (nid != s))).drop_columns(
            ["rank"]
        )

    filtered = withneg.map_batches(drop_degenerate, batch_format="pyarrow")

    def true_slim(t: pa.Table) -> pa.Table:
        preds = t.column("pred")
        if isinstance(preds, pa.ChunkedArray):
            preds = preds.combine_chunks()
        d = pc.dictionary_encode(preds)
        uniq = pa.array(
            [surface_hash64(p) for p in d.dictionary.to_pylist()],
            type=pa.int64(),
        )
        return pa.table(
            {
                "subj_id": t.column("subj_id").cast(pa.int64()),
                "pk": pc.take(uniq, d.indices),
                "nid": t.column("obj_id").cast(pa.int64()),
                "hit": pa.array(
                    np.ones(len(t), dtype=np.int8), type=pa.int8()
                ),
            }
        )

    filt_schema = pa.schema(
        [
            ("subj_id", pa.int64()),
            ("pred", pa.string()),
            ("obj_id", pa.int64()),
            ("pk", pa.int64()),
            ("neg_no", pa.int64()),
            ("nid", pa.int64()),
        ]
    )
    true_schema = pa.schema(
        [
            ("subj_id", pa.int64()),
            ("pk", pa.int64()),
            ("nid", pa.int64()),
            ("hit", pa.int8()),
        ]
    )
    joined = local_hash_join(
        filtered,
        edges_ds.map_batches(true_slim, batch_format="pyarrow"),
        on=["subj_id", "pk", "nid"],
        left_schema=filt_schema,
        right_schema=true_schema,
        how="left_outer",
        num_partitions=num_partitions,
    )

    def keep_misses(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = t.filter(pc.is_null(t.column("hit")))
        return pa.table(
            {
                "subj_id": out.column("subj_id"),
                "pred": out.column("pred"),
                "obj_id": out.column("obj_id"),
                "neg_no": out.column("neg_no"),
                "neg_id": out.column("nid"),
            }
        )

    return joined.map_batches(keep_misses, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DIRT-style predicate co-occurrence (relation-synonym candidates)
# ---------------------------------------------------------------------------

# Entity pairs connected by more than this many DISTINCT predicates are
# skipped (hot caps: a boilerplate pair asserting every predicate would
# otherwise contribute quadratically) — the neighbor_jaccard cap idiom.
DIRT_PAIR_CAP = 16


def pred_cooc(
    triples_ds,
    cap: int = DIRT_PAIR_CAP,
    num_partitions: int | None = None,
):
    """Relation-synonym candidates à la DIRT (Lin & Pantel 2001): for
    every entity pair connected by 2..``cap`` distinct predicates, count
    the pair evidence per predicate pair → (pred_a, pred_b, n_pairs)
    with ``pred_a < pred_b`` lexicographically.  Two predicates sharing
    many distinct argument pairs are paraphrase candidates — the
    classic distributional signal for relation canonicalization.

    One pair-keyed exchange: per-block distinct (subj, obj, pred) rows
    co-locate on the (subj_id, obj_id) digest, the per-partition kernel
    walks pair runs (rare beyond size 1, bounded by ``cap``) and
    combines pred-pair counts before the final tiny digest-keyed Sum.
    """
    import pyarrow.compute as pc

    num_partitions = sized_partitions(triples_ds.count(), num_partitions)

    def partials(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "s": pa.array([], type=pa.int64()),
                    "o": pa.array([], type=pa.int64()),
                    "pred": pa.array([], type=pa.string()),
                }
            )
        tbl = pa.table(
            {
                "s": _hash_ids(batch.column("subj")),
                "o": _hash_ids(batch.column("obj")),
                "pred": batch.column("pred").cast(pa.string()),
            }
        )
        return tbl.group_by(["s", "o", "pred"]).aggregate([])

    def pair_kernel(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pred_a": pa.array([], type=pa.string()),
                "pred_b": pa.array([], type=pa.string()),
                "ka": pa.array([], type=pa.int64()),
                "kb": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0 or "s" not in t.column_names:
            return empty
        d = t.group_by(["s", "o", "pred"]).aggregate([])  # cross-block dedup
        s = d.column("s").to_numpy(zero_copy_only=False)
        o = d.column("o").to_numpy(zero_copy_only=False)
        preds = d.column("pred").to_pylist()
        order = np.lexsort((o, s))
        s, o = s[order], o[order]
        counts: dict[tuple[str, str], int] = {}
        i = 0
        n_rows = len(s)
        while i < n_rows:
            j = i + 1
            while j < n_rows and s[j] == s[i] and o[j] == o[i]:
                j += 1
            m = j - i
            if 2 <= m <= cap:
                run = sorted(preds[order[idx]] for idx in range(i, j))
                for x in range(m):
                    for y in range(x + 1, m):
                        key = (run[x], run[y])
                        counts[key] = counts.get(key, 0) + 1
            i = j
        if not counts:
            return empty
        pa_, pb_, n_ = zip(*((a, b, c) for (a, b), c in counts.items()))
        return pa.table(
            {
                "pred_a": pa.array(pa_, type=pa.string()),
                "pred_b": pa.array(pb_, type=pa.string()),
                "ka": pa.array(
                    [surface_hash64(x) for x in pa_], type=pa.int64()
                ),
                "kb": pa.array(
                    [surface_hash64(x) for x in pb_], type=pa.int64()
                ),
                "n": pa.array(n_, type=pa.int64()),
            }
        )

    parted = hash_partitioned(
        triples_ds.map_batches(partials, batch_format="pyarrow"),
        ["s", "o"],
        pair_kernel,
        num_partitions=num_partitions,
    )
    out = hash_grouped(
        parted,
        ["ka", "kb", "pred_a", "pred_b"],
        [("n", "sum")],
        rename={"n_sum": "n_pairs"},
        hash_cols=["ka", "kb"],
        num_partitions=max(1, num_partitions // 4),
    )
    return out.drop_columns(["ka", "kb"])
