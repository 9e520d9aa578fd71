"""Entity canonicalization, linking, and graph aggregation.

Shuffle discipline (SURVEY.md §4.3): every aggregation here is TWO-PHASE —
``map_batches`` first collapses each block to partial counts (hot keys like
"England" shrink to one row per block: the map-side combine that stands in
for salting), then ``shuffle.hash_partitioned`` exchanges the partials on
the int64 entity hash and finishes each partition with vectorized Arrow /
pandas kernels — no per-entity Python and no string shuffle keys.  Entity
ids are content-derived (``surface_hash64`` of the normalized surface,
reference ``eval.py:20-21`` normalization), so mention→entity resolution
needs NO join at all — triples compute their subj/obj ids locally.  Edge
naming is a broadcast map while the nodes table is small and a
hash-shuffle join (:func:`named_edges_join`) past the threshold.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.cleaning import normalize_surface, surface_hash64


# ---------------------------------------------------------------------------
# links: mentions → canonical surface table
# ---------------------------------------------------------------------------

_LINK_PARTIAL_SCHEMA = pa.schema(
    [
        ("surface_hash", pa.int64()),
        ("surface_norm", pa.string()),
        ("surface", pa.string()),
        ("mtype", pa.string()),
        ("n", pa.int64()),
    ]
)


def partial_link_counts(batch: pa.Table) -> pa.Table:
    """Map-side combine: mention rows → (hash, norm, surface, mtype, n).

    Fully vectorized: normalize+hash run once per DISTINCT surface
    (dictionary encode), the per-block combine is Arrow's native
    ``Table.group_by``.  ``surface_hash`` (int64) is the downstream
    shuffle key — the string key never partitions an exchange.
    """
    import pyarrow.compute as pc

    if len(batch) == 0:
        return _LINK_PARTIAL_SCHEMA.empty_table()
    dict_col = pc.dictionary_encode(batch.column("mention").combine_chunks())
    uniq = dict_col.dictionary.to_pylist()
    norm_list = [normalize_surface(s) for s in uniq]
    norm_uniq = pa.array(norm_list, type=pa.string())
    hash_uniq = pa.array(
        [surface_hash64(nm) for nm in norm_list], type=pa.int64()
    )
    norms = pc.take(norm_uniq, dict_col.indices)
    tbl = pa.table(
        {
            "surface_hash": pc.take(hash_uniq, dict_col.indices),
            "surface_norm": norms,
            "surface": batch.column("mention"),
            "mtype": batch.column("mtype"),
        }
    ).filter(pc.not_equal(norms, ""))
    out = tbl.group_by(
        ["surface_hash", "surface_norm", "surface", "mtype"]
    ).aggregate([([], "count_all")])
    return pa.table(
        {
            "surface_hash": out.column("surface_hash"),
            "surface_norm": out.column("surface_norm"),
            "surface": out.column("surface"),
            "mtype": out.column("mtype"),
            "n": out.column("count_all").cast(pa.int64()),
        }
    )


# -- vectorized per-partition canonicalization ------------------------------
#
# Rows are hash-partitioned on the int64 ``surface_hash`` (every entity's
# partials land wholly in one partition), then each partition canonicalizes
# ALL its entities in a handful of vectorized kernels: Arrow grouped sums
# for the per-(entity, surface) / per-(entity, type) counts, a pandas
# lexicographic sort + drop_duplicates for the (count desc, value asc)
# argmax — no per-entity Python anywhere.

def canonicalize_partition(block: pa.Table) -> pa.Table:
    """One hash partition of link partials → links rows (vectorized)."""
    if len(block) == 0:
        return _LINKS_SCHEMA.empty_table()
    sc = (
        block.group_by(["surface_hash", "surface_norm", "surface"])
        .aggregate([("n", "sum")])
        .to_pandas()
    )
    tc = (
        block.group_by(["surface_hash", "mtype"])
        .aggregate([("n", "sum")])
        .to_pandas()
    )
    canon = (
        sc.sort_values(
            ["surface_hash", "n_sum", "surface"],
            ascending=[True, False, True],
            kind="stable",
        )
        .drop_duplicates("surface_hash")
        .set_index("surface_hash")
    )
    etype = (
        tc.sort_values(
            ["surface_hash", "n_sum", "mtype"],
            ascending=[True, False, True],
            kind="stable",
        )
        .drop_duplicates("surface_hash")
        .set_index("surface_hash")["mtype"]
    )
    totals = sc.groupby("surface_hash")["n_sum"].sum()
    hashes = canon.index.to_numpy()
    return pa.table(
        {
            "surface_norm": pa.array(
                canon["surface_norm"].to_numpy(), type=pa.string()
            ),
            "surface_hash": pa.array(hashes, type=pa.int64()),
            "entity_id": pa.array(hashes, type=pa.int64()),
            "canonical": pa.array(
                canon["surface"].to_numpy(), type=pa.string()
            ),
            "etype": pa.array(
                etype.loc[hashes].to_numpy(), type=pa.string()
            ),
            "n_mentions": pa.array(
                totals.loc[hashes].to_numpy(), type=pa.int64()
            ),
        }
    )


_LINKS_SCHEMA = pa.schema(
    [
        ("surface_norm", pa.string()),
        ("surface_hash", pa.int64()),
        ("entity_id", pa.int64()),
        ("canonical", pa.string()),
        ("etype", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)


def links_to_nodes(batch: pa.Table) -> pa.Table:
    return batch.select(["entity_id", "canonical", "etype", "n_mentions"])


# ---------------------------------------------------------------------------
# edges: triples → weighted, deduplicated edge table
# ---------------------------------------------------------------------------

def _hash_ids(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Surface column → int64 entity-id column.

    normalize+hash runs once per DISTINCT surface (dictionary encode, then
    take): cost scales with the vocabulary per block, not the row count.
    """
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dict_col = pc.dictionary_encode(col)
    uniq_ids = pa.array(
        [
            surface_hash64(normalize_surface(s))
            for s in dict_col.dictionary.to_pylist()
        ],
        type=pa.int64(),
    )
    return pc.take(uniq_ids, dict_col.indices)


def partial_edge_counts(batch: pa.Table) -> pa.Table:
    """Map-side combine: triples → (subj_id, pred, obj_id, w) partials.

    Vectorized: ids via :func:`_hash_ids`, combine via Arrow's native
    ``Table.group_by`` (C++), no Python loop over rows.
    """
    tbl = pa.table(
        {
            "subj_id": _hash_ids(batch.column("subj")),
            "pred": batch.column("pred"),
            "obj_id": _hash_ids(batch.column("obj")),
        }
    )
    out = tbl.group_by(["subj_id", "pred", "obj_id"]).aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {
            "subj_id": out.column("subj_id"),
            "pred": out.column("pred"),
            "obj_id": out.column("obj_id"),
            "w": out.column("count_all").cast(pa.int64()),
        }
    )


def partial_edge_url_counts(batch: pa.Table) -> pa.Table:
    """Map-side combine for TEMPORAL edges: triples → (url_key, subj_id,
    pred, obj_id, n) partials — per-(page, edge) occurrence counts whose
    ``url_key`` (int64 digest of the raw url; the string never keys an
    exchange) joins against the page-timestamp table.  Vectorized like
    :func:`partial_edge_counts`: the url digest runs once per DISTINCT
    url in the block (triples cluster by page), ids via :func:`_hash_ids`,
    combine via Arrow's C++ ``group_by``.
    """
    import pyarrow.compute as pc

    urls = batch.column("url")
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    dict_urls = pc.dictionary_encode(urls)
    uniq_keys = pa.array(
        [surface_hash64(u) for u in dict_urls.dictionary.to_pylist()],
        type=pa.int64(),
    )
    tbl = pa.table(
        {
            "url_key": pc.take(uniq_keys, dict_urls.indices),
            "subj_id": _hash_ids(batch.column("subj")),
            "pred": batch.column("pred"),
            "obj_id": _hash_ids(batch.column("obj")),
        }
    )
    out = tbl.group_by(["url_key", "subj_id", "pred", "obj_id"]).aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {
            "url_key": out.column("url_key"),
            "subj_id": out.column("subj_id"),
            "pred": out.column("pred"),
            "obj_id": out.column("obj_id"),
            "n": out.column("count_all").cast(pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# broadcast join: name edges from the (small) nodes table
# ---------------------------------------------------------------------------

class EdgeNamer:
    """Broadcast-map join: attach canonical names to edge endpoints.

    The id→canonical dict is put in the object store ONCE (``ray.put`` by the
    pipeline) and each actor/task resolves it in ``__init__`` — never
    re-shipped per batch.  For nodes tables too large to broadcast (distinct
    web-scale entities are billions of rows), :func:`named_edges_join` is the
    hash-shuffle path; ``kg.run_graph`` switches on a row-count threshold.
    """

    def __init__(self, names_ref) -> None:
        import ray

        self.names: dict[int, str] = ray.get(names_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj_names = [
            self.names.get(i, "") for i in batch.column("subj_id").to_pylist()
        ]
        obj_names = [
            self.names.get(i, "") for i in batch.column("obj_id").to_pylist()
        ]
        return batch.append_column(
            "subj_canonical", pa.array(subj_names, type=pa.string())
        ).append_column("obj_canonical", pa.array(obj_names, type=pa.string()))


def _join_partitions() -> int:
    """Partition count sized to the cluster: join aggregator actors reserve
    0.125 CPU per partition, and this pipeline runs TWO joins back to back —
    one partition per CPU keeps both operators' actor pools at 1/4 of the
    cluster, leaving CPUs for the map stages (an oversized constant
    deadlocks small clusters: 2 × 16 partitions consumed all 4 test CPUs)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus)


def named_edges_join(edges_ds, nodes_ds, num_partitions: int | None = None):
    """Hash-shuffle edge naming: two int64-keyed joins against nodes.

    The scale path when the nodes table cannot be broadcast: both sides
    hash-partition on the entity id, so per-node memory is one partition of
    each, never the whole table.  Left-outer + fill-empty matches the
    broadcast :class:`EdgeNamer`'s behavior for dangling endpoints.
    """
    import pyarrow.compute as pc

    if num_partitions is None:
        num_partitions = _join_partitions()

    names = nodes_ds.select_columns(["entity_id", "canonical"])

    def _finish(col_from: str, col_to: str):
        def fn(batch: pa.Table) -> pa.Table:
            named = pc.fill_null(
                batch.column(col_from).cast(pa.string()), ""
            )
            batch = batch.drop_columns(
                [c for c in (col_from, "entity_id") if c in batch.column_names]
            )
            return batch.append_column(col_to, named)

        return fn

    subj_named = edges_ds.join(
        names,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("subj_id",),
        right_on=("entity_id",),
    ).map_batches(_finish("canonical", "subj_canonical"), batch_format="pyarrow")
    return subj_named.join(
        names,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("obj_id",),
        right_on=("entity_id",),
    ).map_batches(_finish("canonical", "obj_canonical"), batch_format="pyarrow")
