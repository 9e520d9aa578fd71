"""Entity canonicalization, linking, and graph aggregation.

Shuffle discipline (SURVEY.md §4.3): every groupby here is TWO-PHASE —
``map_batches`` first collapses each block to partial counts (hot keys like
"England" shrink to one row per block: the map-side combine that stands in
for salting), then a keyed ``groupby(...).map_groups`` merges the small
partials.  Entity ids are content-derived (``surface_hash64`` of the
normalized surface, reference ``eval.py:20-21`` normalization), so
mention→entity resolution needs NO join at all — triples compute their
subj/obj ids locally.  The only join in the pipeline (edge naming) is a
broadcast map over the small nodes table.
"""

from __future__ import annotations

from collections import Counter

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


# -- mergeable canonicalization aggregate (no per-group map_groups) ---------
#
# Accumulator: (surface_norm, Counter[surface], Counter[mtype], total).
# Ray's sort-based aggregate combines accumulators MAP-SIDE (one per key per
# block — hot surfaces like "England" collapse before the exchange), shuffles
# the int64 surface_hash key, and merges.  ``accumulate_block`` receives one
# group's partial rows as an Arrow table and folds them vectorized via
# ``Table.group_by``.

def _counter_from(block: pa.Table, col: str) -> Counter:
    out = block.group_by(col).aggregate([("n", "sum")])
    return Counter(
        dict(
            zip(
                out.column(col).to_pylist(),
                out.column("n_sum").to_pylist(),
            )
        )
    )


def _link_init(_key) -> tuple:
    return ("", Counter(), Counter(), 0)


def _link_acc_block(acc: tuple, block: pa.Table) -> tuple:
    norm, cs, ct, total = acc
    if len(block) == 0:
        return acc
    norm = block.column("surface_norm")[0].as_py()
    cs = cs + _counter_from(block, "surface")
    ct = ct + _counter_from(block, "mtype")
    import pyarrow.compute as pc

    total += pc.sum(block.column("n")).as_py()
    return (norm, cs, ct, total)


def _link_merge(a: tuple, b: tuple) -> tuple:
    return (a[0] or b[0], a[1] + b[1], a[2] + b[2], a[3] + b[3])


def _link_finalize(acc: tuple) -> dict:
    norm, cs, ct, total = acc
    canonical = min(cs, key=lambda s: (-cs[s], s))
    etype = min(ct, key=lambda t: (-ct[t], t))
    return {
        "surface_norm": norm,
        "canonical": canonical,
        "etype": etype,
        "n_mentions": total,
    }


def make_link_aggregate():
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=_link_init,
        merge=_link_merge,
        accumulate_block=_link_acc_block,
        finalize=_link_finalize,
        name="link",
    )


def unpack_link_rows(batch: pa.Table) -> pa.Table:
    """(surface_hash, link-dict) → the canonical links schema."""
    hashes = batch.column("surface_hash").to_pylist()
    links = batch.column("link").to_pylist()
    return pa.table(
        {
            "surface_norm": pa.array(
                [d["surface_norm"] for d in links], type=pa.string()
            ),
            "surface_hash": pa.array(hashes, type=pa.int64()),
            "entity_id": pa.array(hashes, type=pa.int64()),
            "canonical": pa.array(
                [d["canonical"] for d in links], type=pa.string()
            ),
            "etype": pa.array([d["etype"] for d in links], type=pa.string()),
            "n_mentions": pa.array(
                [d["n_mentions"] for d in links], type=pa.int64()
            ),
        }
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
