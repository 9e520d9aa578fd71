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

def partial_link_counts(batch: pa.Table) -> pa.Table:
    """Map-side combine: mention rows → (surface_norm, surface, mtype, n).

    Fully vectorized: normalize runs once per DISTINCT surface (dictionary
    encode), the per-block combine is Arrow's native ``Table.group_by``.
    """
    import pyarrow.compute as pc

    dict_col = pc.dictionary_encode(batch.column("mention").combine_chunks())
    uniq = dict_col.dictionary.to_pylist()
    norm_uniq = pa.array(
        [normalize_surface(s) for s in uniq], type=pa.string()
    )
    norms = pc.take(norm_uniq, dict_col.indices)
    tbl = pa.table(
        {
            "surface_norm": norms,
            "surface": batch.column("mention"),
            "mtype": batch.column("mtype"),
        }
    ).filter(pc.not_equal(norms, ""))
    out = tbl.group_by(["surface_norm", "surface", "mtype"]).aggregate(
        [([], "count_all")]
    )
    return pa.table(
        {
            "surface_norm": out.column("surface_norm"),
            "surface": out.column("surface"),
            "mtype": out.column("mtype"),
            "n": out.column("count_all").cast(pa.int64()),
        }
    )


def merge_link_group(group: pa.Table) -> pa.Table:
    """Reduce one surface_norm group → one links row.

    canonical = most frequent raw surface; etype = most frequent type;
    deterministic tie-break on (count desc, value asc).
    """
    norm = group.column("surface_norm")[0].as_py()
    surface_counts: Counter[str] = Counter()
    type_counts: Counter[str] = Counter()
    total = 0
    for surface, mtype, n in zip(
        group.column("surface").to_pylist(),
        group.column("mtype").to_pylist(),
        group.column("n").to_pylist(),
    ):
        surface_counts[surface] += n
        type_counts[mtype] += n
        total += n
    canonical = min(surface_counts, key=lambda s: (-surface_counts[s], s))
    etype = min(type_counts, key=lambda t: (-type_counts[t], t))
    return pa.table(
        {
            "surface_norm": pa.array([norm], type=pa.string()),
            "surface_hash": pa.array([surface_hash64(norm)], type=pa.int64()),
            "entity_id": pa.array([surface_hash64(norm)], type=pa.int64()),
            "canonical": pa.array([canonical], type=pa.string()),
            "etype": pa.array([etype], type=pa.string()),
            "n_mentions": pa.array([total], type=pa.int64()),
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
    re-shipped per batch.  For link tables too large to broadcast, swap this
    stage for a hash-shuffle ``ds.join`` on entity_id (not needed at current
    scales; the nodes table is orders of magnitude smaller than the corpus).
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
