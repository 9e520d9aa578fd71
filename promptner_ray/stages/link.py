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
    """Map-side combine: mention rows → (surface_norm, surface, mtype, n)."""
    counts: Counter[tuple[str, str, str]] = Counter()
    for surface, mtype in zip(
        batch.column("mention").to_pylist(), batch.column("mtype").to_pylist()
    ):
        norm = normalize_surface(surface)
        if norm:
            counts[(norm, surface, mtype)] += 1
    norms, surfaces, mtypes, ns = [], [], [], []
    for (norm, surface, mtype), n in counts.items():
        norms.append(norm)
        surfaces.append(surface)
        mtypes.append(mtype)
        ns.append(n)
    return pa.table(
        {
            "surface_norm": pa.array(norms, type=pa.string()),
            "surface": pa.array(surfaces, type=pa.string()),
            "mtype": pa.array(mtypes, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
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
            "surface_hash": pa.array([surface_hash64(norm)], type=pa.uint64()),
            "entity_id": pa.array([surface_hash64(norm)], type=pa.uint64()),
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

def partial_edge_counts(batch: pa.Table) -> pa.Table:
    """Map-side combine: triples → (edge_key, subj_id, pred, obj_id, w)."""
    counts: Counter[tuple[int, str, int]] = Counter()
    for subj, pred, obj in zip(
        batch.column("subj").to_pylist(),
        batch.column("pred").to_pylist(),
        batch.column("obj").to_pylist(),
    ):
        sid = surface_hash64(normalize_surface(subj))
        oid = surface_hash64(normalize_surface(obj))
        counts[(sid, pred, oid)] += 1
    keys, sids, preds, oids, ws = [], [], [], [], []
    for (sid, pred, oid), w in counts.items():
        keys.append(f"{sid:016x}\x00{pred}\x00{oid:016x}")
        sids.append(sid)
        preds.append(pred)
        oids.append(oid)
        ws.append(w)
    return pa.table(
        {
            "edge_key": pa.array(keys, type=pa.string()),
            "subj_id": pa.array(sids, type=pa.uint64()),
            "pred": pa.array(preds, type=pa.string()),
            "obj_id": pa.array(oids, type=pa.uint64()),
            "w": pa.array(ws, type=pa.int64()),
        }
    )


def merge_edge_group(group: pa.Table) -> pa.Table:
    return pa.table(
        {
            "subj_id": group.column("subj_id").slice(0, 1),
            "pred": group.column("pred").slice(0, 1),
            "obj_id": group.column("obj_id").slice(0, 1),
            "weight": pa.array(
                [sum(group.column("w").to_pylist())], type=pa.int64()
            ),
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
