"""Distributed connected components over a pair/edge list.

The missing step between near-dup PAIR detection (MinHash/SimHash/IVF
buckets) and actual deduplication: pairs form clusters, and the keeper is
one representative per cluster.  ``connected_components`` is iterative
min-label propagation expressed entirely in Dataset operators — per
round, every node takes the minimum label among itself and its
neighbors, which converges to min-node-id-per-component in
O(log(diameter)) rounds (near-dup clusters are shallow: a handful of
rounds closes web-scale transitive chains).

Each round is one hash-partitioned grouped Min (``shuffle.hash_grouped``)
over the (directed-both-ways) edge list joined with current labels —
no driver-side union-find, no whole-graph structure on any worker.
Convergence is detected with a constant-size order-independent label
digest per round (labels are monotone non-increasing, so digest equality
means a fixed point) — no join and no extra exchange on the check.
"""

from __future__ import annotations

import pyarrow as pa


def _digest_mix(d, l) -> int:
    """XOR-fold of the per-row 64-bit mix over two int64 vectors — the
    shared kernel of :func:`_label_digest` and the BSP shards' local
    digests (same math ⇒ same global value after XOR-combining)."""
    import numpy as np

    M1 = np.uint64(0x9E3779B97F4A7C15)
    M2 = np.uint64(0xC2B2AE3D27D4EB4F)
    M3 = np.uint64(0x27D4EB2F165667C5)
    if len(d) == 0:
        return 0
    d = np.asarray(d, dtype=np.int64).view(np.uint64)
    l = np.asarray(l, dtype=np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        mixed = (d * M1 + M3) ^ ((l + M2) * M3)
        mixed ^= mixed >> np.uint64(29)
        mixed *= M1
    return int(np.bitwise_xor.reduce(mixed)) & 0xFFFFFFFFFFFFFFFF


def _label_digest(labels_ds) -> int:
    """Order-independent digest of a (dst, label) dataset: XOR-fold of a
    per-row 64-bit mix.  Rows are keyed by distinct ``dst``, so two label
    tables digest equal iff (w.h.p.) every node's label is equal — the
    convergence test for min-label propagation without any join or
    shuffle.

    Runs as one bare Ray task per already-materialized block (the call
    sites always digest a dataset they just materialized), NOT as a Ray
    Data pass: a streaming-executor run costs a fixed ~0.5 s even over
    local blocks, and this fires once per iteration of every
    fixed-point loop.  One int per block reaches the driver."""
    import ray

    def digest_block(t: pa.Table) -> int:
        if t.num_rows == 0 or "dst" not in t.column_names:
            return 0
        return _digest_mix(
            t.column("dst").to_numpy(zero_copy_only=False),
            t.column("label").to_numpy(zero_copy_only=False),
        )

    task = ray.remote(num_cpus=0.25)(digest_block)
    parts = ray.get([task.remote(r) for r in labels_ds.to_arrow_refs()])
    out = 0
    for d in parts:
        out ^= d
    return out


def _iter_partitions(n_rows: int, num_partitions: int | None) -> int:
    """Partition count for the fixed-point loops: explicit wins; else
    size the exchange to the data (~200k rows per partition, capped at
    the session default).  Every iterative kernel here is bit-identical
    at any partition count (integer min/sum/arg-max commute), so this is
    purely an execution-plan choice — a 70-node toy graph at sf0.01 was
    paying 16-partition exchanges (hundreds of empty tasks) per round."""
    from ..shuffle import default_partitions

    if num_partitions is not None:
        return num_partitions
    return max(1, min(default_partitions(), (n_rows + 199_999) // 200_000))


def _both_directions(pairs, a: str, b: str):
    fwd = pairs.map_batches(
        lambda t: pa.table(
            {"src": t.column(a).cast(pa.int64()), "dst": t.column(b).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    rev = pairs.map_batches(
        lambda t: pa.table(
            {"src": t.column(b).cast(pa.int64()), "dst": t.column(a).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return fwd.union(rev)


def connected_components(
    pairs,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 10,
    num_partitions: int | None = None,
):
    """(a, b) pair Dataset → (doc_id, component) with component = min id
    reachable; only nodes appearing in pairs are returned."""
    from ..shuffle import hash_grouped, local_hash_join

    edges = _both_directions(pairs, a, b).materialize()
    num_partitions = _iter_partitions(edges.count(), num_partitions)
    # initial labels: self-label per distinct node
    labels = hash_grouped(
        edges.map_batches(
            lambda t: pa.table(
                {"dst": t.column("src"), "label": t.column("src")}
            ),
            batch_format="pyarrow",
        ),
        ["dst"],
        [("label", "min")],
        rename={"label_min": "label"},
        num_partitions=num_partitions,
    ).materialize()

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    label_schema = pa.schema([("src", pa.int64()), ("label", pa.int64())])
    digest = _label_digest(labels)
    for _ in range(max_iters):
        # neighbor labels: join edges on src, propagate src's label to dst.
        # local_hash_join, NOT Dataset.join: `labels` comes out of
        # map_groups, whose empty output blocks are ZERO-COLUMN tables
        # (Ray 2.49); a native-join partition fed only those loses the key
        # field and Acero aborts.  local_hash_join pads every block to an
        # explicit schema first, so sparse labels are safe at any
        # partition count.
        prop = local_hash_join(
            edges,
            labels.map_batches(
                lambda t: pa.table(
                    {"src": t.column("dst"), "label": t.column("label")}
                ),
                batch_format="pyarrow",
            ),
            on=["src"],
            left_schema=edge_schema,
            right_schema=label_schema,
            how="inner",
            num_partitions=num_partitions,
        ).select_columns(["dst", "label"])
        new_labels = hash_grouped(
            prop.union(labels),
            ["dst"],
            [("label", "min")],
            rename={"label_min": "label"},
            num_partitions=num_partitions,
        ).materialize()
        # Exchange-free convergence check: labels only ever decrease and
        # the node set is fixed, so the rounds have converged exactly when
        # the (dst, label) multiset is unchanged — compared via an
        # order-independent 64-bit XOR digest (one map pass over the
        # already-materialized labels, one tiny row per block to the
        # driver; collision probability 2^-64 per round on non-adversarial
        # ids).  Replaces a full labels⋈labels join per round.
        new_digest = _label_digest(new_labels)
        labels = new_labels
        if new_digest == digest:
            break
        digest = new_digest
    return labels.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("dst"),
                "component": t.column("label"),
            }
        ),
        batch_format="pyarrow",
    )


def node_degrees(edges, num_partitions: int | None = None):
    """edges(subj_id, pred, obj_id, weight, …) → (entity_id, n_out,
    n_in, w_out, w_in): per-node edge counts and mention-weight totals —
    the degree table that drives hub detection (head entities are the
    salting candidates) and graph-quality profiling.

    Plan: per block, explode each edge into its two endpoint rows and
    collapse them immediately with one vectorized ``group_by`` (the
    map-side combine — a hub appearing in 10^5 edges of a block leaves
    as one row), then a hash-partitioned grouped Sum on the int64
    entity id.  Exchange volume: |blocks| × |distinct-in-block nodes|.
    """
    import numpy as np

    from ..shuffle import hash_grouped

    def endpoints(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "entity_id": pa.array([], type=pa.int64()),
                    "n_out": pa.array([], type=pa.int64()),
                    "n_in": pa.array([], type=pa.int64()),
                    "w_out": pa.array([], type=pa.int64()),
                    "w_in": pa.array([], type=pa.int64()),
                }
            )
        ones = np.ones(n, dtype=np.int64)
        zeros = np.zeros(n, dtype=np.int64)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        both = pa.table(
            {
                "entity_id": pa.concat_arrays(
                    [
                        batch.column("subj_id").combine_chunks(),
                        batch.column("obj_id").combine_chunks(),
                    ]
                ),
                "n_out": pa.array(np.concatenate([ones, zeros])),
                "n_in": pa.array(np.concatenate([zeros, ones])),
                "w_out": pa.array(np.concatenate([w, zeros])),
                "w_in": pa.array(np.concatenate([zeros, w])),
            }
        )
        agg = both.group_by(["entity_id"]).aggregate(
            [("n_out", "sum"), ("n_in", "sum"), ("w_out", "sum"),
             ("w_in", "sum")]
        )
        return pa.table(
            {
                "entity_id": agg.column("entity_id"),
                "n_out": agg.column("n_out_sum"),
                "n_in": agg.column("n_in_sum"),
                "w_out": agg.column("w_out_sum"),
                "w_in": agg.column("w_in_sum"),
            }
        )

    partial = edges.map_batches(endpoints, batch_format="pyarrow")
    return hash_grouped(
        partial,
        ["entity_id"],
        [("n_out", "sum"), ("n_in", "sum"), ("w_out", "sum"),
         ("w_in", "sum")],
        rename={
            "n_out_sum": "n_out",
            "n_in_sum": "n_in",
            "w_out_sum": "w_out",
            "w_in_sum": "w_in",
        },
        num_partitions=num_partitions,
    )


def _und_and_degrees(edges_ds, num_partitions: int | None = None):
    """Shared first stage of the undirected-graph passes: distinct
    undirected (a, b) pairs (self-loops dropped, a < b) and per-node
    undirected degree (node, d).  Both materialized — each feeds
    multiple consumers downstream, so pin them to the (spillable)
    object store and execute the lineage once.  Returns
    ``(und, deg, parts)`` — the data-sized partition count
    (:func:`_iter_partitions` over the edge count) that the chained
    per-node stages should reuse, so toy graphs skip the CPU-count
    sort exchanges everywhere downstream too."""
    import numpy as np

    from ..shuffle import hash_grouped

    num_partitions = _iter_partitions(edges_ds.count(), num_partitions)

    def to_und(t: pa.Table) -> pa.Table:
        s = t.column("subj_id").to_numpy(zero_copy_only=False)
        o = t.column("obj_id").to_numpy(zero_copy_only=False)
        keep = s != o
        s, o = s[keep], o[keep]
        tb = pa.table(
            {
                "a": pa.array(np.minimum(s, o), type=pa.int64()),
                "b": pa.array(np.maximum(s, o), type=pa.int64()),
            }
        )
        return tb.group_by(["a", "b"]).aggregate([])

    und = hash_grouped(
        edges_ds.map_batches(to_und, batch_format="pyarrow"),
        ["a", "b"],
        [],
        num_partitions=num_partitions,
    ).materialize()

    def und_ends(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        nodes = pa.concat_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
        )
        out = pa.table({"node": nodes}).group_by(["node"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "node": out.column("node"),
                "c": out.column("count_all").cast(pa.int64()),
            }
        )

    deg = hash_grouped(
        und.map_batches(und_ends, batch_format="pyarrow"),
        ["node"],
        [("c", "sum")],
        rename={"c_sum": "d"},
        num_partitions=num_partitions,
    ).materialize()
    return und, deg, num_partitions


def triangle_counts(edges_ds, num_partitions: int | None = None):
    """Per-node triangle counts over the undirected entity graph —
    (entity_id, n_triangles), the local clustering signal that separates
    entities embedded in dense relational neighborhoods from star-hub
    artifacts.

    Degree-ordered orientation (Schank–Wagner / compact-forward): every
    undirected edge is directed from its lower-(degree, id) endpoint to
    the higher, wedges are generated by a self-join on the SOURCE — so a
    hub of degree d pivots only the wedges among its few lower-ranked
    neighbors instead of d²/2 — and a wedge (v, w) closes iff the
    oriented edge v→w exists.  Each triangle is emitted exactly once
    (its lowest-ranked vertex is the pivot).  All joins are padded
    int64-keyed ``local_hash_join``s; nothing graph-sized touches the
    driver.
    """
    und, deg, num_partitions = _und_and_degrees(edges_ds, num_partitions)
    return _per_node_triangles(und, deg, num_partitions)


def _oriented_triangles(und, deg, num_partitions: int | None = None):
    """Degree-ordered triangle enumeration over a prepared (und, deg)
    pair → one (u, v, w) row per triangle, rank(u) < rank(v) < rank(w)
    under the (degree, id) order — see :func:`triangle_counts` for the
    algorithm.  Shared by the per-node rollup and the k-truss peel."""
    import numpy as np

    from ..shuffle import local_hash_join

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    j1 = local_hash_join(
        und,
        deg.map_batches(
            lambda t: pa.table(
                {"a": t.column("node"), "da": t.column("d")}
            ),
            batch_format="pyarrow",
        ),
        on=["a"],
        left_schema=pair_schema,
        right_schema=pa.schema([("a", pa.int64()), ("da", pa.int64())]),
        how="inner",
        num_partitions=num_partitions,
    )
    j2 = local_hash_join(
        j1,
        deg.map_batches(
            lambda t: pa.table(
                {"b": t.column("node"), "db": t.column("d")}
            ),
            batch_format="pyarrow",
        ),
        on=["b"],
        left_schema=pair_schema.append(pa.field("da", pa.int64())),
        right_schema=pa.schema([("b", pa.int64()), ("db", pa.int64())]),
        how="inner",
        num_partitions=num_partitions,
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {
                "u": pa.array(np.where(a_first, a, b), type=pa.int64()),
                "v": pa.array(np.where(a_first, b, a), type=pa.int64()),
                "dv": pa.array(np.where(a_first, db, da), type=pa.int64()),
            }
        )

    oriented = j2.map_batches(orient, batch_format="pyarrow").materialize()
    ovw_schema = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("dv", pa.int64())]
    )
    wedged = local_hash_join(
        oriented,
        oriented.map_batches(
            lambda t: pa.table(
                {
                    "u": t.column("u"),
                    "w": t.column("v"),
                    "dw": t.column("dv"),
                }
            ),
            batch_format="pyarrow",
        ),
        on=["u"],
        left_schema=ovw_schema,
        right_schema=pa.schema(
            [("u", pa.int64()), ("w", pa.int64()), ("dw", pa.int64())]
        ),
        how="inner",
        num_partitions=num_partitions,
    )

    def wedge_filter(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        dv = t.column("dv").to_numpy(zero_copy_only=False)
        dw = t.column("dw").to_numpy(zero_copy_only=False)
        keep = (dv < dw) | ((dv == dw) & (v < w))
        return pa.table(
            {
                "u": pa.array(
                    t.column("u").to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "v": pa.array(v[keep], type=pa.int64()),
                "w": pa.array(w[keep], type=pa.int64()),
            }
        )

    wedges = wedged.map_batches(wedge_filter, batch_format="pyarrow")
    # closure: rank(v) < rank(w), so the undirected edge {v, w} — if it
    # exists — is oriented exactly v→w and a 2-key inner join suffices
    return local_hash_join(
        wedges,
        oriented.map_batches(
            lambda t: pa.table(
                {"v": t.column("u"), "w": t.column("v")}
            ),
            batch_format="pyarrow",
        ),
        on=["v", "w"],
        left_schema=pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64())]
        ),
        right_schema=pa.schema([("v", pa.int64()), ("w", pa.int64())]),
        how="inner",
        num_partitions=num_partitions,
    )


def _per_node_triangles(und, deg, num_partitions: int | None = None):
    """Per-node rollup of :func:`_oriented_triangles`."""
    from ..shuffle import hash_grouped

    triangles = _oriented_triangles(und, deg, num_partitions)

    def tri_ends(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "u" not in t.column_names:
            return pa.table(
                {
                    "entity_id": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        cols = [t.column(n).combine_chunks() for n in ("u", "v", "w")]
        out = (
            pa.table({"entity_id": pa.concat_arrays(cols)})
            .group_by(["entity_id"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "entity_id": out.column("entity_id"),
                "c": out.column("count_all").cast(pa.int64()),
            }
        )

    return hash_grouped(
        triangles.map_batches(tri_ends, batch_format="pyarrow"),
        ["entity_id"],
        [("c", "sum")],
        rename={"c_sum": "n_triangles"},
        num_partitions=num_partitions,
    )


def k_core(edges_ds, k: int = 3, max_iters: int = 30,
           num_partitions: int | None = None):
    """Nodes of the k-core of the undirected entity graph — the maximal
    subgraph where every node keeps ≥ k neighbors.  Output: (entity_id,
    degree) with the degree INSIDE the core; the standard
    dense-neighborhood filter for separating structurally-supported
    entities from extraction noise.

    Iterative peeling, each round entirely in Dataset operators:
    undirected-distinct edges → per-node degree (hash-partitioned
    grouped Sum) → survivors (degree ≥ k) → semi-join both edge
    endpoints against the survivor set (padded ``local_hash_join``; a
    removed node's edges vanish, lowering its neighbors' degrees next
    round).  Converges when the constant-size survivor count stops
    shrinking — ≤ |V| rounds in theory, a handful in practice on
    power-law graphs.  Nothing graph-sized reaches the driver.
    """
    from ..shuffle import hash_grouped, local_hash_join

    def to_und(t: pa.Table) -> pa.Table:
        import numpy as np

        s = t.column("subj_id").to_numpy(zero_copy_only=False)
        o = t.column("obj_id").to_numpy(zero_copy_only=False)
        keep = s != o
        s, o = s[keep], o[keep]
        tb = pa.table(
            {
                "a": pa.array(np.minimum(s, o), type=pa.int64()),
                "b": pa.array(np.maximum(s, o), type=pa.int64()),
            }
        )
        return tb.group_by(["a", "b"]).aggregate([])

    und = hash_grouped(
        edges_ds.map_batches(to_und, batch_format="pyarrow"),
        ["a", "b"],
        [],
        num_partitions=num_partitions,
    ).materialize()

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    id_schema = pa.schema([("node", pa.int64())])

    def ends(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        nodes = pa.concat_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
        )
        out = pa.table({"node": nodes}).group_by(["node"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "node": out.column("node"),
                "c": out.column("count_all").cast(pa.int64()),
            }
        )

    def degrees(pairs):
        return hash_grouped(
            pairs.map_batches(ends, batch_format="pyarrow"),
            ["node"],
            [("c", "sum")],
            rename={"c_sum": "degree"},
            num_partitions=num_partitions,
        )

    import pyarrow.compute as pc

    prev_nodes = None
    for _ in range(max_iters):
        deg = degrees(und).materialize()
        surv = deg.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node")
                    .combine_chunks()
                    .filter(
                        pc.greater_equal(
                            t.column("degree").combine_chunks(), k
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        n_nodes = surv.count()
        if n_nodes == 0:
            import ray

            return ray.data.from_arrow(
                pa.table(
                    {
                        "entity_id": pa.array([], type=pa.int64()),
                        "degree": pa.array([], type=pa.int64()),
                    }
                )
            )
        if prev_nodes is not None and n_nodes == prev_nodes:
            break
        prev_nodes = n_nodes
        half = local_hash_join(
            und,
            surv.map_batches(
                lambda t: pa.table({"a": t.column("node")}),
                batch_format="pyarrow",
            ),
            on=["a"],
            left_schema=pair_schema,
            right_schema=pa.schema([("a", pa.int64())]),
            how="semi",
            num_partitions=num_partitions,
        )
        und = local_hash_join(
            half,
            surv.map_batches(
                lambda t: pa.table({"b": t.column("node")}),
                batch_format="pyarrow",
            ),
            on=["b"],
            left_schema=pair_schema,
            right_schema=pa.schema([("b", pa.int64())]),
            how="semi",
            num_partitions=num_partitions,
        ).materialize()
    return degrees(und).map_batches(
        lambda t: pa.table(
            {
                "entity_id": t.column("node"),
                "degree": t.column("degree"),
            }
        ),
        batch_format="pyarrow",
    )


def _same_color_edges(t: pa.Table) -> pa.Table:
    """(src, dst, cu, cv) → (u, v, c) keeping same-color endpoints."""
    import pyarrow.compute as pc

    out = pa.table(
        {
            "u": t.column("src"),
            "v": t.column("dst"),
            "c": t.column("cu"),
        }
    )
    return out.filter(pc.equal(t.column("cu"), t.column("cv")))


def _color_roots(t: pa.Table) -> pa.Table:
    """(dst, label) color rows → (node, c) roots where color(c) = c."""
    import pyarrow.compute as pc

    out = pa.table({"node": t.column("dst"), "c": t.column("label")})
    return out.filter(pc.equal(t.column("dst"), t.column("label")))


def scc(
    edges_ds,
    max_rounds: int = 30,
    max_inner_iters: int = 50,
    num_partitions: int | None = None,
):
    """Strongly connected components of the DIRECTED entity graph —
    (entity_id, scc_id) with ``scc_id`` = min node id of the component —
    the cycle structure CC (which is undirected) cannot see: mutual-
    citation cores vs one-way reference chains.

    Orzan-style coloring, each phase in Dataset operators: (1) forward
    min-label fixpoint — color(v) = min id that reaches v (the directed
    sibling of :func:`connected_components`'s loop, digest-converged);
    (2) every color's root c (color(c) = c) seeds a backward BFS over
    reverse edges RESTRICTED to color-c nodes — any v→…→c path stays
    inside the color class (an intermediate with a smaller color would
    force color(c) < c), so the visited set is exactly SCC(c), and c is
    its min id (nothing smaller reaches c at all); (3) finished
    components leave the active set and the loop re-colors the rest.
    One SCC per color class retires per round, so rounds scale with the
    condensation-DAG's color depth (like the CC loop's diameter bound);
    per round every exchange is int64-keyed and nothing graph-sized
    reaches the driver.
    """
    from ..shuffle import hash_grouped, local_hash_join

    def to_pairs(t: pa.Table) -> pa.Table:
        import numpy as np

        s = t.column("subj_id").to_numpy(zero_copy_only=False)
        o = t.column("obj_id").to_numpy(zero_copy_only=False)
        keep = s != o
        return pa.table(
            {
                "src": pa.array(s[keep], type=pa.int64()),
                "dst": pa.array(o[keep], type=pa.int64()),
            }
        )

    def endpoints(t: pa.Table) -> pa.Table:
        # node set from ALL endpoints (before the self-loop drop, so a
        # self-loop-only node still gets its singleton component)
        cols = [
            t.column("subj_id").combine_chunks(),
            t.column("obj_id").combine_chunks(),
        ]
        return pa.table(
            {"node": pa.concat_arrays([c.cast(pa.int64()) for c in cols])}
        )

    num_partitions = _iter_partitions(edges_ds.count(), num_partitions)
    edges = hash_grouped(
        edges_ds.map_batches(to_pairs, batch_format="pyarrow"),
        ["src", "dst"],
        [],
        num_partitions=num_partitions,
    ).materialize()
    active_nodes = hash_grouped(
        edges_ds.map_batches(endpoints, batch_format="pyarrow"),
        ["node"],
        [],
        num_partitions=num_partitions,
    ).materialize()
    active_edges = edges

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    label_schema = pa.schema([("src", pa.int64()), ("label", pa.int64())])
    node_schema = pa.schema([("node", pa.int64())])
    results = []

    for _ in range(max_rounds):
        n_active = active_nodes.count()
        if n_active == 0:
            break
        parts = _iter_partitions(max(n_active, active_edges.count()), None)

        # (1) forward min-label fixpoint over the ACTIVE subgraph
        colors = active_nodes.map_batches(
            lambda t: pa.table(
                {"dst": t.column("node"), "label": t.column("node")}
            ),
            batch_format="pyarrow",
        ).materialize()
        digest = _label_digest(colors)
        for _ in range(max_inner_iters):
            prop = local_hash_join(
                active_edges,
                colors.map_batches(
                    lambda t: pa.table(
                        {"src": t.column("dst"), "label": t.column("label")}
                    ),
                    batch_format="pyarrow",
                ),
                on=["src"],
                left_schema=edge_schema,
                right_schema=label_schema,
                how="inner",
                num_partitions=parts,
            ).select_columns(["dst", "label"])
            new_colors = hash_grouped(
                prop.union(colors),
                ["dst"],
                [("label", "min")],
                rename={"label_min": "label"},
                num_partitions=parts,
            ).materialize()
            new_digest = _label_digest(new_colors)
            colors = new_colors
            if new_digest == digest:
                break
            digest = new_digest

        # (2) reverse edges restricted to same-color endpoints
        colored_schema = pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()), ("cu", pa.int64())]
        )
        e1 = local_hash_join(
            active_edges,
            colors.map_batches(
                lambda t: pa.table(
                    {"src": t.column("dst"), "cu": t.column("label")}
                ),
                batch_format="pyarrow",
            ),
            on=["src"],
            left_schema=edge_schema,
            right_schema=pa.schema([("src", pa.int64()), ("cu", pa.int64())]),
            how="inner",
            num_partitions=parts,
        )
        ecol = local_hash_join(
            e1,
            colors.map_batches(
                lambda t: pa.table(
                    {"dst": t.column("dst"), "cv": t.column("label")}
                ),
                batch_format="pyarrow",
            ),
            on=["dst"],
            left_schema=colored_schema,
            right_schema=pa.schema([("dst", pa.int64()), ("cv", pa.int64())]),
            how="inner",
            num_partitions=parts,
        ).map_batches(_same_color_edges, batch_format="pyarrow").materialize()

        # (3) backward multi-source BFS: roots → everything reaching them
        visited = colors.map_batches(
            _color_roots, batch_format="pyarrow"
        ).materialize()
        frontier = visited
        front_schema = pa.schema([("node", pa.int64()), ("c", pa.int64())])
        ecol_schema = pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("c", pa.int64())]
        )
        for _ in range(max_inner_iters):
            if frontier.count() == 0:
                break
            hop = local_hash_join(
                ecol,
                frontier.map_batches(
                    lambda t: pa.table(
                        {"v": t.column("node"), "c": t.column("c")}
                    ),
                    batch_format="pyarrow",
                ),
                on=["v", "c"],
                left_schema=ecol_schema,
                right_schema=pa.schema(
                    [("v", pa.int64()), ("c", pa.int64())]
                ),
                how="inner",
                num_partitions=parts,
            )
            cand = hash_grouped(
                hop.map_batches(
                    lambda t: pa.table(
                        {"node": t.column("u"), "c": t.column("c")}
                    ),
                    batch_format="pyarrow",
                ),
                ["node", "c"],
                [],
                num_partitions=parts,
            )
            new_front = local_hash_join(
                cand,
                visited.select_columns(["node"]),
                on=["node"],
                left_schema=front_schema,
                right_schema=node_schema,
                how="anti",
                num_partitions=parts,
            ).materialize()
            if new_front.count() == 0:
                break
            visited = visited.union(new_front).materialize()
            frontier = new_front

        results.append(
            visited.map_batches(
                lambda t: pa.table(
                    {
                        "entity_id": t.column("node"),
                        "scc_id": t.column("c"),
                    }
                ),
                batch_format="pyarrow",
            ).materialize()
        )

        # (4) retire finished components
        active_nodes = local_hash_join(
            active_nodes,
            visited.select_columns(["node"]),
            on=["node"],
            left_schema=node_schema,
            right_schema=node_schema,
            how="anti",
            num_partitions=parts,
        ).materialize()
        half = local_hash_join(
            active_edges,
            active_nodes.map_batches(
                lambda t: pa.table({"src": t.column("node")}),
                batch_format="pyarrow",
            ),
            on=["src"],
            left_schema=edge_schema,
            right_schema=pa.schema([("src", pa.int64())]),
            how="semi",
            num_partitions=parts,
        )
        active_edges = local_hash_join(
            half,
            active_nodes.map_batches(
                lambda t: pa.table({"dst": t.column("node")}),
                batch_format="pyarrow",
            ),
            on=["dst"],
            left_schema=edge_schema,
            right_schema=pa.schema([("dst", pa.int64())]),
            how="semi",
            num_partitions=parts,
        ).materialize()
    else:
        if active_nodes.count() > 0:
            raise ValueError(
                "scc: max_rounds exhausted with active nodes remaining"
            )

    if not results:
        import ray as _ray

        return _ray.data.from_arrow(
            pa.table(
                {
                    "entity_id": pa.array([], type=pa.int64()),
                    "scc_id": pa.array([], type=pa.int64()),
                }
            )
        )
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return out


def k_truss(edges_ds, k: int = 4, max_iters: int = 8,
            num_partitions: int | None = None):
    """Edges of the k-truss of the undirected entity graph — the maximal
    subgraph where every edge sits in ≥ k−2 triangles — with the
    edge's support INSIDE the truss: (a, b, support).  The edge-level
    cohesion filter one notch stronger than k-core: a k-core keeps
    star-hub spokes, a k-truss demands every kept edge be triangle-
    reinforced, which is the right noise gate for co-occurrence KGs.

    Iterative support peeling: per round, degree-ordered triangle
    enumeration (:func:`_oriented_triangles` — hubs never pivot), one
    grouped Sum rolls triangle contributions up to their three
    undirected edge keys, and edges under ``k − 2`` drop (zero-support
    edges drop implicitly: they never earn a support row).  Converges
    when the constant-size edge count stops shrinking; capped at
    ``max_iters`` rounds to match the SQL replay exactly (a converged
    peel re-emits its fixpoint unchanged, so cap and convergence agree).
    Nothing graph-sized reaches the driver.
    """
    import numpy as np

    from ..shuffle import hash_grouped

    und, deg, num_partitions = _und_and_degrees(edges_ds, num_partitions)

    def pair_degrees(pairs):
        def ends(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "a" not in t.column_names:
                return pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "c": pa.array([], type=pa.int64()),
                    }
                )
            nodes = pa.concat_arrays(
                [
                    t.column("a").combine_chunks(),
                    t.column("b").combine_chunks(),
                ]
            )
            out = pa.table({"node": nodes}).group_by(["node"]).aggregate(
                [([], "count_all")]
            )
            return pa.table(
                {
                    "node": out.column("node"),
                    "c": out.column("count_all").cast(pa.int64()),
                }
            )

        return hash_grouped(
            pairs.map_batches(ends, batch_format="pyarrow"),
            ["node"],
            [("c", "sum")],
            rename={"c_sum": "d"},
            num_partitions=num_partitions,
        )

    def edge_support(pairs, degs):
        tri = _oriented_triangles(pairs, degs, num_partitions)

        def tri_edges(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "u" not in t.column_names:
                return pa.table(
                    {
                        "a": pa.array([], type=pa.int64()),
                        "b": pa.array([], type=pa.int64()),
                        "c": pa.array([], type=pa.int64()),
                    }
                )
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            w = t.column("w").to_numpy(zero_copy_only=False)
            # the three undirected edges of each triangle, id-normalized
            x = np.concatenate([u, v, u])
            y = np.concatenate([v, w, w])
            tb = pa.table(
                {
                    "a": pa.array(np.minimum(x, y), type=pa.int64()),
                    "b": pa.array(np.maximum(x, y), type=pa.int64()),
                }
            )
            out = tb.group_by(["a", "b"]).aggregate([([], "count_all")])
            return pa.table(
                {
                    "a": out.column("a"),
                    "b": out.column("b"),
                    "c": out.column("count_all").cast(pa.int64()),
                }
            )

        return hash_grouped(
            tri.map_batches(tri_edges, batch_format="pyarrow"),
            ["a", "b"],
            [("c", "sum")],
            rename={"c_sum": "support"},
            num_partitions=num_partitions,
        )

    prev_edges = und.count()
    supp = None
    for _ in range(max_iters):
        supp = edge_support(und, deg).materialize()

        def keep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(
                pc.greater_equal(t.column("support"), k - 2)
            ).select(["a", "b"])

        kept = supp.map_batches(keep, batch_format="pyarrow").materialize()
        n = kept.count()
        if n == 0:
            import ray

            return ray.data.from_arrow(
                pa.table(
                    {
                        "a": pa.array([], type=pa.int64()),
                        "b": pa.array([], type=pa.int64()),
                        "support": pa.array([], type=pa.int64()),
                    }
                )
            )
        und = kept
        if n == prev_edges:
            break
        prev_edges = n
        deg = pair_degrees(und).materialize()
    final = edge_support(und, deg)

    def trim(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("support"), k - 2))

    return final.map_batches(trim, batch_format="pyarrow")


def bfs_hops(
    edges_ds,
    source: int,
    max_hops: int = 15,
    num_partitions: int | None = None,
):
    """Directed single-source shortest-hop distances over the entity
    graph — (entity_id, hop) for every node reachable from ``source``
    within ``max_hops`` edges.  The KG reachability primitive: "what can
    this entity influence in ≤ k steps" (impact analysis, crawl
    frontier prioritization, subgraph extraction around a seed).

    Distributed frontier expansion: per round ONE padded int64 join of
    the (static, materialized-once) distinct edge list against the
    current frontier, a distinct pass over the discovered targets, and
    an anti-join against the visited set — all
    ``shuffle.local_hash_join`` / ``hash_grouped`` exchanges keyed on
    int64 ids.  Driver state per round is one scalar (new-frontier
    count); the frontier/visited tables never leave the object store.
    Rounds are bounded by ``max_hops`` (the oracle cap) and stop early
    when the frontier empties — ≤ graph diameter rounds in practice.
    """
    import numpy as np

    from ..shuffle import hash_grouped, local_hash_join

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t.column("subj_id").cast(pa.int64()),
                "dst": t.column("obj_id").cast(pa.int64()),
            }
        )

    edg = hash_grouped(
        edges_ds.map_batches(to_pairs, batch_format="pyarrow"),
        ["src", "dst"],
        [],
        num_partitions=num_partitions,
    ).materialize()
    num_partitions = _iter_partitions(edg.count(), num_partitions)

    import ray

    def seed_tbl(hop: int) -> pa.Table:
        return pa.table(
            {
                "entity_id": pa.array([source], type=pa.int64()),
                "hop": pa.array([hop], type=pa.int64()),
            }
        )

    visited = ray.data.from_arrow(seed_tbl(0)).materialize()
    frontier = visited
    id_schema = pa.schema([("entity_id", pa.int64())])
    vis_schema = pa.schema([("entity_id", pa.int64()), ("hop", pa.int64())])

    for hop in range(1, max_hops + 1):
        reached = local_hash_join(
            edg.map_batches(
                lambda t: pa.table(
                    {"entity_id": t.column("src"), "dst": t.column("dst")}
                ),
                batch_format="pyarrow",
            ),
            frontier.map_batches(
                lambda t: pa.table({"entity_id": t.column("entity_id")}),
                batch_format="pyarrow",
            ),
            on=["entity_id"],
            left_schema=pa.schema(
                [("entity_id", pa.int64()), ("dst", pa.int64())]
            ),
            right_schema=id_schema,
            how="semi",
            num_partitions=num_partitions,
        )
        candidates = hash_grouped(
            reached.map_batches(
                lambda t: pa.table({"entity_id": t.column("dst")}),
                batch_format="pyarrow",
            ),
            ["entity_id"],
            [],
            num_partitions=num_partitions,
        )
        fresh = local_hash_join(
            candidates,
            visited,
            on=["entity_id"],
            left_schema=id_schema,
            right_schema=vis_schema,
            how="anti",
            num_partitions=num_partitions,
        )

        def add_hop(t: pa.Table, h: int = hop) -> pa.Table:
            return pa.table(
                {
                    "entity_id": t.column("entity_id"),
                    "hop": pa.array(
                        np.full(len(t), h, dtype=np.int64), type=pa.int64()
                    ),
                }
            )

        frontier = fresh.map_batches(
            add_hop, batch_format="pyarrow"
        ).materialize()
        if frontier.count() == 0:
            break
        visited = visited.union(frontier).materialize()

    return visited


#: Mix multipliers for :func:`random_walks` neighbor selection — all
#: < 2**32 so the SQL oracle's HUGEINT replay of the wrapping int64
#: products stays inside int128 (see ``__ray_entry__._walks_sql``).
RW_M1 = 2654435761
RW_M2 = 40503
RW_M3 = 2246822519


def random_walks(
    edges_ds,
    walk_len: int = 8,
    walks_per_node: int = 2,
    seed: int = 42,
    num_partitions: int | None = None,
):
    """Deterministic random-walk corpus over the directed entity graph —
    (start_node, walk_no, step, entity_id): ``walks_per_node`` walks of
    up to ``walk_len`` steps from every node, the DeepWalk/node2vec
    training-sequence generator for graph-embedding pipelines.

    "Random" is a pure function of (current node, step, walk identity,
    seed): the next neighbor's index is a wrapping-int64 linear mix
    reduced mod out-degree, and neighbors are ranked by ascending id —
    so the corpus is bit-identical at any parallelism/cluster size (no
    RNG state to ship or synchronize) and an independent SQL engine can
    replay it (the ``kg_random_walks`` oracle).  Walks stop early at
    sinks (no out-edges), matching the classic dangling-walk semantics.

    Distributed plan: the adjacency is ranked ONCE per src partition
    (vectorized lexsort kernel inside ``hash_partitioned``) and each
    adjacency row also carries its DESTINATION's out-degree (one
    build-time left-outer join) — so a walker always knows the degree
    of the node it just arrived at and each step costs exactly ONE
    padded (src, rank) join, not a degree join plus a pick join.
    Driver state per step is one scalar (live walk count); states and
    adjacency stay in the object store.
    """
    import numpy as np

    from ..shuffle import hash_partitioned, local_hash_join

    K = walks_per_node

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t.column("subj_id").cast(pa.int64()),
                "dst": t.column("obj_id").cast(pa.int64()),
            }
        )

    def rank_block(t: pa.Table) -> pa.Table:
        # distinct + rank + per-src degree in ONE vectorized kernel:
        # the partition holds every row of its src keys
        if len(t) == 0 or "src" not in t.column_names:
            return pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "rk": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                    "d": pa.array([], type=pa.int64()),
                }
            )
        dd = t.group_by(["src", "dst"]).aggregate([])
        src = dd.column("src").to_numpy(zero_copy_only=False)
        dst = dd.column("dst").to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        n = len(src)
        starts = np.zeros(n, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = src[1:] != src[:-1]
        starts[new] = np.arange(n)[new]
        starts = np.maximum.accumulate(starts)
        idx = np.flatnonzero(new)
        counts = np.diff(np.append(idx, n))
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "rk": pa.array(np.arange(n) - starts, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
                "d": pa.array(np.repeat(counts, counts), type=pa.int64()),
            }
        )

    adjr = hash_partitioned(
        edges_ds.map_batches(to_pairs, batch_format="pyarrow"),
        ["src"],
        rank_block,
        num_partitions=num_partitions,
    ).materialize()
    num_partitions = _iter_partitions(adjr.count(), num_partitions)
    def first_ranks(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column("rk"), 0)).select(["src", "d"])

    # (src, d) per node WITH out-edges — a filter over adjr, no exchange
    degs = adjr.map_batches(first_ranks, batch_format="pyarrow")
    # fold the DESTINATION's out-degree onto each adjacency row (sinks
    # get 0), so stepping needs no separate degree join
    adjr = local_hash_join(
        adjr.map_batches(
            lambda t: pa.table(
                {
                    "dst": t.column("dst"),
                    "src": t.column("src"),
                    "rk": t.column("rk"),
                    "d": t.column("d"),
                }
            ),
            batch_format="pyarrow",
        ),
        degs.map_batches(
            lambda t: pa.table(
                {"dst": t.column("src"), "d_dst": t.column("d")}
            ),
            batch_format="pyarrow",
        ),
        on=["dst"],
        left_schema=pa.schema(
            [
                ("dst", pa.int64()),
                ("src", pa.int64()),
                ("rk", pa.int64()),
                ("d", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("dst", pa.int64()), ("d_dst", pa.int64())]),
        how="left_outer",
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "rk": t.column("rk"),
                "dst": t.column("dst"),
                "d_dst": t.column("d_dst").fill_null(0),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    # start set: every node, K walks each; seed walkers with their
    # node's out-degree via ONE left-outer join (sinks get d=0 and die
    # before step 1, after emitting their step-0 row)
    def starts_block(t: pa.Table) -> pa.Table:
        e = t.column("entity_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.repeat(e, K), type=pa.int64()),
                "start_node": pa.array(np.repeat(e, K), type=pa.int64()),
                "walk_no": pa.array(
                    np.tile(np.arange(K, dtype=np.int64), len(e)),
                    type=pa.int64(),
                ),
            }
        )

    starts = node_degrees(
        edges_ds, num_partitions=num_partitions
    ).map_batches(starts_block, batch_format="pyarrow")
    state = local_hash_join(
        starts,
        degs,
        on=["src"],
        left_schema=pa.schema(
            [
                ("src", pa.int64()),
                ("start_node", pa.int64()),
                ("walk_no", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("src", pa.int64()), ("d", pa.int64())]),
        how="left_outer",
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {
                "start_node": t.column("start_node"),
                "walk_no": t.column("walk_no"),
                "cur": t.column("src"),
                "d": t.column("d").fill_null(0),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def emit(step: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "start_node": t.column("start_node"),
                    "walk_no": t.column("walk_no"),
                    "step": pa.array(
                        np.full(len(t), step, dtype=np.int64),
                        type=pa.int64(),
                    ),
                    "entity_id": t.column("cur"),
                }
            )

        return fn

    out = state.map_batches(emit(0), batch_format="pyarrow")

    for t_step in range(1, walk_len + 1):

        def pick(t: pa.Table, ts: int = t_step) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.greater(t.column("d"), 0))  # sinks: walk over
            cur = t.column("cur").to_numpy(zero_copy_only=False)
            st = t.column("start_node").to_numpy(zero_copy_only=False)
            wn = t.column("walk_no").to_numpy(zero_copy_only=False)
            d = t.column("d").to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                uw = st * np.int64(K) + wn
                h = (
                    cur * np.int64(RW_M1)
                    + np.int64(ts) * np.int64(RW_M2)
                    + uw * np.int64(RW_M3)
                    + np.int64(seed)
                )
            rk = np.zeros(len(t), dtype=np.int64)
            if len(t):
                rk = (
                    h.view(np.uint64) % d.astype(np.uint64)
                ).astype(np.int64)
            return pa.table(
                {
                    "src": t.column("cur"),
                    "rk": pa.array(rk, type=pa.int64()),
                    "start_node": t.column("start_node"),
                    "walk_no": t.column("walk_no"),
                }
            )

        stepped = local_hash_join(
            state.map_batches(pick, batch_format="pyarrow"),
            adjr,
            on=["src", "rk"],
            left_schema=pa.schema(
                [
                    ("src", pa.int64()),
                    ("rk", pa.int64()),
                    ("start_node", pa.int64()),
                    ("walk_no", pa.int64()),
                ]
            ),
            right_schema=pa.schema(
                [
                    ("src", pa.int64()),
                    ("rk", pa.int64()),
                    ("dst", pa.int64()),
                    ("d_dst", pa.int64()),
                ]
            ),
            how="inner",
            num_partitions=num_partitions,
        )
        state = stepped.map_batches(
            lambda t: pa.table(
                {
                    "start_node": t.column("start_node"),
                    "walk_no": t.column("walk_no"),
                    "cur": t.column("dst"),
                    "d": t.column("d_dst"),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if state.count() == 0:
            break
        out = out.union(state.map_batches(emit(t_step), batch_format="pyarrow"))

    return out


def walk_pairs(walks_ds, window: int = 2, num_partitions: int | None = None):
    """Skip-gram training pairs from a random-walk corpus —
    (center, context, n): every ordered co-occurrence of two entities
    within ``window`` steps on the same walk, weighted by how often it
    occurs across the corpus.  This is the actual DeepWalk deliverable:
    the (center, context) stream a word2vec-style embedding trainer
    consumes, with n as the pair weight.

    One exchange co-locates each walk's rows (hash-partition on the
    (start_node, walk_no) identity), a vectorized kernel pairs offsets
    1..window in both directions and pre-counts per partition, and a
    grouped Sum merges the partials — pair volume is
    2·window·|corpus rows| before combining, never quadratic.
    """
    import numpy as np

    from ..shuffle import hash_grouped, hash_partitioned

    def pair_kernel(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "step" not in t.column_names:
            return pa.table(
                {
                    "center": pa.array([], type=pa.int64()),
                    "context": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        sn = t.column("start_node").to_numpy(zero_copy_only=False)
        wn = t.column("walk_no").to_numpy(zero_copy_only=False)
        st = t.column("step").to_numpy(zero_copy_only=False)
        ent = t.column("entity_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((st, wn, sn))
        sn, wn, st, ent = sn[order], wn[order], st[order], ent[order]
        centers, contexts = [], []
        for k in range(1, window + 1):
            if len(sn) <= k:
                break
            # rows k apart are k steps apart iff they belong to the same
            # (gap-free) walk — the step check covers truncated walks
            same = (
                (sn[:-k] == sn[k:])
                & (wn[:-k] == wn[k:])
                & (st[k:] - st[:-k] == k)
            )
            centers.append(ent[:-k][same])
            contexts.append(ent[k:][same])
            # symmetric context: both directions, like word2vec windows
            centers.append(ent[k:][same])
            contexts.append(ent[:-k][same])
        if not centers:
            return pa.table(
                {
                    "center": pa.array([], type=pa.int64()),
                    "context": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        out = (
            pa.table(
                {
                    "center": pa.array(
                        np.concatenate(centers), type=pa.int64()
                    ),
                    "context": pa.array(
                        np.concatenate(contexts), type=pa.int64()
                    ),
                }
            )
            .group_by(["center", "context"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "center": out.column("center"),
                "context": out.column("context"),
                "n": out.column("count_all").cast(pa.int64()),
            }
        )

    partials = hash_partitioned(
        walks_ds,
        ["start_node", "walk_no"],
        pair_kernel,
        num_partitions=num_partitions,
    )
    return hash_grouped(
        partials,
        ["center", "context"],
        [("n", "sum")],
        rename={"n_sum": "n"},
        num_partitions=num_partitions,
    )


def edge_pmi(edges_ds, num_partitions: int | None = None):
    """Edge association scoring: pointwise mutual information of every
    (subj → obj) edge under the weighted-degree null model,

        pmi = ln( (weight · W) / (w_out(subj) · w_in(obj)) )

    with ``W`` the total edge weight.  Separates edges asserted because
    the two entities genuinely co-occur from edges expected by chance
    between two hubs — the standard re-weighting before thresholding a
    co-occurrence KG.

    Plan: degrees via :func:`node_degrees` (hash-partitioned combine),
    ``W`` as one driver scalar, then two int64-keyed ``local_hash_join``
    passes (subj side, obj side; the degree table descends from
    map_groups, so the padded join is required, not just preferred) and a
    stateless scoring map.  Nothing corpus-sized is broadcast.

    The log runs per distinct ratio via libm ``math.log`` (DuckDB's
    ``ln`` twin is bit-identical; SIMD ``np.log`` is not) — the int64
    products are exact, the double casts mirror the SQL, and the scores
    hash-match the oracle bit for bit.
    """
    import math

    import numpy as np

    from ..shuffle import local_hash_join, sized_partitions

    num_partitions = sized_partitions(edges_ds.count(), num_partitions)
    degs = node_degrees(edges_ds, num_partitions=num_partitions)
    total_w = int(edges_ds.sum("weight"))

    edge_schema = pa.schema(
        [
            ("subj_id", pa.int64()),
            ("pred", pa.string()),
            ("obj_id", pa.int64()),
            ("weight", pa.int64()),
        ]
    )
    s_joined = local_hash_join(
        edges_ds.select_columns(["subj_id", "pred", "obj_id", "weight"]),
        degs.map_batches(
            lambda t: pa.table(
                {
                    "subj_id": t.column("entity_id"),
                    "w_out": t.column("w_out"),
                }
            ),
            batch_format="pyarrow",
        ),
        on=["subj_id"],
        left_schema=edge_schema,
        right_schema=pa.schema(
            [("subj_id", pa.int64()), ("w_out", pa.int64())]
        ),
        how="inner",
        num_partitions=num_partitions,
    )
    o_joined = local_hash_join(
        s_joined,
        degs.map_batches(
            lambda t: pa.table(
                {
                    "obj_id": t.column("entity_id"),
                    "w_in": t.column("w_in"),
                }
            ),
            batch_format="pyarrow",
        ),
        on=["obj_id"],
        left_schema=edge_schema.append(pa.field("w_out", pa.int64())),
        right_schema=pa.schema(
            [("obj_id", pa.int64()), ("w_in", pa.int64())]
        ),
        how="inner",
        num_partitions=num_partitions,
    )

    def score(t: pa.Table) -> pa.Table:
        w = t.column("weight").to_pylist()
        wo = t.column("w_out").to_pylist()
        wi = t.column("w_in").to_pylist()
        # exact int64 products, double casts, one division, libm log —
        # the precise op sequence the SQL twin performs.  log cost is
        # paid once per DISTINCT (w, wo, wi) triple (Zipfian weights:
        # few distincts per block).
        cache: dict = {}
        pmi = np.empty(len(w), dtype=np.float64)
        for i, key in enumerate(zip(w, wo, wi)):
            v = cache.get(key)
            if v is None:
                v = math.log(
                    float(key[0] * total_w) / float(key[1] * key[2])
                )
                cache[key] = v
            pmi[i] = v
        return pa.table(
            {
                "subj_id": t.column("subj_id"),
                "pred": t.column("pred"),
                "obj_id": t.column("obj_id"),
                "weight": t.column("weight"),
                "pmi": pa.array(pmi, type=pa.float64()),
            }
        )

    return o_joined.map_batches(score, batch_format="pyarrow")


#: Fixed-point scale for :func:`pagerank` rank mass — 2**42.  A power of
#: two so the final ``rank_fp / PR_SCALE`` float64 conversion is EXACT
#: (both in numpy and in the DuckDB oracle), fine enough (quantum
#: ≈ 2.3e-13) that the quantized result tracks true float PageRank to
#: well under any useful tolerance.
PR_SCALE = 1 << 42


def pagerank(
    edges,
    iters: int = 8,
    damping: float = 0.85,
    num_partitions: int | None = None,
    seeds: "list[int] | None" = None,
):
    """edges(subj_id, obj_id, weight, …) → (entity_id, rank): weighted
    PageRank with uniform dangling-mass redistribution — the standard
    entity-importance score over the constructed graph (hub ranking,
    canonical-entity selection, crawl prioritization).

    ``seeds`` switches to PERSONALIZED PageRank: initial mass, the
    teleport term, and the dangling redistribution all go to the seed
    set instead of all nodes (the "importance relative to these
    entities" score — neighborhood curation, related-entity expansion).
    ``seeds=None`` is bit-identical to the original op (same denominator
    n_nodes everywhere), so the existing oracle stays valid.  The seed
    list is a handful of int64 ids shipped as task literals — never a
    broadcast table.

    Fully distributed iterations: each round joins current ranks onto
    the edge list by source (``shuffle.local_hash_join`` — the rank
    table re-exchanges, the edge list's partitioning is reused by key),
    emits ``rank · w/w_out`` contributions, and sums them per target
    with a hash-partitioned grouped Sum.  Driver state per round is TWO
    scalars (dangling mass, for nodes with no outgoing weight, and the
    node count) — never a vector.

    **Deterministic fixed-point arithmetic**: rank mass is carried as
    int64 units of ``1/PR_SCALE`` (2⁻⁴²).  Float summation across blocks
    is order-dependent, so a float implementation gives a different
    last-bit answer on every cluster size / block arrival order; integer
    addition commutes exactly, so this result is bit-reproducible on any
    topology AND value-checkable by an independent SQL engine (the
    ``kg_pagerank`` DuckDB oracle replays the identical integer ops).
    Per-edge contribution is ``(rank_fp * w) // w_out`` (exact int64
    product, floor divide); ``damping`` is quantized to 1/1000ths
    (0.85 → 850/1000) and applied as ``(dnum * mass) // 1000``.  Each
    floor op loses < 1 unit (2.3e-13) of mass per row per round —
    far below float noise for any real tolerance.
    """
    import numpy as np

    from ..shuffle import hash_grouped, local_hash_join

    dnum = round(damping * 1000)
    # project to the three loop columns FIRST and materialize once —
    # the degree aggregate and every iteration then reuse the pinned
    # blocks instead of re-reading (and re-parsing) the wide edge input
    edge_tbl = edges.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("subj_id").cast(pa.int64()),
                "dst": t.column("obj_id").cast(pa.int64()),
                "w": t.column("weight").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    num_partitions = _iter_partitions(edge_tbl.count(), num_partitions)
    deg = node_degrees(
        edge_tbl.map_batches(
            lambda t: t.rename_columns(["subj_id", "obj_id", "weight"]),
            batch_format="pyarrow",
        ),
        num_partitions=num_partitions,
    ).materialize()
    n_nodes = deg.count()
    seeds_arr = (
        np.unique(np.asarray(seeds, dtype=np.int64))
        if seeds is not None
        else None
    )
    if seeds_arr is not None:
        # Normalize by seeds PRESENT in the graph, not the raw seed list:
        # an absent seed id would silently shrink total rank mass below 1
        # and diverge from the SQL twin (whose seeds CTE only selects
        # existing nodes).  deg is materialized, so membership is a
        # constant-size bare-task reduce over its blocks.
        import ray as _ray

        def _present_block(t: pa.Table) -> np.ndarray:
            if t.num_rows == 0 or "entity_id" not in t.column_names:
                return seeds_arr[:0]
            ids = t.column("entity_id").to_numpy(zero_copy_only=False)
            return seeds_arr[np.isin(seeds_arr, ids)]

        present_task = _ray.remote(num_cpus=0.25)(_present_block)
        seeds_arr = np.unique(
            np.concatenate(
                _ray.get(
                    [present_task.remote(r) for r in deg.to_arrow_refs()]
                )
            )
        )
        if len(seeds_arr) == 0:
            raise ValueError(
                "personalized pagerank: no seed id exists in the graph"
            )
    n_base = n_nodes if seeds_arr is None else len(seeds_arr)
    init_fp = PR_SCALE // n_base
    base_fp = (1000 - dnum) * PR_SCALE // (1000 * n_base)

    def init_rank(batch: pa.Table) -> pa.Table:
        ids = batch.column("entity_id").to_numpy(zero_copy_only=False)
        if seeds_arr is None:
            fp = np.full(len(batch), init_fp, dtype=np.int64)
        else:
            fp = np.where(np.isin(ids, seeds_arr), init_fp, 0).astype(
                np.int64
            )
        return pa.table(
            {
                "entity_id": batch.column("entity_id"),
                "rank_fp": pa.array(fp, type=pa.int64()),
                "w_out": batch.column("w_out"),
            }
        )

    ranks = deg.map_batches(init_rank, batch_format="pyarrow").materialize()
    rank_schema = pa.schema(
        [
            ("entity_id", pa.int64()),
            ("rank_fp", pa.int64()),
            ("w_out", pa.int64()),
        ]
    )
    edge_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("w", pa.int64())]
    )

    import ray

    def dangling_block(t: pa.Table) -> int:
        # rank mass stuck on dangling nodes, one scalar per block — bare
        # Ray tasks over the just-materialized rank blocks (a Ray Data
        # aggregate pass costs a fixed ~0.5 s executor run per round)
        if t.num_rows == 0 or "w_out" not in t.column_names:
            return 0
        r = t.column("rank_fp").to_numpy(zero_copy_only=False)
        w = t.column("w_out").to_numpy(zero_copy_only=False)
        return int(r[w == 0].sum())

    dangling_task = ray.remote(num_cpus=0.25)(dangling_block)

    for _ in range(iters):
        # constant-size driver reduce: rank mass stuck on dangling nodes
        dangling = sum(
            ray.get(
                [dangling_task.remote(r) for r in ranks.to_arrow_refs()]
            )
        )
        joined = local_hash_join(
            edge_tbl.map_batches(
                lambda t: t.rename_columns(["entity_id", "dst", "w"]),
                batch_format="pyarrow",
            ),
            ranks,
            on=["entity_id"],
            left_schema=pa.schema(
                [("entity_id", pa.int64()), ("dst", pa.int64()),
                 ("w", pa.int64())]
            ),
            right_schema=rank_schema,
            num_partitions=num_partitions,
        )

        def contrib(batch: pa.Table) -> pa.Table:
            w = batch.column("w").to_numpy(zero_copy_only=False)
            wout = batch.column("w_out").to_numpy(zero_copy_only=False)
            r = batch.column("rank_fp").to_numpy(zero_copy_only=False)
            if len(batch) and int(r.max()) * int(w.max()) >= 2**62:
                # exact int64 product is the determinism guarantee; a
                # graph hot enough to overflow it needs a bigger
                # weight-normalization upstream, not silent wraparound
                raise OverflowError(
                    "pagerank fixed-point product would overflow int64; "
                    "normalize edge weights first"
                )
            return pa.table(
                {
                    "entity_id": batch.column("dst"),
                    # exact int64 product then floor divide — the op
                    # sequence the SQL oracle replays verbatim
                    "c": pa.array(
                        (r * w) // np.maximum(wout, 1), type=pa.int64()
                    ),
                    # schema-aligned with the zero-contribution node rows
                    # (w_out rides the same aggregate as a Max)
                    "w_out": pa.array(
                        np.zeros(len(batch), dtype=np.int64),
                        type=pa.int64(),
                    ),
                }
            )

        # Nodes with no in-edges would be absent from the contribution
        # sum, so union a zero-contribution row per node (carrying its
        # w_out) and fold the rebuild into the SAME grouped aggregate —
        # one exchange instead of a sum plus a left-outer join per round
        # (w_out is ≥ 0 and rides as a Max: contribution rows carry 0,
        # the node row carries the true value).
        zero_rows = deg.map_batches(
            lambda t: pa.table(
                {
                    "entity_id": t.column("entity_id"),
                    "c": pa.array(
                        np.zeros(len(t), dtype=np.int64), type=pa.int64()
                    ),
                    "w_out": t.column("w_out"),
                }
            ),
            batch_format="pyarrow",
        )
        contribs = joined.map_batches(contrib, batch_format="pyarrow")
        merged = hash_grouped(
            contribs.union(zero_rows),
            ["entity_id"],
            [("c", "sum"), ("w_out", "max")],
            rename={"c_sum": "c", "w_out_max": "w_out"},
            num_partitions=num_partitions,
        )
        dang_share = dangling // n_base

        def finish(batch: pa.Table) -> pa.Table:
            c = batch.column("c").to_numpy(zero_copy_only=False)
            if seeds_arr is None:
                fp = base_fp + (dnum * (c + dang_share)) // 1000
            else:
                is_seed = np.isin(
                    batch.column("entity_id").to_numpy(
                        zero_copy_only=False
                    ),
                    seeds_arr,
                )
                fp = np.where(is_seed, base_fp, 0) + (
                    dnum * (c + np.where(is_seed, dang_share, 0))
                ) // 1000
            return pa.table(
                {
                    "entity_id": batch.column("entity_id"),
                    "rank_fp": pa.array(fp, type=pa.int64()),
                    "w_out": batch.column("w_out"),
                }
            )

        ranks = merged.map_batches(
            finish, batch_format="pyarrow"
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t.column("entity_id"),
                # power-of-two divisor: the float64 conversion is exact
                "rank": pc_divide_exact(t.column("rank_fp")),
            }
        ),
        batch_format="pyarrow",
    )


def pc_divide_exact(rank_fp: "pa.ChunkedArray | pa.Array"):
    """rank_fp / PR_SCALE as float64 — exact because PR_SCALE is 2**42
    and every rank_fp < 2**53 (total mass ≤ PR_SCALE)."""
    import pyarrow.compute as pc

    return pc.divide(
        rank_fp.cast(pa.float64()), pa.scalar(float(PR_SCALE))
    )


#: HITS score scale — smaller than PR_SCALE because each round's raw
#: authority total is bounded by HITS_SCALE × max(w_out): 2³⁰ keeps that
#: product (and the per-edge ``hub_fp * w`` term) far inside int64 for
#: any node with out-weight below ~2³², while ``fp / HITS_SCALE`` stays
#: an exact float64 conversion (power of two, fp < 2⁵³).
HITS_SCALE = 1 << 30


def hits(edges, iters: int = 5, num_partitions: int | None = None):
    """edges(subj_id, obj_id, weight, …) → (entity_id, auth, hub):
    weighted HITS hubs-and-authorities over the constructed KG — the
    classic link-analysis complement to :func:`pagerank` (authorities =
    entities many hub entities point at; hubs = entities whose relations
    fan out to strong authorities).  Kleinberg 1999, L1-normalized
    variant (normalization is a per-round uniform rescale, so the
    *ranking* matches the textbook L2 variant while staying exactly
    replayable in integer arithmetic).

    Same determinism discipline as :func:`pagerank`: scores are int64
    fixed-point in units of ``1/HITS_SCALE``; each round computes
    ``auth_raw(v) = Σ_{(u,v,w)} hub_fp(u)·w`` with a rank→edge
    ``local_hash_join`` plus one hash-partitioned grouped Sum, rescales
    by the driver-scalar total (``fp = raw // max(total // HITS_SCALE,
    1)`` — int ops only, so the DuckDB twin replays them verbatim), then
    the mirror pass for hubs.  Driver state per round is one scalar per
    phase; per-round exchanges: 2 joins + 2 grouped sums, all sized by
    :func:`_iter_partitions`.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from ..shuffle import hash_grouped, local_hash_join

    edge_tbl = edges.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("subj_id").cast(pa.int64()),
                "dst": t.column("obj_id").cast(pa.int64()),
                "w": t.column("weight").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    num_partitions = _iter_partitions(edge_tbl.count(), num_partitions)
    deg = node_degrees(
        edge_tbl.map_batches(
            lambda t: t.rename_columns(["subj_id", "obj_id", "weight"]),
            batch_format="pyarrow",
        ),
        num_partitions=num_partitions,
    ).materialize()
    n_nodes = deg.count()
    init_fp = HITS_SCALE // max(n_nodes, 1)

    score_schema = pa.schema(
        [("entity_id", pa.int64()), ("fp", pa.int64())]
    )

    def init_scores(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity_id": batch.column("entity_id"),
                "fp": pa.array(
                    np.full(len(batch), init_fp, dtype=np.int64)
                ),
            }
        )

    hub = deg.map_batches(init_scores, batch_format="pyarrow").materialize()
    auth = hub

    def total_block(t: pa.Table) -> int:
        # one scalar per block over the just-materialized raw sums —
        # bare tasks, same rationale as pagerank's dangling reduce
        if t.num_rows == 0 or "c" not in t.column_names:
            return 0
        return int(t.column("c").to_numpy(zero_copy_only=False).sum())

    total_task = ray.remote(num_cpus=0.25)(total_block)

    zero_rows = deg.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t.column("entity_id"),
                "c": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def phase(scores, join_end: str, emit_end: str):
        """raw(emit_end) = Σ over edges of scores(join_end) · w, every
        node present (zero-row union folded into the one grouped Sum)."""
        keyed = edge_tbl.map_batches(
            lambda t, j=join_end, e=emit_end: pa.table(
                {
                    "entity_id": t.column(j),
                    "other": t.column(e),
                    "w": t.column("w"),
                }
            ),
            batch_format="pyarrow",
        )
        joined = local_hash_join(
            keyed,
            scores,
            on=["entity_id"],
            left_schema=pa.schema(
                [("entity_id", pa.int64()), ("other", pa.int64()),
                 ("w", pa.int64())]
            ),
            right_schema=score_schema,
            num_partitions=num_partitions,
        )

        def contrib(batch: pa.Table) -> pa.Table:
            w = batch.column("w").to_numpy(zero_copy_only=False)
            fp = batch.column("fp").to_numpy(zero_copy_only=False)
            if len(batch) and int(fp.max()) * int(w.max()) >= 2**62:
                raise OverflowError(
                    "hits fixed-point product would overflow int64; "
                    "normalize edge weights first"
                )
            return pa.table(
                {
                    "entity_id": batch.column("other"),
                    "c": pa.array(fp * w, type=pa.int64()),
                }
            )

        raw = hash_grouped(
            joined.map_batches(contrib, batch_format="pyarrow").union(
                zero_rows
            ),
            ["entity_id"],
            [("c", "sum")],
            rename={"c_sum": "c"},
            num_partitions=num_partitions,
        ).materialize()
        total = sum(
            ray.get([total_task.remote(r) for r in raw.to_arrow_refs()])
        )
        # wraparound sentinel: Σ raw ≤ HITS_SCALE · max(w_out) stays
        # below 2⁶² for any max out-weight < 2³²; a graph past that
        # bound must be weight-normalized upstream, not silently wrapped
        if not 0 <= total < 2**62:
            raise OverflowError(
                "hits round total out of int64 safety range; "
                "normalize edge weights first"
            )
        div = max(total // HITS_SCALE, 1)

        def rescale(batch: pa.Table) -> pa.Table:
            c = batch.column("c").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "entity_id": batch.column("entity_id"),
                    "fp": pa.array(c // div, type=pa.int64()),
                }
            )

        return raw.map_batches(
            rescale, batch_format="pyarrow"
        ).materialize()

    for _ in range(iters):
        auth = phase(hub, "src", "dst")
        hub = phase(auth, "dst", "src")

    final = local_hash_join(
        auth.map_batches(
            lambda t: t.rename_columns(["entity_id", "auth_fp"]),
            batch_format="pyarrow",
        ),
        hub.map_batches(
            lambda t: t.rename_columns(["entity_id", "hub_fp"]),
            batch_format="pyarrow",
        ),
        on=["entity_id"],
        left_schema=pa.schema(
            [("entity_id", pa.int64()), ("auth_fp", pa.int64())]
        ),
        right_schema=pa.schema(
            [("entity_id", pa.int64()), ("hub_fp", pa.int64())]
        ),
        num_partitions=num_partitions,
    )
    scale = float(HITS_SCALE)
    return final.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t.column("entity_id"),
                # power-of-two divisor: the float64 conversion is exact
                "auth": pc.divide(
                    t.column("auth_fp").cast(pa.float64()), scale
                ),
                "hub": pc.divide(
                    t.column("hub_fp").cast(pa.float64()), scale
                ),
            }
        ),
        batch_format="pyarrow",
    )


def neighbor_jaccard(
    edges_ds,
    max_pivot_degree: int = 256,
    min_common: int = 2,
    min_jaccard: float = 0.0,
    num_partitions: int | None = None,
):
    """Structural entity-merge candidates: node pairs scored by the
    Jaccard similarity of their undirected neighbor sets —
    (a, b, common, d_a, d_b, jaccard) with a < b.  Two extraction
    variants of one real-world entity ("NYC" / "New York City") rarely
    co-occur in a sentence, so surface linking misses them — but they
    attach to the same relational context, which this detects.  The
    standard blocking step before entity resolution on the graph.

    Pairs are generated through shared neighbors (the only scalable
    route: a pair is a candidate iff some pivot node lists both as
    neighbors), so the cost is Σ_p d_p² over pivots.  ``max_pivot_degree``
    caps that blowup: hub pivots (a country, a stopword-like entity)
    generate quadratically many pairs while carrying almost no
    discriminative signal, so pivots with degree > cap are skipped —
    their absence lowers ``common`` for pairs they'd vouch for, never
    adds false pairs.  ``d_a``/``d_b`` stay FULL degrees, making the
    score conservative (a documented, deterministic approximation that
    the SQL oracle replicates exactly; with cap ≥ max degree the result
    is the exact neighbor Jaccard).  All steps are hash-partitioned
    grouped aggregates and padded int64 joins; nothing graph-sized
    touches the driver.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..shuffle import hash_grouped, local_hash_join

    und, deg, num_partitions = _und_and_degrees(edges_ds, num_partitions)

    def to_adj(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table(
                {
                    "p": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.table(
            {
                "p": pa.concat_arrays([a, b]),
                "n": pa.concat_arrays([b, a]),
            }
        )

    adj_schema = pa.schema([("p", pa.int64()), ("n", pa.int64())])
    pivot_deg = deg.map_batches(
        lambda t: pa.table({"p": t.column("node"), "dp": t.column("d")}),
        batch_format="pyarrow",
    )
    adj = local_hash_join(
        und.map_batches(to_adj, batch_format="pyarrow"),
        pivot_deg,
        on=["p"],
        left_schema=adj_schema,
        right_schema=pa.schema([("p", pa.int64()), ("dp", pa.int64())]),
        how="inner",
        num_partitions=num_partitions,
    )

    def cap_pivots(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.less_equal(t.column("dp"), max_pivot_degree))
        return kept.select(["p", "n"])

    capped = adj.map_batches(
        cap_pivots, batch_format="pyarrow"
    ).materialize()

    # shared-neighbor pair generation: self-join the capped adjacency on
    # the pivot, keep each unordered pair once (x < y), count pivots
    paired = local_hash_join(
        capped,
        capped.map_batches(
            lambda t: pa.table({"p": t.column("p"), "m": t.column("n")}),
            batch_format="pyarrow",
        ),
        on=["p"],
        left_schema=adj_schema,
        right_schema=pa.schema([("p", pa.int64()), ("m", pa.int64())]),
        how="inner",
        num_partitions=num_partitions,
    )

    def pair_counts(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "n" not in t.column_names:
            return pa.table(
                {
                    "x": pa.array([], type=pa.int64()),
                    "y": pa.array([], type=pa.int64()),
                    "common": pa.array([], type=pa.int64()),
                }
            )
        kept = t.filter(pc.less(t.column("n"), t.column("m")))
        out = (
            pa.table({"x": kept.column("n"), "y": kept.column("m")})
            .group_by(["x", "y"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "x": out.column("x"),
                "y": out.column("y"),
                "common": out.column("count_all").cast(pa.int64()),
            }
        )

    common = hash_grouped(
        paired.map_batches(pair_counts, batch_format="pyarrow"),
        ["x", "y"],
        [("common", "sum")],
        rename={"common_sum": "common"},
        num_partitions=num_partitions,
    )
    pair_schema = pa.schema(
        [("x", pa.int64()), ("y", pa.int64()), ("common", pa.int64())]
    )
    j1 = local_hash_join(
        common,
        deg.map_batches(
            lambda t: pa.table({"x": t.column("node"), "d_a": t.column("d")}),
            batch_format="pyarrow",
        ),
        on=["x"],
        left_schema=pair_schema,
        right_schema=pa.schema([("x", pa.int64()), ("d_a", pa.int64())]),
        how="inner",
        num_partitions=num_partitions,
    )
    j2 = local_hash_join(
        j1,
        deg.map_batches(
            lambda t: pa.table({"y": t.column("node"), "d_b": t.column("d")}),
            batch_format="pyarrow",
        ),
        on=["y"],
        left_schema=pair_schema.append(pa.field("d_a", pa.int64())),
        right_schema=pa.schema([("y", pa.int64()), ("d_b", pa.int64())]),
        how="inner",
        num_partitions=num_partitions,
    )

    def score(t: pa.Table) -> pa.Table:
        c = t.column("common").to_numpy(zero_copy_only=False)
        da = t.column("d_a").to_numpy(zero_copy_only=False)
        db = t.column("d_b").to_numpy(zero_copy_only=False)
        # one IEEE division on exact int64 operands — bit-reproducible
        # in any engine, which is what makes the SQL oracle hash-exact
        jac = c.astype(np.float64) / (da + db - c).astype(np.float64)
        keep = (c >= min_common) & (jac >= min_jaccard)
        return pa.table(
            {
                "a": pa.array(
                    t.column("x").to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "b": pa.array(
                    t.column("y").to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "common": pa.array(c[keep], type=pa.int64()),
                "d_a": pa.array(da[keep], type=pa.int64()),
                "d_b": pa.array(db[keep], type=pa.int64()),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow")


#: Fixed-point scale for :func:`adamic_adar` pivot weights — 2**40, a
#: power of two so ``aa_fp / AA_SCALE`` is an exact float64 both in
#: numpy and in the DuckDB oracle while ``aa_fp < 2**53`` (i.e. below
#: ~2**13·ln 2 ≈ 5,678 capped common pivots per pair — far above the
#: ``max_pivot_degree`` regime); beyond that the conversion rounds, but
#: numpy and DuckDB round identically so parity still holds.
AA_SCALE = 1 << 40


def adamic_adar(
    edges_ds,
    max_pivot_degree: int = 256,
    min_common: int = 2,
    num_partitions: int | None = None,
):
    """Adamic–Adar link-prediction scores over the undirected entity
    graph — (a, b, common, aa_fp, adamic_adar) with a < b:

        AA(a, b) = Σ over shared neighbors p of 1 / ln(deg(p))

    (Adamic & Adar 2003).  The refinement over :func:`neighbor_jaccard`:
    a rare shared neighbor is strong evidence two entities are the same
    or related, a hub shared neighbor is weak evidence — the inverse-log
    weight encodes that directly, the standard similarity for KG alias
    suggestion and missing-edge prediction.

    Same shared-neighbor pair generation (and the same documented
    ``max_pivot_degree`` cap / conservative-approximation argument) as
    :func:`neighbor_jaccard`.  Each pivot's weight is carried as an
    int64 in units of 2⁻⁴⁰ — ``floor(AA_SCALE / ln(d_p))``, one IEEE
    division on exact operands, then an integer sum per pair: float
    summation across blocks is order-dependent, integer addition
    commutes, so the score is bit-reproducible at any parallelism and
    the DuckDB oracle hash-matches it exactly (``ln`` is libm on both
    sides; ``math.log``, never SIMD ``np.log``).  Pivots need degree
    ≥ 2 to generate a pair, so ln's domain is safe by construction.
    """
    import math

    import numpy as np
    import pyarrow.compute as pc

    from ..shuffle import hash_grouped, local_hash_join

    und, deg, num_partitions = _und_and_degrees(edges_ds, num_partitions)

    def to_adj(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table(
                {
                    "p": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.table(
            {
                "p": pa.concat_arrays([a, b]),
                "n": pa.concat_arrays([b, a]),
            }
        )

    adj_schema = pa.schema([("p", pa.int64()), ("n", pa.int64())])
    adj = local_hash_join(
        und.map_batches(to_adj, batch_format="pyarrow"),
        deg.map_batches(
            lambda t: pa.table({"p": t.column("node"), "dp": t.column("d")}),
            batch_format="pyarrow",
        ),
        on=["p"],
        left_schema=adj_schema,
        right_schema=pa.schema([("p", pa.int64()), ("dp", pa.int64())]),
        how="inner",
        num_partitions=num_partitions,
    )

    def cap_and_weight(t: pa.Table) -> pa.Table:
        kept = t.filter(
            pc.and_(
                pc.less_equal(t.column("dp"), max_pivot_degree),
                pc.greater_equal(t.column("dp"), 2),
            )
        )
        dp = kept.column("dp").to_numpy(zero_copy_only=False)
        # floor(SCALE / ln(dp)) per DISTINCT degree — libm log so the
        # DuckDB ln twin is bit-identical, exact int64 thereafter
        cache: dict[int, int] = {}
        w = np.empty(len(dp), dtype=np.int64)
        for i, d in enumerate(dp):
            v = cache.get(int(d))
            if v is None:
                v = int(math.floor(AA_SCALE / math.log(int(d))))
                cache[int(d)] = v
            w[i] = v
        return pa.table(
            {
                "p": kept.column("p"),
                "n": kept.column("n"),
                "w": pa.array(w, type=pa.int64()),
            }
        )

    capped = adj.map_batches(
        cap_and_weight, batch_format="pyarrow"
    ).materialize()

    paired = local_hash_join(
        capped.select_columns(["p", "n", "w"]),
        capped.map_batches(
            lambda t: pa.table({"p": t.column("p"), "m": t.column("n")}),
            batch_format="pyarrow",
        ),
        on=["p"],
        left_schema=pa.schema(
            [("p", pa.int64()), ("n", pa.int64()), ("w", pa.int64())]
        ),
        right_schema=pa.schema([("p", pa.int64()), ("m", pa.int64())]),
        how="inner",
        num_partitions=num_partitions,
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "n" not in t.column_names:
            return pa.table(
                {
                    "x": pa.array([], type=pa.int64()),
                    "y": pa.array([], type=pa.int64()),
                    "common": pa.array([], type=pa.int64()),
                    "aa_fp": pa.array([], type=pa.int64()),
                }
            )
        kept = t.filter(pc.less(t.column("n"), t.column("m")))
        out = (
            pa.table(
                {
                    "x": kept.column("n"),
                    "y": kept.column("m"),
                    "aa_fp": kept.column("w"),
                }
            )
            .group_by(["x", "y"])
            .aggregate([([], "count_all"), ("aa_fp", "sum")])
        )
        return pa.table(
            {
                "x": out.column("x"),
                "y": out.column("y"),
                "common": out.column("count_all").cast(pa.int64()),
                "aa_fp": out.column("aa_fp_sum").cast(pa.int64()),
            }
        )

    summed = hash_grouped(
        paired.map_batches(pair_partials, batch_format="pyarrow"),
        ["x", "y"],
        [("common", "sum"), ("aa_fp", "sum")],
        rename={"common_sum": "common", "aa_fp_sum": "aa_fp"},
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        c = t.column("common").to_numpy(zero_copy_only=False)
        fp = t.column("aa_fp").to_numpy(zero_copy_only=False)
        keep = c >= min_common
        return pa.table(
            {
                "a": pa.array(
                    t.column("x").to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "b": pa.array(
                    t.column("y").to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "common": pa.array(c[keep], type=pa.int64()),
                "aa_fp": pa.array(fp[keep], type=pa.int64()),
                # power-of-two divisor: exact in both engines
                "adamic_adar": pa.array(
                    fp[keep].astype(np.float64) / float(AA_SCALE),
                    type=pa.float64(),
                ),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def clustering_coefficient(edges_ds, num_partitions: int | None = None):
    """Local clustering coefficient per node — (entity_id, d,
    n_triangles, coefficient) with coefficient = 2T / (d·(d−1)) over the
    undirected entity graph, for every node of degree ≥ 2 (T = 0 when
    the node closes no triangle).  The normalized form of
    :func:`triangle_counts`: a head entity with thousands of neighbors
    and few closures scores ≈0 (star-hub artifact), a genuine
    community member scores near 1 — the standard graph-quality feature
    for entity filtering.

    Shares the prepared (und, deg) stage and the degree-ordered triangle
    pass, then one padded left-outer join (degrees ⟕ triangle counts)
    and a stateless scorer.  The single DOUBLE division on exact int64
    operands is bit-reproducible, so the SQL oracle hash-matches.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..shuffle import local_hash_join

    und, deg, num_partitions = _und_and_degrees(edges_ds, num_partitions)
    tri = _per_node_triangles(und, deg, num_partitions)

    def eligible(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.greater_equal(t.column("d"), 2))
        return pa.table(
            {
                "entity_id": kept.column("node"),
                "d": kept.column("d"),
            }
        )

    joined = local_hash_join(
        deg.map_batches(eligible, batch_format="pyarrow"),
        tri,
        on=["entity_id"],
        left_schema=pa.schema(
            [("entity_id", pa.int64()), ("d", pa.int64())]
        ),
        right_schema=pa.schema(
            [("entity_id", pa.int64()), ("n_triangles", pa.int64())]
        ),
        how="left_outer",
        num_partitions=num_partitions,
    )

    def score(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False)
        tcol = t.column("n_triangles").to_numpy(zero_copy_only=False)
        tri_n = np.nan_to_num(tcol.astype(np.float64)).astype(np.int64)
        coeff = (2.0 * tri_n) / (d * (d - 1)).astype(np.float64)
        return pa.table(
            {
                "entity_id": t.column("entity_id"),
                "d": t.column("d"),
                "n_triangles": pa.array(tri_n, type=pa.int64()),
                "coefficient": pa.array(coeff, type=pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def label_propagation(
    edges_ds,
    max_iters: int = 10,
    num_partitions: int | None = None,
    precomputed=None,
):
    """Community detection over the undirected entity graph —
    (entity_id, community) by synchronous label propagation (Raghavan et
    al. 2007): each round every node adopts the most frequent label among
    its neighbors plus its own current label, ties broken by the smallest
    label, so the result is deterministic at any parallelism.  Communities
    are finer than :func:`connected_components` (a bridge between two
    dense cliques keeps them one COMPONENT but two COMMUNITIES) — the
    topical grouping signal for KG browsing and entity-sheaf sampling.

    Per round: one padded int64 join (labels onto the direction-doubled
    distinct edge list) and ONE vote exchange — votes hash-partition by
    node, and the per-partition kernel folds the (node, label) count and
    the (count desc, label asc) arg-max in vectorized Arrow/numpy, so no
    (node, label, n) intermediate re-exchanges.  Driver state per round
    is the constant-size convergence digest (labels can oscillate on
    bipartite-ish structures under synchronous update — ``max_iters``
    bounds that; the self-vote damps the common cases).
    """
    import numpy as np

    from ..shuffle import hash_grouped, hash_partitioned, local_hash_join

    if precomputed is not None:
        und, num_partitions = precomputed
    else:
        und, _deg, num_partitions = _und_and_degrees(
            edges_ds, num_partitions
        )

    def to_adj(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                }
            )
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    adj = und.map_batches(to_adj, batch_format="pyarrow").materialize()
    num_partitions = _iter_partitions(adj.count(), num_partitions)
    labels = hash_grouped(
        adj.map_batches(
            lambda t: pa.table(
                {"dst": t.column("src"), "label": t.column("src")}
            ),
            batch_format="pyarrow",
        ),
        ["dst"],
        [("label", "min")],
        rename={"label_min": "label"},
        num_partitions=num_partitions,
    ).materialize()

    adj_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    label_schema = pa.schema([("src", pa.int64()), ("label", pa.int64())])

    def vote_argmax(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "dst" not in t.column_names:
            return pa.table(
                {
                    "dst": pa.array([], type=pa.int64()),
                    "label": pa.array([], type=pa.int64()),
                }
            )
        counts = t.group_by(["dst", "label"]).aggregate([([], "count_all")])
        d = counts.column("dst").to_numpy(zero_copy_only=False)
        l = counts.column("label").to_numpy(zero_copy_only=False)
        n = counts.column("count_all").to_numpy(zero_copy_only=False)
        # primary dst asc, then count desc, then label asc — lexsort's
        # LAST key is primary
        order = np.lexsort((l, -n, d))
        d, l = d[order], l[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = d[1:] != d[:-1]
        return pa.table(
            {
                "dst": pa.array(d[first], type=pa.int64()),
                "label": pa.array(l[first], type=pa.int64()),
            }
        )

    digest = _label_digest(labels)
    for _ in range(max_iters):
        prop = local_hash_join(
            adj,
            labels.map_batches(
                lambda t: pa.table(
                    {"src": t.column("dst"), "label": t.column("label")}
                ),
                batch_format="pyarrow",
            ),
            on=["src"],
            left_schema=adj_schema,
            right_schema=label_schema,
            how="inner",
            num_partitions=num_partitions,
        ).select_columns(["dst", "label"])
        new_labels = hash_partitioned(
            prop.union(labels),  # self-vote damps 2-cycles
            ["dst"],
            vote_argmax,
            num_partitions=num_partitions,
        ).materialize()
        new_digest = _label_digest(new_labels)
        labels = new_labels
        if new_digest == digest:
            break
        digest = new_digest

    return labels.map_batches(
        lambda t: pa.table(
            {
                "entity_id": t.column("dst"),
                "community": t.column("label"),
            }
        ),
        batch_format="pyarrow",
    )


def reciprocity(edges, num_partitions: int | None = None):
    """edges(subj_id, obj_id, …) → ONE row (edges, reciprocal_edges,
    reciprocity): the fraction of distinct directed non-loop edges
    (u, v) whose mirror (v, u) also exists — the classic web-graph
    link-symmetry statistic (directed reciprocity, Garlaschelli &
    Loffredo 2004's r without the density correction).

    Plan: distinct (src, dst) pairs via one grouped exchange, collapse
    each pair onto its undirected key with a direction flag (1 for
    src < dst, 2 for src > dst — distinct pairs make the flag-sum
    injective: 3 ⇔ both directions present), one more grouped Sum, then
    constant-size per-block partials reduced on the driver as bare Ray
    tasks.  Nothing graph-sized ever reaches the driver.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from ..shuffle import hash_grouped

    def to_pairs(t: pa.Table) -> pa.Table:
        src = t.column("subj_id").cast(pa.int64())
        dst = t.column("obj_id").cast(pa.int64())
        keep = pc.invert(pc.equal(src, dst))  # reciprocity of loops is moot
        return pa.table({"src": src.filter(keep), "dst": dst.filter(keep)})

    pairs = hash_grouped(
        edges.map_batches(to_pairs, batch_format="pyarrow"),
        ["src", "dst"],
        [],
        num_partitions=num_partitions,
    ).materialize()
    num_partitions = _iter_partitions(pairs.count(), num_partitions)

    def flagged(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table(
                {
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                    "d": pa.array([], type=pa.int64()),
                }
            )
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array(np.minimum(src, dst)),
                "hi": pa.array(np.maximum(src, dst)),
                "d": pa.array(np.where(src < dst, 1, 2).astype(np.int64)),
            }
        )

    und = hash_grouped(
        pairs.map_batches(flagged, batch_format="pyarrow"),
        ["lo", "hi"],
        [("d", "sum")],
        rename={"d_sum": "d"},
        num_partitions=num_partitions,
    ).materialize()

    def partial(t: pa.Table):
        if t.num_rows == 0 or "d" not in t.column_names:
            return 0, 0
        d = t.column("d").to_numpy(zero_copy_only=False)
        both = int((d == 3).sum())
        n_edges = int(len(d)) + both  # pairs with d == 3 carry 2 edges
        return n_edges, both

    part_task = ray.remote(num_cpus=0.25)(partial)
    parts = ray.get([part_task.remote(r) for r in und.to_arrow_refs()])
    n_edges = sum(p[0] for p in parts)
    n_recip = 2 * sum(p[1] for p in parts)
    # same final float op on both engines: int64 → float64 casts are
    # deterministic, one IEEE division
    ratio = (float(n_recip) / float(n_edges)) if n_edges else 0.0
    return ray.data.from_arrow(
        pa.table(
            {
                "edges": pa.array([n_edges], type=pa.int64()),
                "reciprocal_edges": pa.array([n_recip], type=pa.int64()),
                "reciprocity": pa.array([ratio], type=pa.float64()),
            }
        )
    )


def assortativity(edges, num_partitions: int | None = None):
    """edges(subj_id, obj_id, …) → ONE row (edges, assortativity): the
    out-degree/in-degree Pearson correlation across distinct directed
    edges — Newman 2002's degree assortativity in its directed
    (out, in) flavor, the standard web-graph "do hubs link to hubs"
    summary.  Degrees are distinct-neighbor counts (structure, not
    mention weight).

    Plan: distinct (src, dst) pairs, per-endpoint degree tables (two
    grouped exchanges), two ``local_hash_join`` hops to land x =
    out_deg(src) and y = in_deg(dst) on each edge, then constant-size
    per-block moment partials (n, Σx, Σy, Σxy, Σx², Σy² as Python ints
    — exact at any scale) reduced on the driver.  The final correlation
    is computed from the six exact integers with one float expression
    replayed verbatim by the DuckDB twin (int→double casts and IEEE
    ops are deterministic on both engines).
    """
    import numpy as np
    import ray

    from ..shuffle import hash_grouped, local_hash_join

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t.column("subj_id").cast(pa.int64()),
                "dst": t.column("obj_id").cast(pa.int64()),
            }
        )

    pairs = hash_grouped(
        edges.map_batches(to_pairs, batch_format="pyarrow"),
        ["src", "dst"],
        [],
        num_partitions=num_partitions,
    ).materialize()
    num_partitions = _iter_partitions(pairs.count(), num_partitions)

    def count_col(col: str, out: str):
        return hash_grouped(
            pairs,
            [col],
            [("src" if col == "dst" else "dst", "count")],
            rename={("src_count" if col == "dst" else "dst_count"): out},
            num_partitions=num_partitions,
        )

    out_deg = count_col("src", "x")  # (src, x = out-degree)
    in_deg = count_col("dst", "y")  # (dst, y = in-degree)

    with_x = local_hash_join(
        pairs,
        out_deg,
        on=["src"],
        left_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        right_schema=pa.schema([("src", pa.int64()), ("x", pa.int64())]),
        num_partitions=num_partitions,
    )
    with_xy = local_hash_join(
        with_x,
        in_deg,
        on=["dst"],
        left_schema=pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()), ("x", pa.int64())]
        ),
        right_schema=pa.schema([("dst", pa.int64()), ("y", pa.int64())]),
        num_partitions=num_partitions,
    ).materialize()

    def moments(t: pa.Table):
        if t.num_rows == 0 or "x" not in t.column_names:
            return 0, 0, 0, 0, 0, 0
        x = t.column("x").to_numpy(zero_copy_only=False).astype(object)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(object)
        # object dtype: Python-int sums never overflow at any scale
        return (
            t.num_rows,
            int((x).sum()),
            int((y).sum()),
            int((x * y).sum()),
            int((x * x).sum()),
            int((y * y).sum()),
        )

    mom_task = ray.remote(num_cpus=0.25)(moments)
    parts = ray.get([mom_task.remote(r) for r in with_xy.to_arrow_refs()])
    n = sum(p[0] for p in parts)
    sx = sum(p[1] for p in parts)
    sy = sum(p[2] for p in parts)
    sxy = sum(p[3] for p in parts)
    sxx = sum(p[4] for p in parts)
    syy = sum(p[5] for p in parts)
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if d1 > 0 and d2 > 0:
        import math

        r = float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
    else:
        r = 0.0  # degenerate degree distribution: defined as 0 (SQL CASE)
    return ray.data.from_arrow(
        pa.table(
            {
                "edges": pa.array([n], type=pa.int64()),
                "assortativity": pa.array([r], type=pa.float64()),
            }
        )
    )


def bowtie(
    edges,
    source: int,
    max_hops: int = 15,
    num_partitions: int | None = None,
):
    """edges(subj_id, obj_id, …) → (region, n_nodes): the Broder et al.
    2000 bow-tie decomposition of the directed graph around ``source``
    (in practice the top hub of the giant SCC): ``core`` = nodes both
    forward- and backward-reachable from the seed within ``max_hops``,
    ``in`` = backward-only (they can reach the seed), ``out`` =
    forward-only, ``other`` = the remainder (Broder's TENDRILS +
    DISCONNECTED, which one seed's two BFS passes cannot split —
    documented approximation, standard for web-scale graphs).

    Plan: two :func:`bfs_hops` frontier expansions (forward, and
    backward over the swapped edge list), then one tag-sum exchange:
    every node contributes 0, forward-reached nodes add 1,
    backward-reached add 2 — the per-node sum (0–3) IS the region.  The
    region histogram leaves each partition as ≤4 rows.
    """
    edges = edges.materialize()
    fwd = bfs_hops(edges, source, max_hops, num_partitions)
    bwd = bfs_hops(
        edges.map_batches(_swap_edges, batch_format="pyarrow"),
        source,
        max_hops,
        num_partitions,
    )
    return _bowtie_classify(edges, fwd, bwd, num_partitions)


def _swap_edges(t: pa.Table) -> pa.Table:
    import numpy as np

    return pa.table(
        {
            "subj_id": t.column("obj_id").cast(pa.int64()),
            "obj_id": t.column("subj_id").cast(pa.int64()),
            # weight rides along for consumers that build degree tables
            # (the BSP twin's shard setup); BFS semantics ignore it
            "weight": (
                t.column("weight").cast(pa.int64())
                if "weight" in t.column_names
                else pa.array(np.ones(t.num_rows, dtype=np.int64))
            ),
        }
    )


def _bowtie_classify(edges, fwd, bwd, num_partitions: int | None):
    """Shared classify/histogram tail of the bow-tie twins: node set ←
    degrees, tag-sum exchange (0 + 1·forward + 2·backward = region),
    constant-size per-block histogram partials reduced on the driver."""
    import numpy as np
    import ray

    from ..shuffle import hash_grouped

    deg = node_degrees(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "subj_id": t.column("subj_id").cast(pa.int64()),
                    "obj_id": t.column("obj_id").cast(pa.int64()),
                    "weight": pa.array(
                        np.ones(t.num_rows, dtype=np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        num_partitions=num_partitions,
    )

    def tag(value: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "entity_id" not in t.column_names:
                return pa.table(
                    {
                        "entity_id": pa.array([], type=pa.int64()),
                        "t": pa.array([], type=pa.int64()),
                    }
                )
            return pa.table(
                {
                    "entity_id": t.column("entity_id").cast(pa.int64()),
                    "t": pa.array(
                        np.full(t.num_rows, value, dtype=np.int64)
                    ),
                }
            )

        return fn

    tagged = (
        deg.map_batches(tag(0), batch_format="pyarrow")
        .union(fwd.map_batches(tag(1), batch_format="pyarrow"))
        .union(bwd.map_batches(tag(2), batch_format="pyarrow"))
    )
    sums = hash_grouped(
        tagged,
        ["entity_id"],
        [("t", "sum")],
        rename={"t_sum": "t"},
        num_partitions=num_partitions,
    ).materialize()

    def counts(t: pa.Table):
        out = [0, 0, 0, 0]
        if t.num_rows and "t" in t.column_names:
            v = t.column("t").to_numpy(zero_copy_only=False)
            for k in range(4):
                out[k] = int((v == k).sum())
        return tuple(out)

    cnt_task = ray.remote(num_cpus=0.25)(counts)
    parts = ray.get([cnt_task.remote(r) for r in sums.to_arrow_refs()])
    totals = [sum(p[k] for p in parts) for k in range(4)]
    names = ["other", "out", "in", "core"]  # index = tag sum
    keep = [(names[k], totals[k]) for k in range(4) if totals[k] > 0]
    return ray.data.from_arrow(
        pa.table(
            {
                "region": pa.array([k for k, _ in keep]),
                "n_nodes": pa.array(
                    [v for _, v in keep], type=pa.int64()
                ),
            }
        )
    )


def modularity(
    edges_ds,
    max_iters: int = 10,
    num_partitions: int | None = None,
):
    """Newman modularity per label-propagation community —
    (community, n_nodes, inner_edges, degree_sum, q_contrib) over the
    distinct undirected entity graph: the quality gate for the
    :func:`label_propagation` partition (Σ q_contrib is the classic
    Q = Σ_c [ e_c/m − (d_c/2m)² ]; a partition no better than the
    degree-preserving null model scores ≈ 0).

    Plan: the shared ``_und_and_degrees`` stage feeds BOTH the LPA pass
    (via its ``precomputed`` seam — one distinct-edge exchange total)
    and the scoring joins: two padded int64 label joins onto the edge
    endpoints → internal-edge count per community; one label join onto
    the degree table → (n_nodes, degree_sum) per community; ``m`` is a
    single driver scalar.  ``q_contrib`` is one fixed float expression
    of three integers, so the DuckDB twin hash-matches bit for bit.
    """
    import numpy as np

    from ..shuffle import hash_grouped, local_hash_join

    und, deg, num_partitions = _und_and_degrees(edges_ds, num_partitions)
    labels = label_propagation(
        edges_ds,
        max_iters=max_iters,
        num_partitions=num_partitions,
        precomputed=(und, num_partitions),
    )
    m = und.count()
    if m == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "community": pa.array([], type=pa.int64()),
                    "n_nodes": pa.array([], type=pa.int64()),
                    "inner_edges": pa.array([], type=pa.int64()),
                    "degree_sum": pa.array([], type=pa.int64()),
                    "q_contrib": pa.array([], type=pa.float64()),
                }
            )
        )
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    lab_a = pa.schema([("a", pa.int64()), ("ca", pa.int64())])
    lab_b = pa.schema([("b", pa.int64()), ("cb", pa.int64())])
    j1 = local_hash_join(
        und,
        labels.map_batches(
            lambda t: pa.table(
                {"a": t.column("entity_id"), "ca": t.column("community")}
            ),
            batch_format="pyarrow",
        ),
        on=["a"],
        left_schema=pair_schema,
        right_schema=lab_a,
        how="inner",
        num_partitions=num_partitions,
    )
    j2 = local_hash_join(
        j1,
        labels.map_batches(
            lambda t: pa.table(
                {"b": t.column("entity_id"), "cb": t.column("community")}
            ),
            batch_format="pyarrow",
        ),
        on=["b"],
        left_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("ca", pa.int64())]
        ),
        right_schema=lab_b,
        how="inner",
        num_partitions=num_partitions,
    )

    def inner_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(t) == 0 or "ca" not in t.column_names:
            return pa.table(
                {
                    "community": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        eq = pc.equal(t.column("ca"), t.column("cb"))
        sub = t.filter(eq)
        out = (
            pa.table({"community": sub.column("ca")})
            .group_by(["community"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "community": out.column("community"),
                "n": out.column("count_all").cast(pa.int64()),
            }
        )

    inner = hash_grouped(
        j2.map_batches(inner_partial, batch_format="pyarrow"),
        ["community"],
        [("n", "sum")],
        rename={"n_sum": "inner_edges"},
        num_partitions=num_partitions,
    )
    degj = local_hash_join(
        deg.map_batches(
            lambda t: pa.table(
                {"entity_id": t.column("node"), "d": t.column("d")}
            ),
            batch_format="pyarrow",
        ),
        labels,
        on=["entity_id"],
        left_schema=pa.schema([("entity_id", pa.int64()), ("d", pa.int64())]),
        right_schema=pa.schema(
            [("entity_id", pa.int64()), ("community", pa.int64())]
        ),
        how="inner",
        num_partitions=num_partitions,
    )
    comm = hash_grouped(
        degj.map_batches(
            lambda t: pa.table(
                {
                    "community": t.column("community"),
                    "d": t.column("d"),
                    "one": pa.array(
                        np.ones(len(t), dtype=np.int64), type=pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        ["community"],
        [("one", "sum"), ("d", "sum")],
        rename={"one_sum": "n_nodes", "d_sum": "degree_sum"},
        num_partitions=num_partitions,
    )
    joined = local_hash_join(
        comm,
        inner,
        on=["community"],
        left_schema=pa.schema(
            [
                ("community", pa.int64()),
                ("n_nodes", pa.int64()),
                ("degree_sum", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [("community", pa.int64()), ("inner_edges", pa.int64())]
        ),
        how="left_outer",
        num_partitions=num_partitions,
    )

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "community" not in t.column_names:
            return pa.table(
                {
                    "community": pa.array([], type=pa.int64()),
                    "n_nodes": pa.array([], type=pa.int64()),
                    "inner_edges": pa.array([], type=pa.int64()),
                    "degree_sum": pa.array([], type=pa.int64()),
                    "q_contrib": pa.array([], type=pa.float64()),
                }
            )
        inner_n = (
            t.column("inner_edges")
            .combine_chunks()
            .fill_null(0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        dsum = t.column("degree_sum").to_numpy(zero_copy_only=False)
        # one fixed float expression of integer inputs — the SQL twin
        # evaluates the identical (x/m) − (d/2m)·(d/2m)
        frac = dsum.astype(np.float64) / float(2 * m)
        q = inner_n.astype(np.float64) / float(m) - frac * frac
        return pa.table(
            {
                "community": t.column("community"),
                "n_nodes": t.column("n_nodes"),
                "inner_edges": pa.array(inner_n, type=pa.int64()),
                "degree_sum": t.column("degree_sum"),
                "q_contrib": pa.array(q, type=pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


MIS_MAX_ROUNDS = 30
MIS_LOCAL_NODES = 100_000   # tail-local finish gate (nodes)
MIS_LOCAL_EDGES = 2_000_000  # tail-local finish gate (live edges)


def _mis_prio(nodes: list[int]) -> list[int]:
    """Deterministic per-node priority: first 8 md5 bytes of the decimal
    id, big-endian SIGNED — the `_sql_hash64` idiom, so the SQL twin
    recomputes it bit for bit."""
    import hashlib

    return [
        int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[:8],
            "big",
            signed=True,
        )
        for v in nodes
    ]


def mis_coloring(
    edges_ds,
    max_rounds: int = MIS_MAX_ROUNDS,
    num_partitions: int | None = None,
    local_nodes: int = MIS_LOCAL_NODES,
    local_edges: int = MIS_LOCAL_EDGES,
):
    """Greedy distributed graph coloring by iterated deterministic
    Luby-style independent sets — (entity_id, color): each round, every
    live node whose (md5 priority, id) beats ALL live neighbors joins
    that round's independent set and takes the round index as its color;
    winners leave the graph and the residual graph repeats.  Within a
    round the winners are pairwise non-adjacent (two neighbors cannot
    both be local minima), so the coloring is proper — the classic
    scheduling/symmetry-breaking primitive (conflict-free parallel
    entity-merge batches, edge-update waves).

    Deterministic at any parallelism: priorities are pure md5 functions
    of the node id and ties break on the id itself, so the SQL twin
    replays every round exactly.  Per round: one (dst-keyed) neighbor-
    minimum exchange + one padded left-outer join + two membership
    filters; driver state is one live-count scalar.  Nodes still live
    after ``max_rounds`` (not expected before ~30 on any real degree
    distribution) take ``max_rounds`` as their color — the same rule the
    SQL replay applies, so the engines cannot diverge.
    """
    import numpy as np

    from ..shuffle import hash_grouped, hash_partitioned, local_hash_join

    und, _deg, num_partitions = _und_and_degrees(edges_ds, num_partitions)

    def to_nodes(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table({"node": pa.array([], type=pa.int64())})
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        t.column("a").combine_chunks(),
                        t.column("b").combine_chunks(),
                    ]
                )
            }
        ).group_by(["node"]).aggregate([])

    def with_prio(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "node" not in t.column_names:
            return pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "prio": pa.array([], type=pa.int64()),
                }
            )
        nodes = t.column("node").to_pylist()
        return pa.table(
            {
                "node": t.column("node"),
                "prio": pa.array(_mis_prio(nodes), type=pa.int64()),
            }
        )

    live = (
        hash_grouped(
            und.map_batches(to_nodes, batch_format="pyarrow"),
            ["node"],
            [],
            num_partitions=num_partitions,
        )
        .map_batches(with_prio, batch_format="pyarrow")
        .materialize()
    )
    adj = und.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [
                        t.column("a").combine_chunks(),
                        t.column("b").combine_chunks(),
                    ]
                ),
                "dst": pa.concat_arrays(
                    [
                        t.column("b").combine_chunks(),
                        t.column("a").combine_chunks(),
                    ]
                ),
            }
        )
        if len(t) and "a" in t.column_names
        else pa.table(
            {
                "src": pa.array([], type=pa.int64()),
                "dst": pa.array([], type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    colored: list = []
    live_schema = pa.schema([("node", pa.int64()), ("prio", pa.int64())])
    rnd = 0
    local_done = False
    while rnd < max_rounds:
        n_live = live.count()
        if n_live == 0:
            break
        if n_live <= local_nodes:
            # tail-local finish: MIS coloring on clique-ish structure
            # colors O(1) nodes per round, so the tail costs many
            # near-empty exchange rounds — once the live set (and its
            # edge set) is bounded, replay the IDENTICAL rule driver
            # side in one pass.  Bit-for-bit the same colors (same
            # priorities, same tie-break, same cap), so the SQL twin
            # is untouched; at web scale the distributed rounds have
            # already colored the bulk before this branch fires.
            live_edges = local_hash_join(
                local_hash_join(
                    adj,
                    live.map_batches(
                        lambda t: pa.table({"src": t.column("node")}),
                        batch_format="pyarrow",
                    ),
                    on=["src"],
                    left_schema=pa.schema(
                        [("src", pa.int64()), ("dst", pa.int64())]
                    ),
                    right_schema=pa.schema([("src", pa.int64())]),
                    how="semi",
                    num_partitions=num_partitions,
                ),
                live.map_batches(
                    lambda t: pa.table({"dst": t.column("node")}),
                    batch_format="pyarrow",
                ),
                on=["dst"],
                left_schema=pa.schema(
                    [("src", pa.int64()), ("dst", pa.int64())]
                ),
                right_schema=pa.schema([("dst", pa.int64())]),
                how="semi",
                num_partitions=num_partitions,
            )
            if live_edges.count() <= local_edges:
                rows = live.take_all()
                eds = live_edges.take_all()
                prio_of = {r["node"]: r["prio"] for r in rows}
                nbrs: dict = {v: [] for v in prio_of}
                for e in eds:
                    a, b = e["src"], e["dst"]
                    if a in prio_of and b in prio_of:
                        nbrs[a].append(b)
                live_set = set(prio_of)
                local_rows: list = []
                r = rnd
                while live_set and r < max_rounds:
                    winners = [
                        v
                        for v in live_set
                        if all(
                            (prio_of[v], v) < (prio_of[u], u)
                            for u in nbrs[v]
                            if u in live_set
                        )
                    ]
                    local_rows.extend((v, r) for v in winners)
                    live_set -= set(winners)
                    r += 1
                local_rows.extend((v, max_rounds) for v in live_set)
                import ray.data as _rd

                colored.append(
                    (
                        None,
                        _rd.from_arrow(
                            pa.table(
                                {
                                    "node": pa.array(
                                        [x[0] for x in local_rows],
                                        type=pa.int64(),
                                    ),
                                    "color": pa.array(
                                        [x[1] for x in local_rows],
                                        type=pa.int64(),
                                    ),
                                }
                            )
                        ),
                    )
                )
                local_done = True
                break
        # messages: each live edge ships the SOURCE's (prio, id) to dst
        msgs = local_hash_join(
            adj,
            live.map_batches(
                lambda t: pa.table(
                    {
                        "src": t.column("node"),
                        "src_prio": t.column("prio"),
                    }
                ),
                batch_format="pyarrow",
            ),
            on=["src"],
            left_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
            right_schema=pa.schema(
                [("src", pa.int64()), ("src_prio", pa.int64())]
            ),
            how="inner",
            num_partitions=num_partitions,
        )

        def nb_min(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "dst" not in t.column_names:
                return pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "nb_prio": pa.array([], type=pa.int64()),
                        "nb_node": pa.array([], type=pa.int64()),
                    }
                )
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            p = t.column("src_prio").to_numpy(zero_copy_only=False)
            s = t.column("src").to_numpy(zero_copy_only=False)
            order = np.lexsort((s, p, dst))
            d2, p2, s2 = dst[order], p[order], s[order]
            first = np.ones(len(d2), dtype=bool)
            first[1:] = d2[1:] != d2[:-1]
            return pa.table(
                {
                    "node": pa.array(d2[first], type=pa.int64()),
                    "nb_prio": pa.array(p2[first], type=pa.int64()),
                    "nb_node": pa.array(s2[first], type=pa.int64()),
                }
            )

        nbmin = hash_partitioned(
            msgs, ["dst"], nb_min, num_partitions=num_partitions
        )
        judged = local_hash_join(
            live,
            nbmin,
            on=["node"],
            left_schema=live_schema,
            right_schema=pa.schema(
                [
                    ("node", pa.int64()),
                    ("nb_prio", pa.int64()),
                    ("nb_node", pa.int64()),
                ]
            ),
            how="left_outer",
            num_partitions=num_partitions,
        )

        def split(win: bool):
            def fn(t: pa.Table) -> pa.Table:
                if len(t) == 0 or "node" not in t.column_names:
                    return pa.table(
                        {
                            "node": pa.array([], type=pa.int64()),
                            "prio": pa.array([], type=pa.int64()),
                        }
                    )
                import pyarrow.compute as pc_

                # nulls (isolated nodes) must stay INT-exact: mask via
                # Arrow is_null, fill, THEN convert — never float NaN
                isolated = (
                    pc_.is_null(t.column("nb_prio"))
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)
                )
                nbp = (
                    t.column("nb_prio")
                    .combine_chunks()
                    .fill_null(0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                nbn = (
                    t.column("nb_node")
                    .combine_chunks()
                    .fill_null(0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                p = t.column("prio").to_numpy(zero_copy_only=False)
                n = t.column("node").to_numpy(zero_copy_only=False)
                beats = (
                    isolated
                    | (p < nbp)
                    | ((p == nbp) & (n < nbn))
                )
                keep = beats if win else ~beats
                return pa.table(
                    {
                        "node": pa.array(n[keep], type=pa.int64()),
                        "prio": pa.array(p[keep], type=pa.int64()),
                    }
                )

            return fn

        winners = judged.map_batches(
            split(True), batch_format="pyarrow"
        ).materialize()
        colored.append((rnd, winners))
        live = judged.map_batches(
            split(False), batch_format="pyarrow"
        ).materialize()
        # adj stays STATIC: dead sources ship no messages (the msgs
        # join keys on live) and dead receivers are ignored (judged
        # starts FROM live) — no residual rebuild exchanges
        rnd += 1

    if not local_done:
        colored.append((max_rounds, live))  # cap rule shared w/ twin
    import ray.data

    empty_out = pa.table(
        {
            "entity_id": pa.array([], type=pa.int64()),
            "color": pa.array([], type=pa.int64()),
        }
    )

    outs = []
    for color, ds in colored:
        if color is None:  # tail-local rows already carry their color
            outs.append(
                ds.map_batches(
                    lambda t: pa.table(
                        {
                            "entity_id": t.column("node"),
                            "color": t.column("color"),
                        }
                    )
                    if len(t) and "node" in t.column_names
                    else empty_out,
                    batch_format="pyarrow",
                )
            )
            continue
        outs.append(
            ds.map_batches(
                lambda t, c=color: pa.table(
                    {
                        "entity_id": t.column("node"),
                        "color": pa.array(
                            [c] * len(t), type=pa.int64()
                        ),
                    }
                )
                if len(t) and "node" in t.column_names
                else empty_out,
                batch_format="pyarrow",
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.union(o)
    return result


BC_SOURCES = 4
BC_MAX_DEPTH = 6
BC_SCALE = 1 << 20


def betweenness(
    edges_ds,
    sources: list[int],
    max_depth: int = BC_MAX_DEPTH,
    num_partitions: int | None = None,
):
    """Approximate betweenness centrality by k-source Brandes (Brandes
    2001; sampled-source approximation à la Brandes–Pich 2007) —
    (entity_id, bc_fp, bc): forward multi-source BFS accumulating exact
    shortest-path counts σ, then the backward dependency recursion
    ``δ(v) = Σ_{w∈succ(v)} σ(v)/σ(w) · (1 + δ(w))`` accumulated in
    2⁻²⁰ FIXED-POINT INTEGERS — ``(σv · (SCALE + δw_fp)) // σw`` — so
    every sum is commutative and the result is bit-identical at any
    parallelism (the PageRank fixed-point-mass discipline applied to
    the one classic centrality whose textbook form is float-ordered).

    All ``sources`` advance in lockstep as (src, node)-keyed tables —
    the batched multi-source plan, not a per-source loop: per BFS level
    one padded join of the static edge list against the frontier, one
    (src, node)-keyed σ Sum, one composite-key left-outer anti against
    the visited set; the backward pass replays the levels in reverse
    with one successor join + one fixed-point Sum each.  Driver state
    is one scalar per level.  Overflow discipline: δ products run in
    arbitrary-precision Python ints inside the per-batch combiner and
    raise if a partial leaves int64; every CROSS-PARTITION σ/δ/bc
    reduction runs through ``hash_grouped(..., checked=True)``, which
    widens the sum to decimal128 and safe-casts back — so a group total
    outside int64 raises ``ArrowInvalid`` instead of wrapping (Arrow's
    plain int64 sum kernel wraps silently).  At web scale σ grows
    exponentially with depth × degree; when this trips, lower
    ``max_depth`` or rescale ``BC_SCALE``.
    """
    import ray
    import ray.data

    from ..shuffle import hash_grouped, local_hash_join

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t.column("subj_id").cast(pa.int64()),
                "dst": t.column("obj_id").cast(pa.int64()),
            }
        )

    edg = hash_grouped(
        edges_ds.map_batches(to_pairs, batch_format="pyarrow"),
        ["src", "dst"],
        [],
        num_partitions=num_partitions,
    ).materialize()
    num_partitions = _iter_partitions(edg.count(), num_partitions)

    lvl_schema = pa.schema(
        [("s", pa.int64()), ("node", pa.int64()), ("sigma", pa.int64())]
    )
    f0 = ray.data.from_arrow(
        pa.table(
            {
                "s": pa.array(sources, type=pa.int64()),
                "node": pa.array(sources, type=pa.int64()),
                "sigma": pa.array([1] * len(sources), type=pa.int64()),
            }
        )
    ).materialize()
    levels = [f0]
    vis = f0.map_batches(
        lambda t: pa.table(
            {
                "s": t.column("s"),
                "node": t.column("node"),
                "seen": pa.array([1] * len(t), type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    vis_schema = pa.schema(
        [("s", pa.int64()), ("node", pa.int64()), ("seen", pa.int64())]
    )

    for _d in range(1, max_depth + 1):
        msgs = local_hash_join(
            edg.map_batches(
                lambda t: pa.table(
                    {"node": t.column("src"), "dst": t.column("dst")}
                ),
                batch_format="pyarrow",
            ),
            levels[-1],
            on=["node"],
            left_schema=pa.schema(
                [("node", pa.int64()), ("dst", pa.int64())]
            ),
            right_schema=lvl_schema,
            how="inner",
            num_partitions=num_partitions,
        )

        def fwd_partial(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "dst" not in t.column_names:
                return lvl_schema.empty_table()
            # decimal128 partial sum + safe int64 downcast: a per-batch σ
            # partial that leaves int64 raises instead of wrapping
            out = (
                pa.table(
                    {
                        "s": t.column("s"),
                        "node": t.column("dst"),
                        "sigma": t.column("sigma").cast(pa.decimal128(38, 0)),
                    }
                )
                .group_by(["s", "node"])
                .aggregate([("sigma", "sum")])
            )
            return pa.table(
                {
                    "s": out.column("s"),
                    "node": out.column("node"),
                    "sigma": out.column("sigma_sum").cast(pa.int64()),
                }
            )

        cand = hash_grouped(
            msgs.map_batches(fwd_partial, batch_format="pyarrow"),
            ["s", "node"],
            [("sigma", "sum")],
            rename={"sigma_sum": "sigma"},
            hash_cols=["node"],
            num_partitions=num_partitions,
            checked=True,
        )
        judged = local_hash_join(
            cand,
            vis,
            on=["s", "node"],
            left_schema=lvl_schema,
            right_schema=vis_schema,
            how="left_outer",
            num_partitions=num_partitions,
        )

        def unseen_only(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if len(t) == 0 or "node" not in t.column_names:
                return lvl_schema.empty_table()
            kept = t.filter(pc.is_null(t.column("seen")))
            return pa.table(
                {
                    "s": kept.column("s"),
                    "node": kept.column("node"),
                    "sigma": kept.column("sigma"),
                }
            )

        new = judged.map_batches(
            unseen_only, batch_format="pyarrow"
        ).materialize()
        if new.count() == 0:
            break
        levels.append(new)
        vis = vis.union(
            new.map_batches(
                lambda t: pa.table(
                    {
                        "s": t.column("s"),
                        "node": t.column("node"),
                        "seen": pa.array([1] * len(t), type=pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        ).materialize()

    # backward dependency accumulation, deepest level first (δ_fp = 0)
    dl_schema = pa.schema(
        [
            ("s", pa.int64()),
            ("node", pa.int64()),
            ("sigma", pa.int64()),
            ("delta", pa.int64()),
        ]
    )
    deltas: list = [None] * len(levels)
    deltas[-1] = levels[-1].map_batches(
        lambda t: pa.table(
            {
                "s": t.column("s"),
                "node": t.column("node"),
                "sigma": t.column("sigma"),
                "delta": pa.array([0] * len(t), type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    for d in range(len(levels) - 2, -1, -1):
        succ = local_hash_join(
            edg.map_batches(
                lambda t: pa.table(
                    {"node_v": t.column("src"), "node": t.column("dst")}
                ),
                batch_format="pyarrow",
            ),
            deltas[d + 1],
            on=["node"],
            left_schema=pa.schema(
                [("node_v", pa.int64()), ("node", pa.int64())]
            ),
            right_schema=dl_schema,
            how="inner",
            num_partitions=num_partitions,
        )

        def contrib_partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "s": pa.array([], type=pa.int64()),
                    "node": pa.array([], type=pa.int64()),
                    "fp": pa.array([], type=pa.int64()),
                }
            )
            if len(t) == 0 or "node_v" not in t.column_names:
                return empty
            # exact Python-int partials (assortativity discipline):
            # contributions need σv joined on — emit per-successor rows
            # keyed for the v-level join, combining per (s, v, σw, δw)
            out = (
                pa.table(
                    {
                        "s": t.column("s"),
                        "node": t.column("node_v"),
                        "sw": t.column("sigma"),
                        "dw": t.column("delta"),
                    }
                )
                .group_by(["s", "node", "sw", "dw"])
                .aggregate([([], "count_all")])
            )
            return pa.table(
                {
                    "s": out.column("s"),
                    "node": out.column("node"),
                    "sw": out.column("sw"),
                    "dw": out.column("dw"),
                    "m": out.column("count_all").cast(pa.int64()),
                }
            )

        joined = local_hash_join(
            succ.map_batches(contrib_partial, batch_format="pyarrow"),
            levels[d],
            on=["s", "node"],
            left_schema=pa.schema(
                [
                    ("s", pa.int64()),
                    ("node", pa.int64()),
                    ("sw", pa.int64()),
                    ("dw", pa.int64()),
                    ("m", pa.int64()),
                ]
            ),
            right_schema=lvl_schema,
            how="inner",
            num_partitions=num_partitions,
        )

        def fp_partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "s": pa.array([], type=pa.int64()),
                    "node": pa.array([], type=pa.int64()),
                    "fp": pa.array([], type=pa.int64()),
                }
            )
            if len(t) == 0 or "node" not in t.column_names:
                return empty
            acc: dict = {}
            for s, node, sw, dw, m, sv in zip(
                t.column("s").to_pylist(),
                t.column("node").to_pylist(),
                t.column("sw").to_pylist(),
                t.column("dw").to_pylist(),
                t.column("m").to_pylist(),
                t.column("sigma").to_pylist(),
            ):
                c = m * ((sv * (BC_SCALE + dw)) // sw)
                k = (s, node)
                acc[k] = acc.get(k, 0) + c
            for v in acc.values():
                # explicit raise (not assert — asserts vanish under -O)
                if not (-(1 << 63) <= v < (1 << 63)):
                    raise OverflowError(
                        "betweenness δ fixed-point partial exceeds int64; "
                        "lower max_depth or BC_SCALE"
                    )
            ks = list(acc)
            return pa.table(
                {
                    "s": pa.array([k[0] for k in ks], type=pa.int64()),
                    "node": pa.array([k[1] for k in ks], type=pa.int64()),
                    "fp": pa.array(
                        [acc[k] for k in ks], type=pa.int64()
                    ),
                }
            )

        dsum = hash_grouped(
            joined.map_batches(fp_partial, batch_format="pyarrow"),
            ["s", "node"],
            [("fp", "sum")],
            rename={"fp_sum": "fp"},
            hash_cols=["node"],
            num_partitions=num_partitions,
            checked=True,
        )
        merged = local_hash_join(
            levels[d],
            dsum,
            on=["s", "node"],
            left_schema=lvl_schema,
            right_schema=pa.schema(
                [("s", pa.int64()), ("node", pa.int64()), ("fp", pa.int64())]
            ),
            how="left_outer",
            num_partitions=num_partitions,
        )
        deltas[d] = merged.map_batches(
            lambda t: pa.table(
                {
                    "s": t.column("s"),
                    "node": t.column("node"),
                    "sigma": t.column("sigma"),
                    "delta": t.column("fp").combine_chunks().fill_null(0),
                }
            )
            if len(t) and "node" in t.column_names
            else dl_schema.empty_table(),
            batch_format="pyarrow",
        ).materialize()

    # totals over levels ≥ 1 (level 0 is the source itself)
    parts = None
    for d in range(1, len(levels)):
        piece = deltas[d].map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "fp": t.column("delta")}
            ),
            batch_format="pyarrow",
        )
        parts = piece if parts is None else parts.union(piece)
    if parts is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    "entity_id": pa.array([], type=pa.int64()),
                    "bc_fp": pa.array([], type=pa.int64()),
                    "bc": pa.array([], type=pa.float64()),
                }
            )
        )
    total = hash_grouped(
        parts,
        ["node"],
        [("fp", "sum")],
        rename={"fp_sum": "bc_fp"},
        num_partitions=num_partitions,
        checked=True,
    )

    def out_batch(t: pa.Table) -> pa.Table:
        import numpy as np

        if len(t) == 0 or "node" not in t.column_names:
            return pa.table(
                {
                    "entity_id": pa.array([], type=pa.int64()),
                    "bc_fp": pa.array([], type=pa.int64()),
                    "bc": pa.array([], type=pa.float64()),
                }
            )
        fp = t.column("bc_fp").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "entity_id": t.column("node"),
                "bc_fp": t.column("bc_fp"),
                # power-of-two divisor: the double conversion is exact
                "bc": pa.array(
                    fp.astype(np.float64) / float(BC_SCALE),
                    type=pa.float64(),
                ),
            }
        )

    return total.map_batches(out_batch, batch_format="pyarrow")
