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
Convergence is detected with a constant-size changed-row count per round.
"""

from __future__ import annotations

import pyarrow as pa


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
    from ..shuffle import hash_grouped

    if num_partitions is None:
        import ray

        num_partitions = (
            max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
            if ray.is_initialized()
            else 8
        )
    edges = _both_directions(pairs, a, b).materialize()
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

    for _ in range(max_iters):
        # neighbor labels: join edges on src, propagate src's label to dst
        prop = edges.join(
            labels.map_batches(
                lambda t: pa.table(
                    {"src": t.column("dst"), "label": t.column("label")}
                ),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
        ).select_columns(["dst", "label"])
        new_labels = hash_grouped(
            prop.union(labels),
            ["dst"],
            [("label", "min")],
            rename={"label_min": "label"},
            num_partitions=num_partitions,
        ).materialize()
        # constant-size convergence check: any label decreased?
        changed = (
            new_labels.join(
                labels.map_batches(
                    lambda t: pa.table(
                        {"dst": t.column("dst"), "old": t.column("label")}
                    ),
                    batch_format="pyarrow",
                ),
                join_type="inner",
                num_partitions=num_partitions,
                on=("dst",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "c": pa.array(
                            [
                                int(
                                    (
                                        t.column("label").to_numpy(
                                            zero_copy_only=False
                                        )
                                        != t.column("old").to_numpy(
                                            zero_copy_only=False
                                        )
                                    ).sum()
                                )
                            ],
                            type=pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .sum("c")
        )
        labels = new_labels
        if not changed:
            break
    return labels.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("dst"),
                "component": t.column("label"),
            }
        ),
        batch_format="pyarrow",
    )
