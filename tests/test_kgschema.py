"""Unit tests for the KG schema-induction / training-prep operators
(functions/kgschema.py): hand-crafted expectations plus
partition-count-invariance; the DuckDB value twins live in
test_oracle_parity (kg_schema / kg_schema_filter / kg_paths /
kg_negative_samples)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from promptner_ray.functions.kgschema import (
    PATH_PIVOT_CAP,
    SCHEMA_KEEP_DEN,
    negative_samples,
    node_ranks,
    path_counts,
    schema_filter,
    schema_patterns,
)


def _triples(rows):
    """rows: (subj, pred, obj, subj_type, obj_type)."""
    return pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(rows))]),
            "sent_id": pa.array(
                [0] * len(rows), type=pa.int32()
            ),
            "subj": pa.array([r[0] for r in rows]),
            "pred": pa.array([r[1] for r in rows]),
            "obj": pa.array([r[2] for r in rows]),
            "subj_type": pa.array([r[3] for r in rows]),
            "obj_type": pa.array([r[4] for r in rows]),
        }
    )


def _edges(rows):
    """rows: (subj_id, pred, obj_id, weight)."""
    return pa.table(
        {
            "subj_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "pred": pa.array([r[1] for r in rows]),
            "obj_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "weight": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def test_schema_patterns_counts_and_pair_diversity(ray_session) -> None:
    rows = (
        # 3 instances of (person, works_for, org) over 2 distinct pairs
        [("alice", "works_for", "acme", "person", "org")] * 2
        + [("bob", "works_for", "acme", "person", "org")]
        # 1 instance of (org, based_in, loc)
        + [("acme", "based_in", "paris", "org", "loc")]
    )
    got = (
        schema_patterns(ray.data.from_arrow(_triples(rows)))
        .to_pandas()
        .set_index(["subj_type", "pred", "obj_type"])
        .sort_index()
    )
    assert got.loc[("person", "works_for", "org")].tolist() == [3, 2]
    assert got.loc[("org", "based_in", "loc")].tolist() == [1, 1]
    assert len(got) == 2


def test_schema_filter_drops_minority_signatures(ray_session) -> None:
    # pred "rel": 39 conforming instances + 1 mis-typed (2.5% < 1/DEN=5%)
    rows = [("a", "rel", "b", "person", "org")] * (2 * SCHEMA_KEEP_DEN - 1)
    rows.append(("x", "rel", "y", "loc", "loc"))
    kept = schema_filter(ray.data.from_arrow(_triples(rows))).to_pandas()
    assert len(kept) == 2 * SCHEMA_KEEP_DEN - 1
    assert set(kept["subj_type"]) == {"person"}
    # exactly at threshold (1 of DEN) the pattern survives
    rows2 = [("a", "rel", "b", "person", "org")] * (SCHEMA_KEEP_DEN - 1)
    rows2.append(("x", "rel", "y", "loc", "loc"))
    kept2 = schema_filter(ray.data.from_arrow(_triples(rows2))).to_pandas()
    assert len(kept2) == SCHEMA_KEEP_DEN


def test_path_counts_hub_capped(ray_session) -> None:
    # chain 1 -p-> 2 -q-> 3 plus a hub (id 9) with PATH_PIVOT_CAP+1
    # in-edges and one out-edge: pivot 2 passes, hub 9 is excluded
    rows = [(1, "p", 2, 2), (2, "q", 3, 5)]
    rows += [(100 + i, "x", 9, 1) for i in range(PATH_PIVOT_CAP)]
    rows.append((9, "y", 4, 1))
    got = path_counts(ray.data.from_arrow(_edges(rows))).to_pandas()
    assert got[["a", "b", "c"]].values.tolist() == [[1, 2, 3]]
    assert got["p1"].tolist() == ["p"] and got["p2"].tolist() == ["q"]
    assert got["w"].tolist() == [10]


def test_node_ranks_dense_uint64_order(ray_session) -> None:
    ids = [5, -3, 0, 7, -1, 123456789]
    nodes = pa.table({"entity_id": pa.array(ids, type=pa.int64())})
    ranked, n = node_ranks(ray.data.from_arrow(nodes))
    assert n == len(ids)
    got = ranked.to_pandas().sort_values("rank")
    # uint64 order: non-negatives ascending, then negatives ascending
    want = sorted(ids, key=lambda x: x & 0xFFFFFFFFFFFFFFFF)
    assert got["nid"].tolist() == want
    assert got["rank"].tolist() == list(range(len(ids)))


def test_negative_samples_excludes_true_and_degenerate(
    ray_session,
) -> None:
    rng = np.random.default_rng(7)
    edge_rows = []
    seen = set()
    for _ in range(80):
        s, o = (int(x) for x in rng.integers(0, 12, 2))
        if s != o and (s, o) not in seen:
            seen.add((s, o))
            edge_rows.append((s, "r", o, 1))
    node_ids = sorted({r[0] for r in edge_rows} | {r[2] for r in edge_rows})
    nodes = pa.table(
        {"entity_id": pa.array(node_ids, type=pa.int64())}
    )
    out = negative_samples(
        ray.data.from_arrow(_edges(edge_rows)),
        ray.data.from_arrow(nodes),
    ).to_pandas()
    assert len(out) > 0
    true = {(r[0], r[2]) for r in edge_rows}
    for _, row in out.iterrows():
        assert (row["subj_id"], row["neg_id"]) not in true
        assert row["neg_id"] != row["obj_id"]
        assert row["neg_id"] != row["subj_id"]
        assert row["neg_id"] in node_ids
    # deterministic at any partition count
    out2 = negative_samples(
        ray.data.from_arrow(_edges(edge_rows)).repartition(5),
        ray.data.from_arrow(nodes).repartition(3),
        num_partitions=2,
    ).to_pandas()
    key = ["subj_id", "pred", "obj_id", "neg_no", "neg_id"]
    a = out[key].sort_values(key, ignore_index=True)
    b = out2[key].sort_values(key, ignore_index=True)
    assert a.equals(b)


def test_pred_cooc_counts_and_hot_cap(ray_session) -> None:
    from promptner_ray.functions.kgschema import DIRT_PAIR_CAP, pred_cooc

    rows = []
    # pair (alice, acme): 3 distinct preds → 3 predicate pairs
    for p in ("founded", "leads", "owns"):
        rows.append(("alice", p, "acme", "person", "org"))
    rows.append(("alice", "founded", "acme", "person", "org"))  # dup triple
    # pair (bob, acme): shares "founded"+"leads" → reinforces that pair
    rows.append(("bob", "founded", "acme", "person", "org"))
    rows.append(("bob", "leads", "acme", "person", "org"))
    # hot pair: > cap distinct preds must be skipped entirely
    for i in range(DIRT_PAIR_CAP + 1):
        rows.append(("x", f"p{i:02d}", "y", "t", "t"))
    got = (
        pred_cooc(ray.data.from_arrow(_triples(rows)))
        .to_pandas()
        .set_index(["pred_a", "pred_b"])["n_pairs"]
        .to_dict()
    )
    assert got == {
        ("founded", "leads"): 2,
        ("founded", "owns"): 1,
        ("leads", "owns"): 1,
    }
