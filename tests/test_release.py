"""End-to-end test of the composed web-scale KG release pipeline
(`pipelines/release.py`): crawl dedup → extraction → quality gates →
content dedup → detection → schema filter → graph build → centrality
annotations, chained with no intermediate exports."""

from __future__ import annotations

import json
import pathlib

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def released(ray_session):
    import __ray_entry__ as entrymod
    from promptner_ray.pipelines.release import release_graph

    out = release_graph(entrymod._pages(SF_DIR))
    return {
        "nodes": out["nodes"].to_pandas(),
        "edges": out["edges"].to_pandas(),
    }


def test_release_nodes_shape_and_annotations(released) -> None:
    nodes = released["nodes"]
    assert list(nodes.columns) == [
        "entity_id",
        "canonical",
        "etype",
        "n_mentions",
        "rank",
        "harmonic",
    ]
    assert len(nodes) > 0
    assert nodes["entity_id"].is_unique
    # annotations are real: PageRank mass sums to ~1 over the edge
    # graph's nodes (isolated nodes carry fill-null 0)
    assert 0.99 < nodes["rank"].sum() < 1.01
    assert (nodes["rank"] >= 0).all() and (nodes["harmonic"] >= 0).all()
    assert nodes["harmonic"].max() > 0


def test_release_edges_reference_known_nodes(released) -> None:
    nodes, edges = released["nodes"], released["edges"]
    ids = set(nodes["entity_id"])
    assert len(edges) > 0
    assert set(edges["subj_id"]).issubset(ids)
    assert set(edges["obj_id"]).issubset(ids)
    assert (edges["weight"] > 0).all()


def test_release_schema_filter_bites(ray_session, released) -> None:
    """The ontology gate must actually remove low-support patterns —
    the released edge table is a strict subset of the raw one."""
    import __ray_entry__ as entrymod
    from promptner_ray.pipelines import kg

    raw = kg.edges(entrymod.queries()["kg_triples"](SF_DIR)).to_pandas()
    assert 0 < len(released["edges"]) < len(raw)


def test_release_deterministic(ray_session, released) -> None:
    import __ray_entry__ as entrymod
    from promptner_ray.pipelines.release import release_graph

    again = release_graph(entrymod._pages(SF_DIR))
    nodes2 = (
        again["nodes"].to_pandas().sort_values("entity_id", ignore_index=True)
    )
    nodes1 = released["nodes"].sort_values("entity_id", ignore_index=True)
    assert nodes1.equals(nodes2)


def test_run_release_resumable(ray_session, tmp_path) -> None:
    """Disk-backed release: manifests commit, and a re-run skips the
    already-committed extraction partitions."""
    import __ray_entry__ as entrymod
    from promptner_ray.pipelines.release import run_release

    root = entrymod._corpus_root(SF_DIR)
    out = tmp_path / "release"
    s1 = run_release(root, out)
    assert s1["nodes"] > 0 and s1["edges"] > 0
    assert (out / "_manifest" / "release.json").is_file()
    rel = json.loads((out / "_manifest" / "release.json").read_text())
    assert rel["nodes"] == s1["nodes"]
    # parquet actually on disk, bucket-partitioned
    assert any((out / "release_nodes").rglob("*.parquet"))
    s2 = run_release(root, out)
    assert s2["parts_done_before"] > 0
    assert s2["parts_committed"] == 0  # extraction fully resumed
    assert s2["nodes"] == s1["nodes"] and s2["edges"] == s1["edges"]
