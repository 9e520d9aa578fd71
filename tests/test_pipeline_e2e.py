"""End-to-end Ray pipeline tests: byte identity, P/R vs oracle, resume."""

from __future__ import annotations

import pathlib

import pyarrow.dataset as pads
import pytest

N_DOCS = 96
SEED = 42
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def kg_out(ray_session, corpus_root, tmp_path_factory) -> pathlib.Path:
    from promptner_ray.pipelines.kg import KGConfig, run_kg

    out = tmp_path_factory.mktemp("kg_out")
    run_kg(corpus_root, out, KGConfig(detect_concurrency=2, wave_size=64))
    return out


@pytest.fixture(scope="session")
def oracle(ray_session):
    from promptner_ray.pipelines.oracle import oracle_run

    # oracle_run also asserts extract_text(html) == text per url (byte identity)
    return oracle_run(N_DOCS, seed=SEED, sf_dir=SF_DIR)


def test_byte_identical_extraction(ray_session, corpus_root):
    """extract_text(html) == text column, byte-for-byte, for every url."""
    import ray

    from promptner_ray.stages.extract import extract_text_batch

    pages = ray.data.read_parquet(str(corpus_root / "pages"))
    extracted = pages.map_batches(extract_text_batch, batch_format="pyarrow")
    ext = {
        r["url"]: r["text"]
        for r in extracted.select_columns(["url", "text"]).take_all()
    }
    orig = {
        r["url"]: r["text"]
        for r in pages.select_columns(["url", "text"]).take_all()
    }
    assert ext == orig and len(ext) == N_DOCS


def test_triples_match_oracle(kg_out, oracle):
    from promptner_ray.pipelines.oracle import triple_prf

    got = [
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in pads.dataset(str(kg_out / "triples")).to_table().to_pylist()
    ]
    prf = triple_prf(got, oracle["triples"])
    assert prf["precision"] >= 0.95 and prf["recall"] >= 0.95, prf
    # with a deterministic stub the match should in fact be exact
    assert prf["f1"] == 1.0, prf


def test_links_match_oracle(kg_out, oracle):
    links = pads.dataset(str(kg_out / "links")).to_table().to_pylist()
    got = {r["surface_norm"]: (r["canonical"], r["entity_id"], r["n_mentions"]) for r in links}
    assert got == oracle["links"]


def test_edges_match_oracle(kg_out, oracle):
    edges = pads.dataset(str(kg_out / "edges")).to_table().to_pylist()
    got = {(r["subj_id"], r["pred"], r["obj_id"]): r["weight"] for r in edges}
    assert got == oracle["edges"]
    # every endpoint resolves to a canonical name via the broadcast join
    assert all(r["subj_canonical"] and r["obj_canonical"] for r in edges)


def test_edges_join_path_matches_oracle(
    ray_session, kg_out, tmp_path_factory, oracle
):
    """Forcing the hash-shuffle edge-naming path (threshold 0) must produce
    the same named edge table as the broadcast path / oracle."""
    import shutil

    from promptner_ray.pipelines.kg import run_graph

    out = tmp_path_factory.mktemp("kg_join") / "out"
    out.mkdir(parents=True)
    shutil.copytree(kg_out / "mentions", out / "mentions")
    shutil.copytree(kg_out / "triples", out / "triples")
    s = run_graph(out, broadcast_nodes_max_rows=0)
    assert s["edge_naming"] == "join"
    edges = pads.dataset(str(out / "edges")).to_table().to_pylist()
    got = {(r["subj_id"], r["pred"], r["obj_id"]): r["weight"] for r in edges}
    assert got == oracle["edges"]
    assert all(r["subj_canonical"] and r["obj_canonical"] for r in edges)


def test_manifests_and_counters(kg_out):
    from promptner_ray.state import lineage

    manifests = lineage.read_manifests(kg_out)
    assert len(manifests) == 64  # every partition committed
    total_triples = sum(m["triples"] for m in manifests)
    assert total_triples == pads.dataset(str(kg_out / "triples")).count_rows()
    assert all(
        {"docs_in", "sentences", "mentions", "triples", "committed_at"}
        <= set(m)
        for m in manifests
    )


def test_resume_from_partial_run(ray_session, corpus_root, tmp_path_factory, kg_out):
    """Kill-after-one-wave then resume == one-shot run, no duplicates."""
    from promptner_ray.pipelines.kg import KGConfig, run_extraction
    from promptner_ray.state import lineage

    out = tmp_path_factory.mktemp("kg_resume")
    cfg = KGConfig(detect_concurrency=2, wave_size=16)
    s1 = run_extraction(corpus_root, out, cfg, max_waves=1)
    assert s1["parts_committed"] == 16
    assert lineage.committed_parts(out) == set(range(16))
    # resume: remaining 48 partitions only
    s2 = run_extraction(corpus_root, out, cfg)
    assert s2["parts_done_before"] == 16
    assert s2["parts_committed"] == 48

    def triple_set(root):
        return sorted(
            (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
            for r in pads.dataset(str(root / "triples")).to_table().to_pylist()
        )

    assert triple_set(out) == triple_set(kg_out)


def test_resume_after_midwave_kill(
    ray_session, corpus_root, tmp_path_factory, kg_out
):
    """A kill AFTER parquet lands but BEFORE the manifest commits must not
    duplicate rows on resume: uncommitted part dirs are cleared first."""
    import pathlib as _pl

    from promptner_ray.pipelines.kg import KGConfig, run_extraction
    from promptner_ray.state import lineage

    out = tmp_path_factory.mktemp("kg_midwave")
    cfg = KGConfig(detect_concurrency=2, wave_size=16)
    run_extraction(corpus_root, out, cfg, max_waves=2)
    assert lineage.committed_parts(out) == set(range(32))
    # simulate the mid-wave kill: parquet for parts 16-31 is on disk but the
    # commit markers are gone — exactly the orphan state a kill leaves
    for part in range(16, 32):
        (_pl.Path(out) / "_manifest" / f"part={part}.json").unlink()
    assert lineage.committed_parts(out) == set(range(16))

    s = run_extraction(corpus_root, out, cfg)
    assert s["parts_done_before"] == 16 and s["parts_committed"] == 48

    def triple_set(root):
        return sorted(
            (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
            for r in pads.dataset(str(root / "triples")).to_table().to_pylist()
        )

    assert triple_set(out) == triple_set(kg_out)
