"""JSONL source/sink round-trip against the documents parquet table."""

from __future__ import annotations


def test_jsonl_roundtrip_documents(ray_session, tmp_path):
    import ray

    from promptner_ray.sources.jsonl import read_docs_jsonl, write_docs_jsonl

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select_columns(["doc_id", "text", "lang"])
    out = tmp_path / "dump"
    write_docs_jsonl(docs, str(out))

    back = read_docs_jsonl(
        [str(p) for p in sorted(out.glob("*.json"))]
    )
    got = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in back.take_all()
    )
    want = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in docs.take_all()
    )
    assert got == want


def test_jsonl_missing_lang_defaults(ray_session, tmp_path):
    from promptner_ray.sources.jsonl import read_docs_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text('{"doc_id": 1, "text": "hello world"}\n')
    rows = read_docs_jsonl(str(p)).take_all()
    assert rows == [{"doc_id": 1, "text": "hello world", "lang": "und"}]
