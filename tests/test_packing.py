"""Unit tests for the packed-training-stream layout (functions/packing.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from promptner_ray.functions.packing import pack_layout


def _docs_ds(rows: dict[int, str], blocks: int = 1):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(rows), type=pa.int64()),
                "text": pa.array(list(rows.values()), type=pa.string()),
            }
        )
    )
    return ds.repartition(blocks) if blocks > 1 else ds


def _expected(rows: dict[int, str], seq_len: int):
    out, acc = {}, 0
    for doc_id in sorted(rows):
        n = len(rows[doc_id].split(" "))
        out[doc_id] = (n, acc, acc // seq_len, (acc + n - 1) // seq_len, acc % seq_len)
        acc += n
    return out


def test_pack_layout_matches_serial_cumsum(ray_session):
    rng = np.random.default_rng(7)
    # non-contiguous ids, shuffled insertion order, multiple blocks
    ids = [3, 17, 1, 42, 8, 25, 4, 30, 11, 19]
    rows = {i: " ".join(["w"] * int(rng.integers(1, 9))) for i in ids}
    got = pack_layout(_docs_ds(rows, blocks=4), seq_len=5).to_pandas()
    exp = _expected(rows, 5)
    assert len(got) == len(rows)
    for r in got.itertuples():
        assert exp[r.doc_id] == (
            r.n_tokens, r.start, r.seq_first, r.seq_last, r.seq_offset
        ), r.doc_id
    # the packed stream is gapless: sorted starts tile the token axis
    g = got.sort_values("start")
    assert (g["start"].to_numpy()[1:]
            == (g["start"] + g["n_tokens"]).to_numpy()[:-1]).all()


def test_pack_layout_sequence_boundaries(ray_session):
    # doc of 3 tokens starting at offset 6 with seq_len 4 spans seqs 1-2
    rows = {0: "a b c d e f", 1: "g h i"}
    got = pack_layout(_docs_ds(rows), seq_len=4).to_pandas().set_index("doc_id")
    assert got.loc[1, "start"] == 6
    assert got.loc[1, "seq_first"] == 1
    assert got.loc[1, "seq_last"] == 2
    assert got.loc[1, "seq_offset"] == 2


def test_chunk_batch_overlap_and_tail() -> None:
    import pyarrow as pa

    from promptner_ray.functions.packing import chunk_batch

    words = " ".join(f"w{i}" for i in range(10))
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array([words, "x y"]),
        }
    )
    out = chunk_batch(t, chunk_tokens=4, overlap=2).to_pydict()
    rows = list(
        zip(out["doc_id"], out["chunk_id"], out["n_tokens"], out["chunk_text"])
    )
    # doc1 (10 tokens, stride 2): starts 0,2,4,6 (ceil((10-4)/2)+1 = 4)
    assert rows[:4] == [
        (1, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, "w2 w3 w4 w5"),
        (1, 2, 4, "w4 w5 w6 w7"),
        (1, 3, 4, "w6 w7 w8 w9"),
    ]
    # consecutive chunks share exactly `overlap` tokens
    assert rows[0][3].split()[-2:] == rows[1][3].split()[:2]
    # short doc: one (shorter) chunk
    assert rows[4] == (2, 0, 2, "x y")
