"""Recall + compute-pruning gates for the approximate-NN operators.

ANN indexes (IVF, hyperplane LSH) are meaningful on data with neighborhood
structure; on isotropic random vectors every sublinear index degrades toward
a full scan (points concentrate at equal distances in high dimension), so
the recall gates here run on CLUSTERED synthetic embeddings — the regime
the operators exist for — while the driver's (isotropic) ``embeddings``
table is covered by rows-only execution checks in test_oracle_parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

DIM = 64
N_VECS = 6000
N_CLUSTERS = 50
N_QUERIES = 8
K = 10


@pytest.fixture(scope="module")
def clustered(ray_session):
    import ray

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, N_CLUSTERS, N_VECS)
    mat = centers[assign] + 0.1 * rng.standard_normal((N_VECS, DIM))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = np.arange(N_VECS, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in mat],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    return ids, mat.astype(np.float64), ds


def _exact_topk(ids, mat, k=K):
    q = mat[:N_QUERIES]
    sims = q @ mat.T  # unit vectors
    gt = {}
    for i in range(N_QUERIES):
        sims[i, i] = -2
        order = np.lexsort((ids, -sims[i]))[:k]
        gt[int(ids[i])] = set(ids[order].tolist())
    return gt


def _got_topk(result_ds):
    got: dict[int, set] = {}
    for r in result_ds.take_all():
        got.setdefault(int(r["qid"]), set()).add(int(r["nid"]))
    return got


def _recall(got, gt):
    return np.mean(
        [len(got.get(q, set()) & gt[q]) / len(gt[q]) for q in gt]
    )


def test_ivf_recall_and_pruning(ray_session, clustered):
    import ray

    from promptner_ray.functions import similarity

    ids, mat, ds = clustered
    cent = similarity.train_centroids_from_matrix(mat[:4096], 64, seed=42)
    cent_ref = ray.put(cent)
    qref = ray.put((ids[:N_QUERIES], mat[:N_QUERIES]))

    got = _got_topk(
        similarity.knn_ivf(
            similarity.ivf_assign(ds, cent_ref), qref, cent_ref, k=K, nprobe=4
        )
    )
    gt = _exact_topk(ids, mat)
    assert _recall(got, gt) >= 0.9

    # compute pruning is structural: candidate fraction = rows whose cell is
    # among the query's nprobe probes, measured directly from assignments
    assign = np.argmax(mat @ cent.T, axis=1)
    probes = np.argsort(-(mat[:N_QUERIES] @ cent.T), axis=1)[:, :4]
    frac = np.mean(
        [np.isin(assign, probes[i]).mean() for i in range(N_QUERIES)]
    )
    assert frac < 0.20, f"candidate fraction {frac:.3f} not < 20%"


def test_lsh_pruning_and_recall_floor(ray_session, clustered):
    import ray

    from promptner_ray.functions import similarity

    ids, mat, ds = clustered
    qref = ray.put((ids[:N_QUERIES], mat[:N_QUERIES]))
    got = _got_topk(similarity.knn_lsh(ds, qref, k=K, dim=DIM))
    gt = _exact_topk(ids, mat)
    # query-directed multiprobe (agree on the LSH_CONFIDENT
    # highest-margin planes): recall 0.8 at candidate fraction
    # 2^-LSH_CONFIDENT — vs 0.45 for the old Hamming-≤2 probe at the
    # same fraction.  IVF above remains the production path (0.9 gate).
    assert _recall(got, gt) >= 0.8

    planes = similarity.lsh_planes(DIM)
    buckets = similarity._bucket_of(mat, planes)
    qb = similarity._bucket_of(mat[:N_QUERIES], planes)
    proj = mat[:N_QUERIES] @ planes
    mq = np.floor(
        np.abs(proj) * similarity.LSH_MARGIN_SCALE
    ).astype(np.int64)
    fracs = []
    for qi in range(N_QUERIES):
        order = np.lexsort((np.arange(similarity.N_PLANES), -mq[qi]))
        mask = np.uint32(0)
        for p in order[: similarity.LSH_CONFIDENT]:
            mask |= np.uint32(1) << np.uint32(p)
        fracs.append((((buckets ^ qb[qi]) & mask) == 0).mean())
    assert np.mean(fracs) < 0.20


def test_cosine_pairs_ivf_recall(ray_session, clustered):
    """IVF-bucketed near-dup pairs find ≥90% of the exact threshold pairs
    on clustered data, with zero corpus broadcast."""
    import ray

    from promptner_ray.functions import similarity

    ids, mat, ds = clustered
    threshold = 0.8
    cent = similarity.train_centroids_from_matrix(mat[:4096], 64, seed=42)
    cent_ref = ray.put(cent)
    got = {
        (int(r["vec_a"]), int(r["vec_b"]))
        for r in similarity.cosine_pairs_ivf(
            ds, cent_ref, threshold=threshold
        ).take_all()
    }
    m = mat  # already unit-norm
    sims = m @ m.T
    iu = np.triu_indices(len(ids), k=1)
    exact = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(*[x[sims[iu] >= threshold] for x in iu])
    }
    assert exact, "test setup must produce at least some exact pairs"
    assert not (got - exact), "bucketed pairs must be a subset (exact verify)"
    assert len(got & exact) / len(exact) >= 0.9


def test_ivf_runs_on_driver_table(ray_session):
    """The sf embeddings table (isotropic) still executes end to end."""
    import __ray_entry__ as entrymod

    df = entrymod.queries()["embed_knn_ivf"]("/root/testdata/sf0.001")
    pdf = df.to_pandas()
    assert len(pdf) > 0 and set(pdf.columns) == {"qid", "nid", "rank"}


def test_cosine_pairs_blocked_exact_unsorted_blocks(ray_session):
    """The blocked all-pairs plan is EXACT regardless of how vec_ids are
    laid out across blocks: ids are shuffled before blocking so
    off-diagonal tiles see both orientations (block_a ids greater AND
    smaller than block_b ids)."""
    import ray

    from promptner_ray.functions import similarity

    rng = np.random.RandomState(11)
    n, dim, threshold = 400, 16, 0.75
    mat = rng.standard_normal((n, dim))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    # make some near-dup pairs so the expected set is non-trivial
    for src, dst in [(3, 77), (150, 9), (388, 12), (200, 201)]:
        mat[dst] = mat[src] + 0.05 * rng.standard_normal(dim)
        mat[dst] /= np.linalg.norm(mat[dst])
    ids = np.arange(n, dtype=np.int64)
    perm = rng.permutation(n)  # scatter ids across blocks
    tables = []
    for lo in range(0, n, 100):
        sel = perm[lo : lo + 100]
        tables.append(
            pa.table(
                {
                    "vec_id": pa.array(ids[sel], type=pa.int64()),
                    "embedding": pa.array(
                        [row for row in mat[sel]],
                        type=pa.list_(pa.float64()),
                    ),
                }
            )
        )
    ds = ray.data.from_arrow(tables)
    assert ds.materialize().num_blocks() > 1
    got = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.cosine_pairs(ds, threshold=threshold).take_all()
    }
    sims = mat @ mat.T
    iu = np.triu_indices(n, k=1)
    exact = {
        (int(iu[0][t]), int(iu[1][t]))
        for t in np.nonzero(sims[iu] >= threshold)[0]
    }
    assert exact and got == exact


def test_semantic_dedup_matches_numpy_reference(ray_session, clustered):
    """semantic_dedup's keep set equals the id-greedy rule computed
    brute-force in numpy over the SAME cell assignment — and on the
    tightly-clustered fixture it must actually drop a large fraction."""
    import ray

    from promptner_ray.functions import similarity

    ids, mat, ds = clustered
    cent = similarity.train_centroids_from_matrix(mat, n_centroids=32)
    cent_ref = ray.put(cent)
    # 64-dim noise at 0.1 relative puts within-cluster cosine near 0.6
    threshold = 0.55
    out = similarity.semantic_dedup(ds, cent_ref, threshold=threshold)
    got = {r["vec_id"]: (r["cell"], r["keep"]) for r in out.take_all()}
    # numpy reference: same assignment (argmax cosine, first-max ties)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    cells = np.argmax(norm @ cent.T, axis=1)
    sims = norm @ norm.T
    expect_keep = {}
    for i in range(len(ids)):
        same = (cells == cells[i]) & (ids < ids[i])
        expect_keep[int(ids[i])] = not bool((sims[i, same] >= threshold).any())
    assert len(got) == len(ids)
    for vid, (cell, keep) in got.items():
        assert cell == int(cells[vid])
        assert keep == expect_keep[vid], vid
    n_drop = sum(1 for k in expect_keep.values() if not k)
    assert n_drop > len(ids) * 0.2  # clusters are tight; many near-dups


def test_cosine_pairs_survives_empty_blocks(ray_session):
    """Filters/unions emit zero-row blocks (documented in shuffle.py);
    the blocked tile plan must skip them, not IndexError in
    _batch_matrix."""
    import ray

    from promptner_ray.functions import similarity

    rng = np.random.RandomState(5)
    mat = rng.standard_normal((60, 8))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat[1] = mat[0]  # one guaranteed pair
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(60, dtype=np.int64)),
            "embedding": pa.array(
                [row for row in mat], type=pa.list_(pa.float64())
            ),
        }
    )
    empty = tbl.slice(0, 0)
    ds = ray.data.from_arrow([tbl.slice(0, 30), empty, tbl.slice(30, 30)])
    got = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.cosine_pairs(ds, threshold=0.99).take_all()
    }
    assert (0, 1) in got


def test_quantize_zero_dimension_codes_zero(ray_session):
    """An all-zero dimension (maxabs 0) must code to 0 on BOTH engines,
    never NaN→-2^63 on the Ray side / a floor(NaN) error in DuckDB."""
    import duckdb
    import ray

    from promptner_ray.functions import similarity

    rng = np.random.RandomState(9)
    mat = rng.standard_normal((20, 4))
    mat[:, 2] = 0.0  # dead dimension
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(20, dtype=np.int64)),
            "embedding": pa.array(
                [row for row in mat.astype(np.float64)],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    got = (
        similarity.quantize_embeddings(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values(["vec_id", "dim_idx"], ignore_index=True)
    )
    dead = got[got.dim_idx == 2]["code"]
    assert (dead == 0).all()
    con = duckdb.connect()
    con.register("embeddings", tbl)
    want = (
        con.execute(similarity.sql_quantize(dim=4))
        .df()
        .sort_values(["vec_id", "dim_idx"], ignore_index=True)
    )
    assert got[["vec_id", "dim_idx", "code"]].equals(
        want[["vec_id", "dim_idx", "code"]]
    )


def test_ivfadc_matches_reference_and_beats_baseline(ray_session, clustered):
    """IVF-ADC: the distributed plan must equal a single-process ADC
    reference BIT FOR BIT (same probes, same codes, same left-to-right
    LUT sums), and its recall must sit far above the random-candidate
    baseline.  An absolute 0.9-style recall gate would test PQ's
    resolution, not our plan: on this fixture the within-cluster
    neighbors are tighter than even a 128-bit code can rank (measured
    0.125 @ m4k16 ... 0.64 @ m16k256) - the documented regime where
    production systems add exact re-ranking on the ADC shortlist."""
    import ray

    from promptner_ray.functions import similarity

    ids, mat, ds = clustered
    m, kk = 8, 64
    cent = similarity.train_centroids_from_matrix(mat[:4096], 64, seed=42)
    cbs = similarity.train_pq_from_matrix(mat[:4096], m=m, k=kk, seed=42)
    sub = DIM // m
    q = mat[:N_QUERIES]
    lut = np.empty((N_QUERIES, m, kk), dtype=np.float64)
    for s in range(m):
        qs = q[:, s * sub:(s + 1) * sub]
        diff = qs[:, None, :] - cbs[s][None, :, :]
        lut[:, s, :] = (diff * diff).sum(axis=2)
    cent_ref, cb_ref = ray.put(cent), ray.put(cbs)
    qref = ray.put((ids[:N_QUERIES], q))
    enc = similarity.ivfadc_encode(ds, cent_ref, cb_ref)
    # the encode output carries no embedding column at all
    assert "embedding" not in enc.schema().names
    out = similarity.knn_ivfadc(
        enc, qref, cent_ref, ray.put(lut), k=K, nprobe=4
    ).to_pandas()

    # single-process ADC reference: identical probes / codes / sums
    cells = np.argmax(
        (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ cent.T, axis=1
    )
    probes = np.argsort(
        -(q / np.linalg.norm(q, axis=1, keepdims=True)) @ cent.T,
        axis=1,
        kind="stable",
    )[:, :4]
    codes = np.empty((N_VECS, m), dtype=int)
    for s in range(m):
        xs = mat[:, s * sub:(s + 1) * sub]
        d = (
            (xs * xs).sum(axis=1, keepdims=True)
            - 2.0 * (xs @ cbs[s].T)
            + (cbs[s] * cbs[s]).sum(axis=1)[None, :]
        )
        codes[:, s] = np.argmin(d, axis=1)
    ref_rows = []
    for qi in range(N_QUERIES):
        cand = np.nonzero(np.isin(cells, probes[qi]) & (ids != ids[qi]))[0]
        dist = lut[qi, 0][codes[cand, 0]].copy()
        for s in range(1, m):
            dist += lut[qi, s][codes[cand, s]]
        order = np.lexsort((ids[cand], dist))[:K]
        for r, j in enumerate(order):
            ref_rows.append(
                (int(ids[qi]), int(ids[cand][j]), float(dist[j]), r + 1)
            )
    got = sorted(map(tuple, out[["qid", "nid", "dist", "rank"]].values.tolist()))
    assert got == sorted(ref_rows)  # bit-exact, floats included

    # recall: far above the random-candidate baseline (~K/|cand|)
    gt = _exact_topk(ids, mat)
    got_sets = _got_topk_from_df(out)
    rec = _recall(got_sets, gt)
    assert rec >= 0.15, rec  # ~7x the ~0.02 random baseline


def _got_topk_from_df(df):
    got = {}
    for qid, nid in zip(df["qid"], df["nid"]):
        got.setdefault(int(qid), set()).add(int(nid))
    return got
