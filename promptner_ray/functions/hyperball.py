"""HyperBall: per-node neighborhood-function estimation over a directed
graph (Boldi & Vigna 2013, "In-Core Computation of Geometric
Centralities with HyperBall") — the standard web-graph tool behind
"what is the effective diameter / how big is each page's h-hop ball"
at billions of nodes, where exact per-node reachability is hopeless.

Each node carries one tiny HyperLogLog sketch.  The precision ``p`` is
a first-class knob on every entry point (engine, BSP twin, SQL twin):
the default p = 4 → 16 registers is the paper's in-core low end
(±~26% standard error = 1.04/√m); a 100 TB web graph wants p = 6-8
(±13% / ±6.5%) — per-node state and per-round message width grow as
m = 2^p.  Accuracy is gated at p = 4 AND p ≥ 6 in
tests/test_hyperball.py.
``ball(v, h) = {v} ∪ ⋃_{(v,u)∈E} ball(u, h−1)``, and because an HLL
union is an element-wise register max, one iteration is exactly a
grouped-Max exchange over the register vectors — the same shape as one
PageRank round, with a 16-wide int64 payload instead of one scalar.

Determinism discipline (same as :mod:`.hll`): registers derive from
``md5(str(entity_id))`` with the register/rank split the DuckDB twin
recomputes bit-exactly; element-wise max commutes, so the register
table is identical at any partition count.  The float estimate is
derived from the integer registers with a FIXED-ORDER 16-term float
sum, a precomputed ``α·m²`` literal shared with the SQL string, and a
16-entry linear-counting lookup table (``m·ln(m/V)``, ``math.log`` =
libm = DuckDB ``ln``) — so even the DOUBLE column hash-matches the
oracle.

Scale notes: per-round exchange volume is |E| + |V| rows of 17 int64s;
per-node state is 16 int64s (the paper packs 5-bit registers — a
representation detail this Arrow layout trades for vectorized max).
No broadcast, no driver-side state beyond the loop counter.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

P_HB = 4  # default: 16 registers/node, the paper's in-core low end
HB_LOCAL_EDGES = 100_000  # tail-local rounds gate (distinct edges)
M_HB = 1 << P_HB
_W_HB = 64 - P_HB  # 60-bit rank suffix
_REST_MASK_HB = (1 << _W_HB) - 1
REG_COLS = [f"r{j}" for j in range(M_HB)]

#: Flajolet bias constants: the three exact small-m values from the
#: HLL paper, the asymptotic 0.7213/(1 + 1.079/m) above
_ALPHA_SMALL = {4: 0.673, 5: 0.697, 6: 0.709}


def _alpha_m2(m: int) -> float:
    """α·m² for ``m = 2^p`` registers — inlined as ONE float literal
    into the SQL twin so both engines divide by the identical value."""
    p = m.bit_length() - 1
    a = _ALPHA_SMALL.get(p, 0.7213 / (1.0 + 1.079 / m))
    return a * m * m


#: α·m² for the default p=4 (backward-compatible module constant)
ALPHA_M2 = _alpha_m2(M_HB)

_LIN_CACHE: dict = {}


def _lin_est_table(m: int) -> np.ndarray:
    """linear-counting lookup: V zero registers → m·ln(m/V); index 0
    unused."""
    t = _LIN_CACHE.get(m)
    if t is None:
        t = np.array(
            [0.0]
            + [float(m) * math.log(float(m) / v) for v in range(1, m + 1)]
        )
        _LIN_CACHE[m] = t
    return t


def reg_cols(p: int = P_HB) -> list[str]:
    """Register column names for precision ``p`` (m = 2^p columns).

    ``p`` is a first-class knob: 16 registers (p=4) is the paper's
    in-core low end at ±~26% standard error (1.04/√m); a 100 TB web
    graph wants p=6-8 (±13% / ±6.5%) — per-node state grows linearly
    with m, per-round exchange volume with m·(|E|+|V|)."""
    return [f"r{j}" for j in range(1 << p)]


def _reg_schema(p: int = P_HB) -> pa.Schema:
    return pa.schema(
        [("entity_id", pa.int64())]
        + [(c, pa.int64()) for c in reg_cols(p)]
    )


def _empty_regs(p: int = P_HB) -> pa.Table:
    return pa.table(
        {
            "entity_id": pa.array([], type=pa.int64()),
            **{c: pa.array([], type=pa.int64()) for c in reg_cols(p)},
        }
    )


def _init_registers(t: pa.Table, p: int = P_HB) -> pa.Table:
    """(entity_id) → entity_id + 2^p register columns: the h = 0 sketch
    holds exactly the node's own hash (ball(v, 0) = {v})."""
    if t.num_rows == 0 or "entity_id" not in t.column_names:
        return _empty_regs(p)
    w = 64 - p
    rest_mask = (1 << w) - 1
    ids = t.column("entity_id").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    regs = np.zeros((len(ids), 1 << p), dtype=np.int64)
    for i, v in enumerate(ids):
        hv = int.from_bytes(
            hashlib.md5(str(int(v)).encode("utf-8")).digest()[:8], "big"
        )
        rest = hv & rest_mask
        regs[i, hv >> w] = w - rest.bit_length() + 1
    cols = {"entity_id": pa.array(ids)}
    for j, name in enumerate(reg_cols(p)):
        cols[name] = pa.array(regs[:, j])
    return pa.table(cols)


def _estimate_np(ranks: np.ndarray) -> np.ndarray:
    """(n × m) rank matrix → bias-corrected HLL estimates, every float
    op in an order the SQL twin replays.  ``m`` (and hence p) is read
    off the matrix width, so the BSP shards need no extra plumbing."""
    m = ranks.shape[1]
    pw = np.power(2.0, -ranks.astype(np.float64))  # exact powers of two
    acc = pw[:, 0].copy()
    for j in range(1, m):  # fixed left-to-right order, as in the SQL
        acc = acc + pw[:, j]
    raw = _alpha_m2(m) / acc
    zeros = (ranks == 0).sum(axis=1)
    lin = _lin_est_table(m)[zeros]
    return np.where((raw <= 2.5 * m) & (zeros > 0), lin, raw)


def _estimate_batch(t: pa.Table) -> pa.Table:
    """(entity_id, r0..r{m-1}) → (entity_id, ball_est); m inferred from
    the column count."""
    if t.num_rows == 0 or "r0" not in t.column_names:
        return pa.table(
            {
                "entity_id": pa.array([], type=pa.int64()),
                "ball_est": pa.array([], type=pa.float64()),
            }
        )
    cols = [c for c in t.column_names if c != "entity_id"]
    ranks = np.stack(
        [
            t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in cols
        ],
        axis=1,
    )
    return pa.table(
        {
            "entity_id": t.column("entity_id"),
            "ball_est": pa.array(_estimate_np(ranks), type=pa.float64()),
        }
    )


def hyperball(
    edges,
    iters: int = 4,
    num_partitions: int | None = None,
    p: int = P_HB,
):
    """edges(subj_id, obj_id, …) → (entity_id, ball_est): estimated
    number of distinct nodes within ``iters`` directed hops of each
    node (the node itself included).  See the module docstring for the
    algorithm, determinism and scale arguments.

    ``p`` sets the per-node register count (m = 2^p; standard error
    1.04/√m): p=4 is the in-core low end, p=6-8 the web-scale setting —
    accuracy gated at both in tests/test_hyperball.py.

    Plan per round: one ``local_hash_join`` landing each node's sketch
    on its in-edges, then one m-column grouped Max folding neighbor
    sketches into the node's own — both exchanges sized to the data.
    """
    return _round_tables(edges, iters, num_partitions, p=p)[
        -1
    ].map_batches(_estimate_batch, batch_format="pyarrow")


def _round_tables(
    edges,
    iters: int,
    num_partitions: int | None,
    direction: str = "out",
    p: int = P_HB,
):
    """The shared HyperBall loop: list of the per-round register
    Datasets ``[h=0, …, h=iters]``.  ``direction="out"`` grows balls
    along out-edges (each node gathers its OUT-neighbors' sketches —
    the ball it can reach); ``"in"`` grows incoming-reach balls (who
    can reach it — the harmonic-centrality direction)."""
    from ..shuffle import hash_grouped, local_hash_join
    from .graphops import _iter_partitions

    read_col, emit_col = (
        ("obj_id", "subj_id") if direction == "out" else ("subj_id", "obj_id")
    )

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity_id": t.column(read_col).cast(pa.int64()),
                "subj": t.column(emit_col).cast(pa.int64()),
            }
        )

    pairs = hash_grouped(
        edges.map_batches(to_pairs, batch_format="pyarrow"),
        ["entity_id", "subj"],
        [],
        num_partitions=num_partitions,
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs <= HB_LOCAL_EDGES:
        # tail-local rounds: on a toy/residual graph the iters×(join +
        # 16-column grouped Max) exchange chain is pure latency — run
        # the IDENTICAL recurrence driver-side (same _init_registers
        # kernel, same element-wise max; max is max, so the register
        # tables are bit-identical).  The web-scale graphs stay on the
        # distributed rounds (gate = distinct-edge count).
        import ray.data as _rd

        ptbl = pa.concat_tables(
            list(
                pairs.iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            )
        ).combine_chunks() if n_pairs else pa.table(
            {
                "entity_id": pa.array([], type=pa.int64()),
                "subj": pa.array([], type=pa.int64()),
            }
        )
        recv = ptbl.column("entity_id").to_numpy(zero_copy_only=False)
        dest = ptbl.column("subj").to_numpy(zero_copy_only=False)
        node_ids = np.unique(np.concatenate([recv, dest])) if len(
            recv
        ) else np.array([], dtype=np.int64)
        regs0 = _init_registers(
            pa.table({"entity_id": pa.array(node_ids, type=pa.int64())}),
            p=p,
        )
        rmat = np.stack(
            [
                regs0.column(c).to_numpy(zero_copy_only=False)
                for c in reg_cols(p)
            ],
            axis=1,
        ).astype(np.int64) if len(node_ids) else np.zeros(
            (0, 1 << p), dtype=np.int64
        )
        ridx = np.searchsorted(node_ids, recv)
        didx = np.searchsorted(node_ids, dest)

        def as_ds(mat: np.ndarray):
            return _rd.from_arrow(
                pa.table(
                    {
                        "entity_id": pa.array(
                            node_ids, type=pa.int64()
                        ),
                        **{
                            c: pa.array(mat[:, j], type=pa.int64())
                            for j, c in enumerate(reg_cols(p))
                        },
                    }
                )
            )

        local_rounds = [as_ds(rmat)]
        for _ in range(iters):
            nxt = rmat.copy()
            if len(ridx):
                np.maximum.at(nxt, didx, rmat[ridx])
            rmat = nxt
            local_rounds.append(as_ds(rmat))
        return local_rounds
    num_partitions = _iter_partitions(n_pairs, num_partitions)

    def to_nodes(t: pa.Table) -> pa.Table:
        import pyarrow as _pa

        both = _pa.concat_arrays(
            [
                t.column("entity_id").combine_chunks(),
                t.column("subj").combine_chunks(),
            ]
        )
        return _pa.table({"entity_id": both.unique()})

    nodes = hash_grouped(
        pairs.map_batches(to_nodes, batch_format="pyarrow"),
        ["entity_id"],
        [],
        num_partitions=num_partitions,
    )
    regs = nodes.map_batches(
        _init_registers,
        fn_kwargs={"p": p},
        batch_format="pyarrow",
    ).materialize()

    cols_p = reg_cols(p)
    reg_schema = _reg_schema(p)
    aggs = [(c, "max") for c in cols_p]
    rename = {f"{c}_max": c for c in cols_p}

    def to_subj(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "subj" not in t.column_names:
            return _empty_regs(p)
        return pa.table(
            {
                "entity_id": t.column("subj"),
                **{c: t.column(c) for c in cols_p},
            }
        )

    rounds = [regs]
    for _ in range(iters):
        msgs = local_hash_join(
            pairs,
            regs,
            on=["entity_id"],
            left_schema=pa.schema(
                [("entity_id", pa.int64()), ("subj", pa.int64())]
            ),
            right_schema=reg_schema,
            num_partitions=num_partitions,
        ).map_batches(to_subj, batch_format="pyarrow")
        regs = hash_grouped(
            regs.union(msgs),
            ["entity_id"],
            aggs,
            rename=rename,
            num_partitions=num_partitions,
        ).materialize()
        rounds.append(regs)
    return rounds


def harmonic_centrality(
    edges,
    iters: int = 4,
    num_partitions: int | None = None,
    p: int = P_HB,
):
    """edges(subj_id, obj_id, …) → (entity_id, harmonic): estimated
    harmonic centrality ``H(v) = Σ_{u≠v} 1/d(u, v)`` truncated at
    ``iters`` hops — THE application the HyperBall paper was built for
    (geometric centralities on web graphs where per-node exact
    distances are hopeless).

    ``H(v) = Σ_h (|ball_in(v, h)| − |ball_in(v, h−1)|) / h`` over the
    incoming-reach balls, so the whole computation is the shared
    HyperBall loop run in the ``"in"`` direction plus one chain of
    per-round estimate joins at the end.  The accumulation is a FIXED
    left-to-right float expression ``(e1−e0)/1.0 + (e2−e1)/2.0 + …``
    replayed verbatim by the SQL twin, so the DOUBLE column
    hash-matches the oracle.
    """
    from ..shuffle import local_hash_join

    rounds = _round_tables(
        edges, iters, num_partitions, direction="in", p=p
    )
    ests = [
        r.map_batches(_estimate_batch, batch_format="pyarrow")
        for r in rounds
    ]

    def rename_est(h: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "entity_id": t.column("entity_id"),
                    f"e{h}": t.column("ball_est"),
                }
            )

        return fn

    joined = ests[0].map_batches(rename_est(0), batch_format="pyarrow")
    schema_cols = [("entity_id", pa.int64()), ("e0", pa.float64())]
    for h in range(1, iters + 1):
        joined = local_hash_join(
            joined,
            ests[h].map_batches(rename_est(h), batch_format="pyarrow"),
            on=["entity_id"],
            left_schema=pa.schema(schema_cols),
            right_schema=pa.schema(
                [("entity_id", pa.int64()), (f"e{h}", pa.float64())]
            ),
            num_partitions=num_partitions,
        )
        schema_cols.append((f"e{h}", pa.float64()))

    def accumulate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "e0" not in t.column_names:
            return pa.table(
                {
                    "entity_id": pa.array([], type=pa.int64()),
                    "harmonic": pa.array([], type=pa.float64()),
                }
            )
        e = [
            t.column(f"e{h}").to_numpy(zero_copy_only=False)
            for h in range(iters + 1)
        ]
        acc = (e[1] - e[0]) / 1.0
        for h in range(2, iters + 1):  # fixed order, as in the SQL
            acc = acc + (e[h] - e[h - 1]) / float(h)
        return pa.table(
            {
                "entity_id": t.column("entity_id"),
                "harmonic": pa.array(acc, type=pa.float64()),
            }
        )

    return joined.map_batches(accumulate, batch_format="pyarrow")


def _sql_round_ctes(
    edge_cte: str, iters: int, direction: str, p: int = P_HB
) -> str:
    """The shared WITH-clause body: register init + ``iters`` unrolled
    max-merge rounds (``g0`` … ``g{iters}``) in the given direction —
    parameterized by the same precision ``p`` as the engine (m = 2^p
    register columns, w = 64−p rank split)."""
    m = 1 << p
    w = 64 - p
    rest_mask = (1 << w) - 1
    reg_list = ", ".join(reg_cols(p))
    init_cases = ", ".join(
        f"CASE WHEN reg = {j} THEN rnk ELSE 0 END AS r{j}"
        for j in range(m)
    )
    read_col, emit_col = (
        ("obj_id", "subj_id") if direction == "out" else ("subj_id", "obj_id")
    )
    rounds = []
    for h in range(1, iters + 1):
        maxes = ", ".join(f"max(r{j})::BIGINT AS r{j}" for j in range(m))
        rounds.append(
            f"""g{h} AS MATERIALIZED (
          SELECT entity_id, {maxes} FROM (
            SELECT entity_id, {reg_list} FROM g{h - 1}
            UNION ALL
            SELECT e.{emit_col} AS entity_id, {reg_list}
            FROM e2 e JOIN g{h - 1} g ON g.entity_id = e.{read_col})
          GROUP BY entity_id)"""
        )
    rounds_sql = ",\n        ".join(rounds)
    return f"""{edge_cte},
        nodes AS MATERIALIZED (
          SELECT DISTINCT entity_id FROM (
            SELECT subj_id AS entity_id FROM e2
            UNION ALL SELECT obj_id FROM e2)),
        hv AS (
          SELECT entity_id,
                 ('0x' || substr(md5(CAST(entity_id AS VARCHAR)), 1, 16))
                   ::UBIGINT AS h
          FROM nodes),
        sr AS (
          SELECT entity_id, (h >> {w})::BIGINT AS reg,
                 (h & {rest_mask}::UBIGINT) AS rest
          FROM hv),
        g0 AS MATERIALIZED (
          SELECT entity_id, {init_cases} FROM (
            SELECT entity_id, reg,
                   CASE WHEN rest = 0 THEN {w + 1}
                        ELSE {w + 1} - length(bin(rest)) END AS rnk
            FROM sr)),
        {rounds_sql}"""


def _sql_est(src: str, out_col: str, p: int = P_HB) -> str:
    """One round table → the estimate expression (the engine's float op
    sequence, term for term, at precision ``p``)."""
    m = 1 << p
    pw_sum = " + ".join(f"pow(2.0, -r{j})" for j in range(m))
    v_sum = " + ".join(
        f"CASE WHEN r{j} = 0 THEN 1 ELSE 0 END" for j in range(m)
    )
    return f"""(
          SELECT entity_id,
                 CASE WHEN raw <= {2.5 * m!r} AND v > 0
                      THEN {float(m)!r} * ln({float(m)!r} / v)
                      ELSE raw END AS {out_col}
          FROM (SELECT entity_id,
                       {_alpha_m2(m)!r} / ({pw_sum}) AS raw,
                       ({v_sum}) AS v
                FROM {src}))"""


def sql_hyperball(edge_cte: str, iters: int = 4, p: int = P_HB) -> str:
    """DuckDB twin of :func:`hyperball`.  ``edge_cte`` must define a
    CTE named ``e2`` with DISTINCT (subj_id, obj_id) int64 columns (the
    caller's hashed edge derivation); this appends the register
    initialization and ``iters`` unrolled max-merge rounds, replaying
    the engine's estimate expression term for term at the same
    precision ``p``."""
    return f"""
        WITH {_sql_round_ctes(edge_cte, iters, "out", p=p)}
        SELECT entity_id, ball_est
        FROM {_sql_est(f"g{iters}", "ball_est", p=p)} fin
    """


def sql_harmonic(edge_cte: str, iters: int = 4, p: int = P_HB) -> str:
    """DuckDB twin of :func:`harmonic_centrality` — the "in"-direction
    rounds, one estimate CTE per round, and the identical fixed-order
    accumulation expression."""
    fins = ",\n        ".join(
        f"f{h} AS MATERIALIZED "
        f"(SELECT * FROM {_sql_est(f'g{h}', f'e{h}', p=p)})"
        for h in range(iters + 1)
    )
    joins = "\n        ".join(
        f"JOIN f{h} USING (entity_id)" for h in range(1, iters + 1)
    )
    acc = " + ".join(f"(e{h} - e{h - 1}) / {float(h)!r}" for h in range(1, iters + 1))
    return f"""
        WITH {_sql_round_ctes(edge_cte, iters, "in", p=p)},
        {fins}
        SELECT entity_id, {acc} AS harmonic
        FROM f0
        {joins}
    """


DIAM_Q = 0.9
DIAM_FP = 65536.0  # 2^16 fixed point for the order-free global sum


def effective_diameter(
    edges,
    iters: int = 4,
    q: float = DIAM_Q,
    num_partitions: int | None = None,
    p: int = P_HB,
):
    """edges → (h, nf, d_eff): the neighborhood function NF(h) = Σ_v
    |ball(v, h)| per round, plus the interpolated ``q``-effective
    diameter — THE summary statistic the HyperBall line of work was
    built to compute on web graphs ("90% of connected pairs are within
    d_eff hops").  ``d_eff = (h−1) + (q·NF(H) − NF(h−1)) /
    (NF(h) − NF(h−1))`` at the first round reaching ``q·NF(H)``.

    The global float sum would be order-nondeterministic, so each
    per-node estimate is quantized to 2⁻¹⁶ fixed point FIRST (a pure
    per-node function) and the int64 partials commute — the same
    determinism move as PageRank's fixed-point mass.  Driver state is
    ``iters + 1`` scalars.  The SQL twin replays the quantized sums and
    the one interpolation expression, so every column hash-matches."""
    rounds = _round_tables(edges, iters, num_partitions, p=p)

    def fp_batch(h: int):
        def fn(t: pa.Table) -> pa.Table:
            est = _estimate_batch(t)
            fp = np.floor(
                est.column("ball_est").to_numpy(zero_copy_only=False)
                * DIAM_FP
            ).astype(np.int64)
            return pa.table(
                {
                    "h": pa.array([h] * len(fp), type=pa.int64()),
                    "fp": pa.array(fp, type=pa.int64()),
                }
            )

        return fn

    # ONE job for all rounds: tag, union, single tiny grouped sum —
    # iters+1 separate .sum() jobs would pay driver latency each
    from ..shuffle import hash_grouped

    tagged = None
    for h, r in enumerate(rounds):
        piece = r.map_batches(fp_batch(h), batch_format="pyarrow")
        tagged = piece if tagged is None else tagged.union(piece)
    fps = [0] * len(rounds)
    if tagged is not None:
        for row in hash_grouped(
            tagged,
            ["h"],
            [("fp", "sum")],
            rename={"fp_sum": "fp"},
            num_partitions=1,
        ).take_all():
            fps[int(row["h"])] = int(row["fp"])
    nf = [f / DIAM_FP for f in fps]
    import ray.data

    if not nf or nf[-1] <= 0.0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "h": pa.array([], type=pa.int64()),
                    "nf": pa.array([], type=pa.float64()),
                    "d_eff": pa.array([], type=pa.float64()),
                }
            )
        )
    target = q * nf[-1]
    d_eff = 0.0
    for h in range(len(nf)):
        if nf[h] >= target:
            if h == 0:
                d_eff = 0.0
            else:
                d_eff = float(h - 1) + (target - nf[h - 1]) / (
                    nf[h] - nf[h - 1]
                )
            break
    return ray.data.from_arrow(
        pa.table(
            {
                "h": pa.array(range(len(nf)), type=pa.int64()),
                "nf": pa.array(nf, type=pa.float64()),
                "d_eff": pa.array([d_eff] * len(nf), type=pa.float64()),
            }
        )
    )


def sql_effective_diameter(
    edge_cte: str, iters: int = 4, q: float = DIAM_Q, p: int = P_HB
) -> str:
    """DuckDB twin of :func:`effective_diameter`: per-round estimate
    CTEs, the identical 2⁻¹⁶ quantized sums, and the one interpolation
    expression."""
    fins = ",\n        ".join(
        f"f{h} AS MATERIALIZED "
        f"(SELECT * FROM {_sql_est(f'g{h}', 'est', p=p)})"
        for h in range(iters + 1)
    )
    # cast each floor to BIGINT BEFORE the sum (mirroring the engine's
    # quantize-then-sum int64 reduce): summing DOUBLEs first loses
    # integer exactness once the partial sum passes 2^53
    nf_rows = "\n          UNION ALL ".join(
        f"SELECT {h}::BIGINT AS h, "
        f"sum(floor(est * {DIAM_FP!r})::BIGINT)::BIGINT AS fp FROM f{h}"
        for h in range(iters + 1)
    )
    return f"""
        WITH {_sql_round_ctes(edge_cte, iters, "out", p=p)},
        {fins},
        nfs AS ({nf_rows}),
        nf2 AS (SELECT h, fp::DOUBLE / {DIAM_FP!r} AS nf FROM nfs),
        tgt AS (SELECT {q!r} * nf AS t FROM nf2 WHERE h = {iters}),
        cand AS (
          SELECT n.h, n.nf, p.nf AS nf_prev
          FROM nf2 n LEFT JOIN nf2 p ON p.h = n.h - 1, tgt
          WHERE n.nf >= tgt.t
          ORDER BY n.h LIMIT 1),
        deff AS (
          SELECT CASE WHEN c.h = 0 THEN 0.0
                      ELSE (c.h - 1)::DOUBLE
                           + (tgt.t - c.nf_prev) / (c.nf - c.nf_prev)
                 END AS d_eff
          FROM cand c, tgt)
        SELECT n.h, n.nf, d.d_eff
        FROM nf2 n, deff d
    """
