"""Hash-partitioned grouped aggregation: the high-cardinality fast path.

Ray's ``groupby().aggregate()`` iterates groups row-by-row in Python on
both sides of the exchange — measured 16-32 s for a Sum over ~1.25M
distinct pair keys at 32 CPUs (sort- and hash-shuffle strategies alike),
because per-group Python dominates at high key cardinality.

:func:`hash_grouped` replaces that with a plan whose per-row work is all
C++: append a ``part`` column = stable mix of the (numeric) key columns
mod N (vectorized numpy), exchange on that LOW-cardinality int key (N ≈
CPU count, so the shuffle machinery handles N groups, not millions), and
run ONE vectorized ``pyarrow.Table.group_by`` per partition.  Correct
because the partition id is a pure function of the group key, so every
row of a group lands in exactly one partition and the per-partition
group_by is global.  Measured 1.1 s on the 1.25M-pair input — 14× faster
than the native aggregate — with no change to Ray's global shuffle
strategy (keyed ``repartition`` would require ``HASH_SHUFFLE``
session-wide, which slows every small native aggregate by spinning an
aggregator-actor pool per operator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# 64-bit odd multipliers (splitmix64 / xxhash finalizer constants) — mix
# patterned ids (sequential doc ids, md5-derived entity ids) uniformly.
_MIX = (
    np.int64(-7046029254386353131),  # 0x9E3779B97F4A7C15 as signed
    np.int64(-4417276706812531889),  # 0xC2B2AE3D27D4EB4F as signed
    np.int64(2870177450012600261),   # 0x27D4EB2F165667C5
)


def default_partitions() -> int:
    """One partition per CPU: full parallelism for the per-partition
    combine without flooding small sessions with tiny groups."""
    import ray

    if ray.is_initialized():
        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    return 8


def sized_partitions(n_rows: int, num_partitions: int | None = None) -> int:
    """Partition count sized to the data: explicit wins; else ~200k rows
    per partition, capped at the session default.  Every exchange in
    this module is value-identical at any partition count (hash routing
    only moves rows; grouped integer aggregates commute), so this is
    purely an execution-plan choice — the same rule as
    ``graphops._iter_partitions``, exposed for one-shot operators whose
    input size is known (a parquet-count or a just-materialized
    dataset).  On tiny inputs the n=1 fast path skips the sort-based
    exchange entirely (~2 s fixed latency per pass at 32 CPUs)."""
    if num_partitions is not None:
        return num_partitions
    return max(1, min(default_partitions(), (n_rows + 199_999) // 200_000))


def hash_partitioned(
    ds,
    hash_cols: list[str],
    fn,
    num_partitions: int | None = None,
    compact: bool = True,
):
    """Run ``fn`` once per hash partition of ``ds``.

    Appends ``part`` = stable mix of the (numeric) ``hash_cols`` mod N,
    exchanges on that low-cardinality key, and calls ``fn(block)`` with
    each partition's full rows (``part`` already dropped).  Any key that
    is a function of ``hash_cols`` is wholly contained in one block, so a
    vectorized per-block group computation is global — the building block
    under :func:`hash_grouped` and the canonicalization stage.

    ``compact`` (default on) merges the output into ``num_partitions``
    clean blocks via ``repartition(n)``.  Ray's sort-based ``map_groups``
    machinery emits many EMPTY blocks alongside the real per-partition
    outputs, and empty blocks are schema-less zero-column tables that no
    later ``map_batches`` can repair (Ray skips the UDF on empty blocks
    entirely) — every downstream sort/exchange then takes a mixed-schema
    slow path ("RefBundle with a different schema" warnings; measured
    10.8 s → 0.6 s for an 11k-row join fed by a 200-block map_groups
    output, and a 446 s → 9 s chained graph pass at bench scale) and
    Ray's native join aborts outright when a join partition lands only
    those.  Compaction choice is deliberate: the barrier
    ``repartition(n)`` costs ~1 s of fixed latency per exchange on tiny
    inputs but stays PARALLEL at scale, whereas
    ``repartition(target_num_rows_per_block=…)`` is cheap on tiny inputs
    and serializes the merge at scale (measured: a full-corpus bench
    that runs in minutes under barrier compaction did not finish in 10
    under streaming).  A distributed engine takes the scale-correct
    branch."""
    n_parts = num_partitions or default_partitions()

    if n_parts == 1:
        # Single-partition fast path: the whole dataset IS the one hash
        # partition, so the sort-based ``groupby.map_groups`` exchange
        # (sample + sort + reduce waves) and the compaction barrier are
        # pure overhead — ``repartition(1)`` already yields one clean
        # block that ``fn`` consumes whole.  This is the plan the
        # size-adaptive iterative loops (``graphops._iter_partitions``)
        # pick on toy graphs, where the map_groups machinery dominated
        # wall time (~5 s/round for a 70-node PageRank iteration).
        return ds.repartition(1).map_batches(
            fn, batch_format="pyarrow", batch_size=None
        )

    def add_part(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("part", pa.array([], type=pa.int32()))
        with np.errstate(over="ignore"):
            acc = np.zeros(len(batch), dtype=np.int64)
            for i, c in enumerate(hash_cols):
                col = batch.column(c).to_numpy(zero_copy_only=False)
                acc = acc * _MIX[i % 3] + col.astype(np.int64) * _MIX[(i + 1) % 3]
        part = ((acc % n_parts) + n_parts) % n_parts
        return batch.append_column(
            "part", pa.array(part.astype(np.int32), type=pa.int32())
        )

    def run(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns(["part"]))

    parted = ds.map_batches(add_part, batch_format="pyarrow")
    grouped = parted.groupby("part").map_groups(run, batch_format="pyarrow")
    return grouped.repartition(n_parts) if compact else grouped


def local_hash_join(
    left,
    right,
    on: list[str],
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    how: str = "inner",
    num_partitions: int | None = None,
):
    """Join two Datasets without Ray's ``Dataset.join`` operator.

    Pads both sides to the union schema (missing columns all-null),
    tags rows with ``__side``, unions, hash-exchanges ONCE on the
    (numeric) key columns, and runs pyarrow's C++ hash join per
    partition.  Rationale: each Ray join operator spins its own
    aggregator-actor pool reserving CPU slivers, so several joins alive
    concurrently in one streaming plan can deadlock a small session
    (measured at 4 CPUs) and add actor churn at scale; this plan moves
    the same bytes through the existing exchange machinery with zero
    extra actors, and a self-contained partition needs no cross-worker
    probe side.

    ``how``: ``"inner"`` / ``"left_outer"`` (pyarrow join per
    partition), or ``"semi"`` / ``"anti"`` (vectorized ``is_in``
    membership filter on a single key — the right side contributes
    only its key column, no payload).

    Schemas are passed explicitly so the (lazy) inputs need not
    execute to discover them.  Key columns must be numeric — digest
    string keys to int64 first (see ``exact_dedup``'s ``fp_key``).
    """
    on = list(on)
    if how in ("semi", "anti") and len(on) != 1:
        raise ValueError("semi/anti joins support a single key column")
    left_names = [f.name for f in left_schema]
    right_names = [f.name for f in right_schema]
    right_extra = [n for n in right_names if n not in on]
    full = pa.schema(
        list(left_schema) + [right_schema.field(n) for n in right_extra]
    )

    def pad(tag: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {}
            for f in full:
                if f.name in batch.column_names:
                    cols[f.name] = batch.column(f.name).cast(f.type)
                else:
                    cols[f.name] = pa.nulls(len(batch), f.type)
            cols["__side"] = pa.array(
                np.full(len(batch), tag, dtype=np.int8), type=pa.int8()
            )
            return pa.table(cols)

        return fn

    both = left.map_batches(pad(0), batch_format="pyarrow").union(
        right.map_batches(pad(1), batch_format="pyarrow")
    )

    def join_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = t.column("__side")
        lt = t.filter(pc.equal(side, 0)).select(left_names)
        rt = t.filter(pc.equal(side, 1)).select(right_names)
        if how in ("semi", "anti"):
            mask = pc.is_in(
                lt.column(on[0]),
                value_set=rt.column(on[0]).combine_chunks(),
            )
            if how == "anti":
                mask = pc.invert(mask)
            return lt.filter(mask)
        jt = "inner" if how == "inner" else "left outer"
        return lt.join(rt, keys=on, join_type=jt)

    return hash_partitioned(both, on, join_part, num_partitions=num_partitions)


def hash_grouped(
    ds,
    keys: list[str],
    aggs: list[tuple],
    rename: dict[str, str] | None = None,
    hash_cols: list[str] | None = None,
    num_partitions: int | None = None,
    checked: bool = False,
):
    """Group ``ds`` by ``keys`` applying Arrow aggregate specs ``aggs``.

    ``aggs`` are pyarrow ``(column, fn)`` specs (fn in {"sum", "min",
    "max", "count", "count_all", ...}); an empty list means DISTINCT
    keys.  Arrow names outputs ``{column}_{fn}``; remap via ``rename``.
    ``hash_cols`` (default: ``keys``) are the numeric columns mixed into
    the partition id — they must be a function of the group key (a
    subset, or a precomputed int64 digest of a string key).

    ``checked=True`` makes int64 ``sum`` aggregates OVERFLOW-LOUD: the
    summed column is widened to ``decimal128(38, 0)`` before the group
    aggregate (Arrow's int64 sum kernel wraps silently) and the result
    safe-cast back to int64, which raises ``ArrowInvalid`` the moment a
    group total leaves the int64 range instead of wrapping.  Used by the
    fixed-point graph reductions (betweenness σ/δ) whose counts can grow
    exponentially with depth × degree.
    """
    rename = rename or {}
    checked_cols = (
        {col for col, fn in aggs if fn == "sum" and isinstance(col, str)}
        if checked
        else set()
    )

    def combine(group: pa.Table) -> pa.Table:
        for c in checked_cols:
            if pa.types.is_integer(group.schema.field(c).type):
                group = group.set_column(
                    group.column_names.index(c),
                    c,
                    group.column(c).cast(pa.decimal128(38, 0)),
                )
        out = group.group_by(keys).aggregate(aggs)
        cols = {k: out.column(k) for k in keys}
        for col, fn in aggs:
            # pyarrow names "([], 'count_all')" outputs plain "count_all"
            arrow_name = f"{col}_{fn}" if isinstance(col, str) else fn
            target = rename.get(arrow_name, arrow_name)
            arr = out.column(arrow_name)
            if fn in ("count", "count_all"):
                arr = arr.cast(pa.int64())
            elif col in checked_cols and pa.types.is_decimal(arr.type):
                # safe cast: ArrowInvalid on any group sum outside int64
                arr = arr.cast(pa.int64())
            cols[target] = arr
        return pa.table(cols)

    return hash_partitioned(
        ds, hash_cols or keys, combine, num_partitions=num_partitions
    )


def salted_grouped(
    ds,
    keys: list[str],
    aggs: list[tuple],
    hot: list,
    n_salts: int = 8,
    rename: dict[str, str] | None = None,
    hash_cols: list[str] | None = None,
    num_partitions: int | None = None,
):
    """Two-stage skew-split aggregate: :func:`hash_grouped` with hot keys
    spread over ``n_salts`` sub-groups first, then re-merged.

    The explicit salted shuffle for skewed hot keys (head entities, stop
    tokens, head URLs): rows whose FIRST key column value is in ``hot``
    get a salt = row-position mod ``n_salts`` appended to the group key
    for phase 1, so a hot key's rows split across ``n_salts`` partitions
    instead of landing on one; phase 2 re-merges the ≤ ``n_salts``
    partial rows per hot key (cold keys carry salt 0 — their phase-2
    merge is a 1-row no-op).  Requires re-mergeable aggregate fns
    (``sum`` / ``min`` / ``max`` — a count must arrive pre-combined as a
    summable column).  The result is EXACTLY :func:`hash_grouped`'s for
    any ``hot`` set — only the physical fan-in changes — so the hot set
    may come from an approximate detector (``functions.sketch.hot_keys``)
    with no correctness risk.

    When every upstream block is already map-side combined (one row per
    distinct-in-block key), a key's phase-1 fan-in is bounded by the
    block count and salting buys little below ~10^5 blocks; it is the
    right tool when partials are per-row (no in-block repetition) or the
    block count itself is huge.

    ``hot`` ships by closure — it is small by definition (keys above a
    frequency floor; bound its size at detection).
    """
    if not 1 <= n_salts <= 10_000:
        raise ValueError(f"n_salts={n_salts} outside sane range")
    for _, fn in aggs:
        if fn not in ("sum", "min", "max"):
            raise ValueError(
                f"aggregate {fn!r} is not re-mergeable across salts"
            )
    hot_set = set(hot)
    hot_col = keys[0]

    def add_salt(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(
                "__salt", pa.array([], type=pa.int64())
            )
        import pyarrow.compute as pc

        mask = pc.is_in(
            batch.column(hot_col), value_set=pa.array(sorted(hot_set))
        ).to_numpy(zero_copy_only=False)
        salt = np.where(mask, np.arange(len(batch)) % n_salts, 0)
        return batch.append_column(
            "__salt", pa.array(salt, type=pa.int64())
        )

    # hash cols that are not group keys must survive phase 1 for phase
    # 2's exchange; they are functions of the key, so adding them to the
    # phase-1 group key changes nothing semantically
    base_hash = hash_cols or keys
    extra_hash = [c for c in base_hash if c not in keys]
    # phase 1 keeps Arrow's {col}_{fn} names (renaming them back to {col}
    # would collide when one column carries several aggregates); phase 2
    # re-aggregates those columns and maps {col}_{fn}_{fn} to the caller's
    # final names
    phase1 = hash_grouped(
        ds.map_batches(add_salt, batch_format="pyarrow"),
        keys + extra_hash + ["__salt"],
        aggs,
        hash_cols=base_hash + ["__salt"],
        num_partitions=num_partitions,
    )
    rename = rename or {}
    aggs2 = [(f"{c}_{fn}", fn) for c, fn in aggs]
    rename2 = {
        f"{c}_{fn}_{fn}": rename.get(f"{c}_{fn}", f"{c}_{fn}")
        for c, fn in aggs
    }
    merged = hash_grouped(
        phase1.drop_columns(["__salt"]),
        keys + extra_hash,
        aggs2,
        rename=rename2,
        hash_cols=base_hash,
        num_partitions=num_partitions,
    )
    if extra_hash:
        merged = merged.drop_columns(extra_hash)
    return merged
