"""Bulk-synchronous (Pregel-style) iterative graph analytics on a Ray
actor pool — PageRank, single-source BFS, connected components and
label-propagation communities over one shared sharded graph handle.

Why this exists alongside :func:`functions.graphops.pagerank`: the
Ray-Data formulation re-exchanges the STATIC edge list every round — each
iteration pays a pad+union sort exchange into ``local_hash_join``, the
join-output compaction barrier, a second exchange for the contribution
sum, and a driver-synced dangling pass.  At 5M edges that is ~3
edge-sized all-to-alls per round whose fixed latency GROWS with
parallelism while the per-round compute shrinks; measured on the 5.05M
edge web-outlink graph, 8 CPUs ran *slower* than 2 (30.9 s → 38.5 s,
2→8 scaling efficiency 0.20).  Iterative graph analytics is the one
workload in this engine whose semantics Ray Data's dataflow genuinely
cannot express efficiently — static state must stay put while a small
frontier circulates — so this module drops to raw Ray actors, exactly
the carve-out the design doc reserves for them.

Plan (classic Pregel with combiners, all structure precomputed):

- **Partition once.**  Edges are hash-partitioned by ``h(src)`` and the
  node/degree table by ``h(node)`` (same mix), through one Ray Data
  exchange at setup; each of P actors loads its shard and never moves
  it again.  Per-actor layout is numpy: nodes sorted by id, edges
  lex-sorted by (dst-partition, dst), ``src → local node index`` and
  per-distinct-dst ``reduceat`` boundaries resolved at load time.
- **Static message structure.**  Which distinct dsts flow from actor i
  to actor j is a function of the edges only, so the dst id vectors are
  exchanged ONCE at setup; after that a round's i→j message is a bare
  int64 value vector (map-side combined: one entry per distinct dst in
  the shard, not per edge).
- **Per round**: one scatter wave (gather ranks by precomputed index,
  one int64 multiply/divide, one ``np.add.reduceat``, P slices) and one
  gather wave (concat value vectors in fixed actor order, ``reduceat``
  over precomputed sorted-target boundaries, damping update) — two actor
  round-trips, zero Ray Data jobs, zero sorts, zero repartitions.  The
  only driver state is the P dangling-mass scalars.

Determinism: identical fixed-point arithmetic to
:func:`graphops.pagerank` (int64 mass in 2⁻⁴² units, ``(rank*w)//w_out``
contributions, damping as ``(dnum*mass)//1000``), and integer addition
commutes — so the result is BIT-IDENTICAL to the Ray-Data operator on
any partition count, verified by ``tests/test_graphbsp.py`` and covered
by the same DuckDB fixed-point oracle (``kg_pagerank_bsp``).

Scale notes: per-round bytes on the wire are Σᵢⱼ|distinct dst(i→j)| × 8
— bounded by min(|E|, P·|V|) and in practice far below |E| after the
combiner; per-actor heap is O(|E|/P + |V|/P).  On a real cluster the
actors pin the edge shards node-local and only the combined value
vectors cross the network, which is the standard distributed-PageRank
traffic bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..shuffle import _MIX
from .graphops import PR_SCALE, pc_divide_exact


def _part_of(ids: np.ndarray, n_parts: int) -> np.ndarray:
    """Stable partition id for int64 ids — the same single-column mix
    ``shuffle.hash_partitioned`` appends, so BSP shards line up with the
    engine's other exchanges."""
    with np.errstate(over="ignore"):
        acc = ids.astype(np.int64) * _MIX[1]
    return (((acc % n_parts) + n_parts) % n_parts).astype(np.int64)


class _PRShard:
    """One BSP worker: owns the nodes with ``h(node) == part`` and the
    edges with ``h(src) == part`` (so every edge's source rank is a
    local array lookup)."""

    def __init__(self, part: int, n_parts: int):
        self.part = part
        self.n_parts = n_parts

    def load(self, node_refs, edge_refs, init_fp: int) -> int:
        import ray

        nodes = [t for t in ray.get(list(node_refs)) if t.num_rows]
        edges = [t for t in ray.get(list(edge_refs)) if t.num_rows]
        if nodes:
            nt = pa.concat_tables(nodes)
            ids = nt.column("entity_id").to_numpy(zero_copy_only=False)
            wout = nt.column("w_out").to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            self.ids = ids[order].astype(np.int64)
            self.w_out = wout[order].astype(np.int64)
        else:
            self.ids = np.empty(0, dtype=np.int64)
            self.w_out = np.empty(0, dtype=np.int64)
        self.rank_fp = np.full(len(self.ids), init_fp, dtype=np.int64)

        if edges:
            et = pa.concat_tables(edges)
            src = et.column("src").to_numpy(zero_copy_only=False)
            dst = et.column("dst").to_numpy(zero_copy_only=False)
            w = et.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
            dpart = _part_of(dst, self.n_parts)
            order = np.lexsort((dst, dpart))
            src, dst, w, dpart = (
                src[order], dst[order], w[order], dpart[order]
            )
            # every edge source is home here by construction
            self.src_idx = np.searchsorted(self.ids, src)
            self.w = w
            # distinct-dst run boundaries (dst equal ⇒ dpart equal)
            starts = np.flatnonzero(
                np.r_[True, dst[1:] != dst[:-1]]
            ).astype(np.intp)
            self.starts = starts
            self.msg_dst = dst[starts]
            msg_part = dpart[starts]
            # slice bounds of each target partition's message
            self.jbounds = np.searchsorted(
                msg_part, np.arange(self.n_parts + 1)
            )
        else:
            self.src_idx = np.empty(0, dtype=np.intp)
            self.w = np.empty(0, dtype=np.int64)
            self.starts = np.empty(0, dtype=np.intp)
            self.msg_dst = np.empty(0, dtype=np.int64)
            self.jbounds = np.zeros(self.n_parts + 1, dtype=np.int64)
        return len(self.ids)

    def reset(self, init_fp: int, seeds=None) -> None:
        """Re-initialize the rank vector — lets one sharded handle run
        many independent PageRank invocations (different iteration
        counts / damping) without re-paying the partition exchange.
        ``seeds`` (a small id list) switches to personalized mode:
        initial mass, teleport, and dangling share apply only to the
        seed-owned rows (mask stored per shard for ``gather``)."""
        if seeds is None:
            self.seed_mask = None
            self.rank_fp = np.full(len(self.ids), init_fp, dtype=np.int64)
        else:
            self.seed_mask = np.isin(
                self.ids, np.asarray(sorted(seeds), dtype=np.int64)
            )
            self.rank_fp = np.where(
                self.seed_mask, init_fp, 0
            ).astype(np.int64)

    def count_present(self, seeds) -> int:
        """How many of ``seeds`` are nodes homed on this shard.  Shards
        partition the node set disjointly, so summing across actors
        counts the seeds that exist in the graph."""
        uniq = np.unique(np.asarray(list(seeds), dtype=np.int64))
        return int(np.isin(uniq, self.ids).sum())

    def structure(self):
        """The static dst-id vector of every outgoing message — shipped
        once; later rounds send value vectors only."""
        return [
            self.msg_dst[self.jbounds[j]: self.jbounds[j + 1]]
            for j in range(self.n_parts)
        ]

    def gather_structure(self, *dst_arrays) -> None:
        """Pre-resolve incoming dsts (fixed actor order) to local node
        indices and the sorted-run boundaries one reduceat per round
        needs."""
        arrs: list[np.ndarray] = []
        for a in dst_arrays:
            # at n_parts == 1, num_returns=1 ships structure()'s whole
            # list as one object — flatten it
            if isinstance(a, list):
                arrs.extend(np.asarray(x) for x in a)
            else:
                arrs.append(np.asarray(a))
        all_dst = (
            np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
        )
        idx = np.searchsorted(self.ids, all_dst).astype(np.intp)
        # position-addressed view for sparse-frontier ops (BFS): local
        # node index of the p-th slot of sender i's static message is
        # g_idx[g_off[i] + p]
        self.g_idx = idx
        self.g_off = np.concatenate(
            ([0], np.cumsum([len(a) for a in arrs]))
        ).astype(np.intp)
        order = np.argsort(idx, kind="stable")
        self.g_order = order
        sidx = idx[order]
        gstarts = np.flatnonzero(
            np.r_[True, sidx[1:] != sidx[:-1]]
        ).astype(np.intp)
        self.g_starts = gstarts
        self.g_target = sidx[gstarts] if len(sidx) else sidx

    def scatter(self):
        """One round's outgoing combined contributions + this shard's
        dangling mass (returned last, ``num_returns = P + 1``)."""
        r = self.rank_fp[self.src_idx]
        if len(r) and int(r.max()) * int(self.w.max()) >= 2**62:
            raise OverflowError(
                "pagerank fixed-point product would overflow int64; "
                "normalize edge weights first"
            )
        c = (r * self.w) // np.maximum(self.w_out[self.src_idx], 1)
        sums = (
            np.add.reduceat(c, self.starts)
            if len(self.starts)
            else np.empty(0, dtype=np.int64)
        )
        dangling = int(self.rank_fp[self.w_out == 0].sum())
        return [
            sums[self.jbounds[j]: self.jbounds[j + 1]]
            for j in range(self.n_parts)
        ] + [dangling]

    def gather(self, base_fp: int, dnum: int, dang_share: int, *values):
        """Apply one round's incoming contributions (same fixed actor
        order as ``gather_structure``) and the damping update."""
        c_node = np.zeros(len(self.ids), dtype=np.int64)
        if values:
            all_c = np.concatenate([np.asarray(v) for v in values])
            if len(all_c):
                sc = all_c[self.g_order]
                c_node[self.g_target] = np.add.reduceat(sc, self.g_starts)
        if getattr(self, "seed_mask", None) is None:
            self.rank_fp = base_fp + (dnum * (c_node + dang_share)) // 1000
        else:
            self.rank_fp = np.where(self.seed_mask, base_fp, 0) + (
                dnum * (c_node + np.where(self.seed_mask, dang_share, 0))
            ) // 1000
        return None

    def result(self) -> pa.Table:
        return pa.table(
            {
                "entity_id": pa.array(self.ids, type=pa.int64()),
                "rank_fp": pa.array(self.rank_fp, type=pa.int64()),
            }
        )

    # -- BFS over the same shards (frontier messages are POSITIONS into
    #    the static dst structure, so a round ships only the newly
    #    reached slots, not a full value vector) ------------------------

    def bfs_reset(self, source: int) -> int:
        """dist ← -1 everywhere, 0 at the seed; returns whether the seed
        is home on this shard (driver checks Σ == 1)."""
        self.dist = np.full(len(self.ids), -1, dtype=np.int64)
        pos = int(np.searchsorted(self.ids, source))
        hit = pos < len(self.ids) and int(self.ids[pos]) == source
        if hit:
            self.dist[pos] = 0
        return int(hit)

    def bfs_scatter(self, hop: int):
        """Positions (per target shard, relative to the static i→j dst
        slice) whose dst is reached from this round's frontier."""
        if len(self.starts):
            active_edge = self.dist[self.src_idx] == hop - 1
            run_active = np.logical_or.reduceat(active_edge, self.starts)
        else:
            run_active = np.empty(0, dtype=bool)
        return [
            np.flatnonzero(
                run_active[self.jbounds[j]: self.jbounds[j + 1]]
            ).astype(np.int64)
            for j in range(self.n_parts)
        ]

    def bfs_gather(self, hop: int, *pos_arrays) -> int:
        """Mark newly reached home nodes at distance ``hop``; returns the
        count (driver stops when the global sum is 0)."""
        arrs: list[np.ndarray] = []
        for a in pos_arrays:
            if isinstance(a, list):  # n_parts == 1 flatten, as above
                arrs.extend(np.asarray(x) for x in a)
            else:
                arrs.append(np.asarray(a))
        if not arrs:
            return 0
        idxs = [
            self.g_idx[self.g_off[i] + a.astype(np.intp)]
            for i, a in enumerate(arrs)
            if len(a)
        ]
        if not idxs:
            return 0
        cand = np.unique(np.concatenate(idxs))
        new = cand[self.dist[cand] == -1]
        self.dist[new] = hop
        return int(len(new))

    def bfs_result(self) -> pa.Table:
        keep = self.dist >= 0
        return pa.table(
            {
                "entity_id": pa.array(self.ids[keep], type=pa.int64()),
                "hop": pa.array(self.dist[keep], type=pa.int64()),
            }
        )

    # -- min-label fixed points over the same shards: connected
    #    components (min combiner, delta frontier) and synchronous label
    #    propagation (vote-count combiner).  Both assume the handle was
    #    built over a DIRECTION-DOUBLED edge table (see the module-level
    #    one-shots) so information flows both ways. --------------------

    def labels_reset(self) -> None:
        """label ← own id; everyone is frontier-active for round 1
        (matching the dataflow round 1, where every node's label
        propagates)."""
        self.label = self.ids.copy()
        self.cc_active = np.ones(len(self.ids), dtype=bool)

    def cc_scatter(self):
        """Delta messages: (position-in-static-structure, label) pairs
        for the runs touched by a last-round-changed source, min-combined
        per distinct dst.  A node whose label did not change last round
        resends nothing — its value already lower-bounds every
        neighbor — so per-round traffic is frontier-sized, yet the
        per-round label states are IDENTICAL to the full-resend (and
        dataflow) formulation: min is idempotent and labels only
        decrease."""
        if not len(self.starts):
            return [
                (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
                for _ in range(self.n_parts)
            ]
        active_edge = self.cc_active[self.src_idx]
        lane = np.where(
            active_edge,
            self.label[self.src_idx],
            np.int64(np.iinfo(np.int64).max),
        )
        run_min = np.minimum.reduceat(lane, self.starts)
        run_active = np.logical_or.reduceat(active_edge, self.starts)
        out = []
        for j in range(self.n_parts):
            lo, hi = self.jbounds[j], self.jbounds[j + 1]
            pos = np.flatnonzero(run_active[lo:hi]).astype(np.int64)
            out.append((pos, run_min[lo:hi][pos]))
        return out

    def cc_gather(self, *msgs) -> int:
        """min(own, incoming) per home node; returns how many home
        labels decreased (the driver stops at a global 0)."""
        arrs: list[tuple] = []
        for a in msgs:
            if isinstance(a, list):  # n_parts == 1 flatten, as in bfs
                arrs.extend(a)
            else:
                arrs.append(a)
        idx_parts, val_parts = [], []
        for i, (pos, val) in enumerate(arrs):
            if len(pos):
                idx_parts.append(
                    self.g_idx[self.g_off[i] + pos.astype(np.intp)]
                )
                val_parts.append(val)
        self.cc_active[:] = False
        if not idx_parts:
            return 0
        idx = np.concatenate(idx_parts)
        val = np.concatenate(val_parts)
        order = np.argsort(idx, kind="stable")
        idx, val = idx[order], val[order]
        starts = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
        tgt = idx[starts]
        mins = np.minimum.reduceat(val, starts)
        better = mins < self.label[tgt]
        tgt, mins = tgt[better], mins[better]
        self.label[tgt] = mins
        self.cc_active[tgt] = True
        return int(len(tgt))

    def _lp_run_id(self) -> np.ndarray:
        """Edge → distinct-dst run index (cached; the structure is
        static)."""
        rid = getattr(self, "_lp_rid", None)
        if rid is None:
            lengths = np.diff(np.r_[self.starts, len(self.w)])
            rid = np.repeat(
                np.arange(len(self.starts), dtype=np.int64), lengths
            )
            self._lp_rid = rid
        return rid

    def lp_scatter(self):
        """One round of votes, map-side combined: per target shard a
        (position, label, count) triple — one entry per distinct
        (dst, incoming label), never per edge."""
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
        if not len(self.starts):
            return [empty for _ in range(self.n_parts)]
        lab = self.label[self.src_idx]
        rid = self._lp_run_id()
        order = np.lexsort((lab, rid))
        r, l = rid[order], lab[order]
        firsts = np.flatnonzero(
            np.r_[True, (r[1:] != r[:-1]) | (l[1:] != l[:-1])]
        )
        counts = np.diff(np.r_[firsts, len(r)]).astype(np.int64)
        slots, labs = r[firsts], l[firsts]
        pb = np.searchsorted(slots, self.jbounds)
        return [
            (
                slots[pb[j]: pb[j + 1]] - self.jbounds[j],
                labs[pb[j]: pb[j + 1]],
                counts[pb[j]: pb[j + 1]],
            )
            for j in range(self.n_parts)
        ]

    def lp_gather(self, *msgs) -> int:
        """Adopt the most frequent label among incoming votes plus one
        self-vote, ties to the smallest label — exactly
        :func:`graphops.label_propagation`'s ``vote_argmax`` fold.
        Returns the number of home labels that changed."""
        arrs: list[tuple] = []
        for a in msgs:
            if isinstance(a, list):  # n_parts == 1 flatten
                arrs.extend(a)
            else:
                arrs.append(a)
        n = len(self.ids)
        idx_parts = [np.arange(n, dtype=np.int64)]
        lab_parts = [self.label]
        cnt_parts = [np.ones(n, dtype=np.int64)]
        for i, (pos, lab, cnt) in enumerate(arrs):
            if len(pos):
                idx_parts.append(
                    self.g_idx[self.g_off[i] + pos.astype(np.intp)].astype(
                        np.int64
                    )
                )
                lab_parts.append(lab)
                cnt_parts.append(cnt)
        idx = np.concatenate(idx_parts)
        if len(idx) == 0:  # shard owns no nodes (more shards than nodes)
            return 0
        lab = np.concatenate(lab_parts)
        cnt = np.concatenate(cnt_parts)
        order = np.lexsort((lab, idx))
        idx, lab, cnt = idx[order], lab[order], cnt[order]
        starts = np.flatnonzero(
            np.r_[True, (idx[1:] != idx[:-1]) | (lab[1:] != lab[:-1])]
        )
        i2, l2 = idx[starts], lab[starts]
        c2 = np.add.reduceat(cnt, starts)
        # per node: count desc, then label asc — lexsort's LAST key is
        # primary, i2 is already grouped
        o2 = np.lexsort((l2, -c2, i2))
        i3, l3 = i2[o2], l2[o2]
        first = np.flatnonzero(np.r_[True, i3[1:] != i3[:-1]])
        tgt, new = i3[first], l3[first]
        changed = int((new != self.label[tgt]).sum())
        self.label[tgt] = new
        return changed

    def labels_result(self, id_name: str, label_name: str) -> pa.Table:
        return pa.table(
            {
                id_name: pa.array(self.ids, type=pa.int64()),
                label_name: pa.array(self.label, type=pa.int64()),
            }
        )

    # -- k-core peeling over the same shards (doubled distinct
    #    undirected edges, like label_prop): aliveness of a home node is
    #    decided where its degree lives; a death is shipped as the slot
    #    POSITIONS it occupies in each neighbor shard's static message
    #    structure — frontier-sized traffic, like BFS/CC. -------------

    def kc_reset(self, k: int) -> int:
        """All alive; round-1 peel over full degrees.  Returns this
        shard's new-death count."""
        n = len(self.ids)
        self.kc_k = int(k)
        self.kc_alive = np.ones(n, dtype=bool)
        self.kc_run_alive = np.ones(len(self.msg_dst), dtype=bool)
        deg = np.bincount(self.src_idx, minlength=n).astype(np.int64)
        self.kc_deg = deg
        new_dead = deg < self.kc_k
        self.kc_alive[new_dead] = False
        self.kc_new_dead = new_dead
        return int(new_dead.sum())

    def kc_scatter(self):
        """Per SENDER shard i: the positions in i's static message
        structure whose target home node died last round (resolved
        locally from the incoming-structure index — no lookup crosses
        the wire)."""
        return [
            np.flatnonzero(
                self.kc_new_dead[
                    self.g_idx[self.g_off[i]: self.g_off[i + 1]]
                ]
            ).astype(np.int64)
            for i in range(self.n_parts)
        ]

    def _kc_mark_and_degree(self, msgs) -> np.ndarray:
        arrs: list[np.ndarray] = []
        for a in msgs:
            if isinstance(a, list):  # n_parts == 1 flatten
                arrs.extend(np.asarray(x) for x in a)
            else:
                arrs.append(np.asarray(a))
        for j, pos in enumerate(arrs):
            if len(pos):
                self.kc_run_alive[self.jbounds[j] + pos] = False
        n = len(self.ids)
        if len(self.starts):
            deg = np.bincount(
                self.src_idx,
                weights=self.kc_run_alive[self._lp_run_id()],
                minlength=n,
            ).astype(np.int64)
        else:
            deg = np.zeros(n, dtype=np.int64)
        return deg

    def kc_apply(self, *msgs) -> int:
        """Mark dead runs, recompute alive-edge degrees, peel.  Returns
        this shard's new-death count (driver stops at a global 0)."""
        deg = self._kc_mark_and_degree(msgs)
        self.kc_deg = deg
        new_dead = self.kc_alive & (deg < self.kc_k)
        self.kc_alive[new_dead] = False
        self.kc_new_dead = new_dead
        return int(new_dead.sum())

    def kc_finalize(self, *msgs) -> None:
        """Propagate the LAST round's deaths into the degree vector
        without peeling further — the dataflow op's post-loop
        ``degrees(und)`` runs over the edge set filtered by the final
        survivor set, so a capped (non-converged) run must still count
        final-round removals.  At convergence this is a no-op."""
        self.kc_deg = self._kc_mark_and_degree(msgs)

    def kc_result(self) -> pa.Table:
        keep = self.kc_alive & (self.kc_deg > 0)
        return pa.table(
            {
                "entity_id": pa.array(self.ids[keep], type=pa.int64()),
                "degree": pa.array(self.kc_deg[keep], type=pa.int64()),
            }
        )

    # -- deterministic random walks over the same shards: a walker at
    #    node v steps ON v's home shard (the out-degree and the ranked
    #    neighbor list are local), then routes to the next node's home.
    #    Per step the wire carries one (start, walk_no, next) triple per
    #    LIVE walker — walker-sized traffic, not graph-sized. ----------

    def rw_setup(self) -> None:
        """Distinct ranked CSR adjacency over home sources, derived once
        from the already-loaded edge arrays (neighbors ascend by id —
        the same ranking as ``graphops.random_walks``'s rank_block) and
        cached for every later walk invocation."""
        if getattr(self, "_rw_ready", False):
            return
        if len(self.starts):
            dst_full = self.msg_dst[self._lp_run_id()]
            order = np.lexsort((dst_full, self.src_idx))
            s, d = self.src_idx[order], dst_full[order]
            keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
            s, d = s[keep], d[keep]
        else:
            s = np.empty(0, dtype=np.intp)
            d = np.empty(0, dtype=np.int64)
        self.rw_indptr = np.searchsorted(
            s, np.arange(len(self.ids) + 1)
        ).astype(np.intp)
        self.rw_adj = d
        self.rw_deg = np.diff(self.rw_indptr).astype(np.int64)
        self._rw_ready = True

    def rw_reset(self, walks_per_node: int, seed: int) -> None:
        """K walkers per home node; the step-0 row of every walker
        (sinks included) is emitted immediately, as in the dataflow
        op."""
        self.rw_setup()
        K = walks_per_node
        n = len(self.ids)
        self.rw_K = np.int64(K)
        self.rw_seed = np.int64(seed)
        self.rw_start = np.repeat(self.ids, K)
        self.rw_wn = np.tile(np.arange(K, dtype=np.int64), n)
        self.rw_cur = np.repeat(np.arange(n, dtype=np.intp), K)
        self.rw_emit = [
            (
                self.rw_start.copy(),
                self.rw_wn.copy(),
                np.zeros(n * K, dtype=np.int64),
                np.repeat(self.ids, K),
            )
        ]

    def rw_step(self, step: int):
        """Advance this shard's live walkers one step: the identical
        wrapping-int64 mix mod out-degree as the dataflow ``pick``
        kernel, then route each walker to its next node's home shard."""
        cur = self.rw_cur
        alive = self.rw_deg[cur] > 0
        st = self.rw_start[alive]
        wn = self.rw_wn[alive]
        cur = cur[alive]
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
        if not len(cur):
            return [empty for _ in range(self.n_parts)]
        d = self.rw_deg[cur]
        from .graphops import RW_M1, RW_M2, RW_M3

        with np.errstate(over="ignore"):
            uw = st * self.rw_K + wn
            h = (
                self.ids[cur] * np.int64(RW_M1)
                + np.int64(step) * np.int64(RW_M2)
                + uw * np.int64(RW_M3)
                + self.rw_seed
            )
        rk = (h.view(np.uint64) % d.astype(np.uint64)).astype(np.int64)
        nxt = self.rw_adj[self.rw_indptr[cur] + rk]
        self.rw_emit.append(
            (st, wn, np.full(len(st), step, dtype=np.int64), nxt)
        )
        part = _part_of(nxt, self.n_parts)
        order = np.argsort(part, kind="stable")
        st, wn, nxt = st[order], wn[order], nxt[order]
        bounds = np.searchsorted(part[order], np.arange(self.n_parts + 1))
        return [
            (
                st[bounds[j]: bounds[j + 1]],
                wn[bounds[j]: bounds[j + 1]],
                nxt[bounds[j]: bounds[j + 1]],
            )
            for j in range(self.n_parts)
        ]

    def rw_recv(self, *msgs) -> int:
        """Adopt the walkers that landed on this shard; returns the live
        count (the driver stops at a global 0, like the dataflow op's
        ``state.count() == 0`` break)."""
        arrs: list[tuple] = []
        for a in msgs:
            if isinstance(a, list):  # n_parts == 1 flatten
                arrs.extend(a)
            else:
                arrs.append(a)
        parts = [a for a in arrs if len(a[0])]
        if not parts:
            self.rw_start = np.empty(0, dtype=np.int64)
            self.rw_wn = np.empty(0, dtype=np.int64)
            self.rw_cur = np.empty(0, dtype=np.intp)
            return 0
        self.rw_start = np.concatenate([a[0] for a in parts])
        self.rw_wn = np.concatenate([a[1] for a in parts])
        nxt = np.concatenate([a[2] for a in parts])
        self.rw_cur = np.searchsorted(self.ids, nxt).astype(np.intp)
        return int(len(nxt))

    def rw_result(self) -> pa.Table:
        cols = [np.concatenate([e[i] for e in self.rw_emit]) for i in range(4)]
        self.rw_emit = []
        return pa.table(
            {
                "start_node": pa.array(cols[0], type=pa.int64()),
                "walk_no": pa.array(cols[1], type=pa.int64()),
                "step": pa.array(cols[2], type=pa.int64()),
                "entity_id": pa.array(cols[3], type=pa.int64()),
            }
        )


def _partition_refs(ds, id_col: str, n_parts: int):
    """The one-time shard shuffle, as map tasks only: each materialized
    block is split by ``h(id_col)`` into ``n_parts`` slices
    (``num_returns=n_parts`` — one addressable object per slice), and
    shard p later fetches exactly the ``[block, p]`` slices.  This is a
    manual all-to-all whose data never touches the driver and never
    sorts globally — no Ray Data exchange is involved at all."""
    import ray

    def split(tbl: pa.Table):
        if tbl.num_rows == 0:
            parts = tuple(tbl for _ in range(n_parts))
        else:
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            part = _part_of(ids, n_parts)
            order = np.argsort(part, kind="stable")
            stbl = tbl.take(pa.array(order))
            bounds = np.searchsorted(
                part[order], np.arange(n_parts + 1)
            )
            parts = tuple(
                stbl.slice(bounds[j], bounds[j + 1] - bounds[j])
                for j in range(n_parts)
            )
        return parts[0] if n_parts == 1 else parts

    split_task = ray.remote(split)
    refs = ds.materialize().to_arrow_refs()
    outs = [
        split_task.options(num_returns=n_parts).remote(r) for r in refs
    ]
    if n_parts == 1:
        outs = [[o] for o in outs]
    return {p: [o[p] for o in outs] for p in range(n_parts)}


class PageRankBSP:
    """Setup-once handle over the sharded graph.

    The expensive, data-proportional work — the degree aggregate, the
    two partition exchanges, actor spawn, and the static
    message-structure exchange — happens ONCE in ``__init__``; each
    :meth:`run` then costs only per-iteration scatter/gather rounds.
    On a cluster this is the shape an iterative-analytics job actually
    has (partition once, iterate to convergence, often run several
    damping/iteration variants — or several BFS seeds, via
    :meth:`bfs` — over the same sharded graph), and it is
    what makes the two-cluster-size measurement honest: the criterion
    compares *iteration* throughput, which is the part that repeats
    hundreds of times, not the one-time shard build (``bench.py
    --graph-scaling`` reports the setup wall separately).

    Use as a context manager or call :meth:`close` to release the
    actors.  Results remain valid after ``close()`` — the result blocks
    are owned by the driver, not the actors.
    """

    def __init__(self, edges, num_partitions: int | None = None):
        import ray

        from ..shuffle import default_partitions
        from .graphops import node_degrees

        self.n_parts = n_parts = num_partitions or default_partitions()

        deg = node_degrees(edges).materialize()
        self.n_nodes = deg.count()

        node_refs = _partition_refs(
            deg.select_columns(["entity_id", "w_out"]), "entity_id", n_parts
        )

        def to_edge(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": t.column("subj_id").cast(pa.int64()),
                    "dst": t.column("obj_id").cast(pa.int64()),
                    "w": t.column("weight").cast(pa.int64()),
                }
            )

        edge_refs = _partition_refs(
            edges.map_batches(to_edge, batch_format="pyarrow"), "src", n_parts
        )

        # Leave headroom below the cluster CPU total: Ray Data submits
        # 1-CPU metadata tasks (from_arrow_refs) and the handle keeps its
        # actors alive across run() calls, so shards must never hold
        # EVERY core (observed deadlock when they did).  Fractional
        # reservations only throttle Ray's scheduler, not the actors'
        # actual compute.
        total_cpus = ray.cluster_resources().get("CPU", float(n_parts))
        cpus_per_actor = max(
            0.01, min(1.0, int((total_cpus - 1) * 100 / n_parts) / 100)
        )
        Shard = ray.remote(num_cpus=cpus_per_actor)(_PRShard)
        self.actors = [Shard.remote(p, n_parts) for p in range(n_parts)]
        ray.get(
            [
                a.load.remote(node_refs[p], edge_refs[p], 0)
                for p, a in enumerate(self.actors)
            ]
        )
        # static message-structure exchange (once per handle)
        struct = [
            a.structure.options(num_returns=n_parts).remote()
            for a in self.actors
        ]
        if n_parts == 1:
            struct = [[s] for s in struct]
        ray.get(
            [
                self.actors[j].gather_structure.remote(
                    *[struct[i][j] for i in range(n_parts)]
                )
                for j in range(n_parts)
            ]
        )

    def run(self, iters: int = 8, damping: float = 0.85, seeds=None):
        """One full PageRank: reset ranks, ``iters`` scatter/gather
        rounds, return the (entity_id, rank) Dataset.  Bit-identical to
        :func:`graphops.pagerank` at any partition count — including
        the ``seeds=`` personalized variant (seeded init/teleport/
        dangling; same fixed-point ops, same oracle)."""
        import ray

        if not self.actors:
            raise RuntimeError("PageRankBSP handle is closed")
        n_parts, n_nodes = self.n_parts, self.n_nodes
        dnum = round(damping * 1000)
        if seeds is None:
            n_base = n_nodes
        else:
            # normalize by seeds PRESENT in the graph (mirrors
            # graphops.pagerank): an absent seed id must not shrink
            # total rank mass below 1 or diverge from the SQL twin
            n_base = sum(
                ray.get(
                    [a.count_present.remote(seeds) for a in self.actors]
                )
            )
            if n_base == 0:
                raise ValueError(
                    "personalized pagerank: no seed id exists in the graph"
                )
        init_fp = PR_SCALE // n_base
        base_fp = (1000 - dnum) * PR_SCALE // (1000 * n_base)

        ray.get([a.reset.remote(init_fp, seeds) for a in self.actors])
        for _ in range(iters):
            scat = [
                a.scatter.options(num_returns=n_parts + 1).remote()
                for a in self.actors
            ]
            dangling = sum(ray.get([s[-1] for s in scat]))
            dang_share = dangling // n_base
            ray.get(
                [
                    self.actors[j].gather.remote(
                        base_fp,
                        dnum,
                        dang_share,
                        *[scat[i][j] for i in range(n_parts)],
                    )
                    for j in range(n_parts)
                ]
            )

        result_refs = [a.result.remote() for a in self.actors]
        # seal the result blocks now — they are owned by the driver (the
        # caller of .result.remote()), so they outlive the actors and
        # even a later close()
        ray.get(result_refs)
        out = ray.data.from_arrow_refs(result_refs)
        return out.map_batches(
            lambda t: pa.table(
                {
                    "entity_id": t.column("entity_id"),
                    "rank": pc_divide_exact(t.column("rank_fp")),
                }
            ),
            batch_format="pyarrow",
        )

    def bfs(self, source: int, max_hops: int = 15):
        """Single-source hop distances over the SAME sharded graph —
        (entity_id, hop) for every node reachable from ``source`` in
        ≤ ``max_hops`` directed edges, identical to
        :func:`graphops.bfs_hops` (source always appears at hop 0, the
        dataflow op's convention).  Per round each shard ships only the
        POSITIONS of newly reached slots in the static message
        structure — frontier-sized traffic, not graph-sized — and the
        driver sees one scalar per shard (the newly-reached count,
        which also terminates the loop early)."""
        import ray

        if not self.actors:
            raise RuntimeError("PageRankBSP handle is closed")
        n_parts = self.n_parts
        seeded = sum(
            ray.get([a.bfs_reset.remote(source) for a in self.actors])
        )
        if seeded:
            for hop in range(1, max_hops + 1):
                scat = [
                    a.bfs_scatter.options(num_returns=n_parts).remote(hop)
                    for a in self.actors
                ]
                if n_parts == 1:
                    scat = [[s] for s in scat]
                new = ray.get(
                    [
                        self.actors[j].bfs_gather.remote(
                            hop, *[scat[i][j] for i in range(n_parts)]
                        )
                        for j in range(n_parts)
                    ]
                )
                if sum(new) == 0:
                    break
        result_refs = [a.bfs_result.remote() for a in self.actors]
        ray.get(result_refs)  # seal before any close()
        out = ray.data.from_arrow_refs(result_refs)
        if not seeded:
            # bfs_hops seeds `visited` unconditionally: a source absent
            # from the edge set still yields its own (source, 0) row
            out = out.union(
                ray.data.from_arrow(
                    pa.table(
                        {
                            "entity_id": pa.array([source], pa.int64()),
                            "hop": pa.array([0], pa.int64()),
                        }
                    )
                )
            )
        return out

    def components(self, max_iters: int = 10):
        """Min-label fixed point over the sharded graph — (doc_id,
        component) with component = min id reachable, identical to
        :func:`graphops.connected_components` round for round (labels
        only decrease and min commutes, so the states match even when
        ``max_iters`` caps before convergence).  Requires a handle built
        over a direction-doubled edge table (use
        :func:`components_bsp` unless you doubled yourself).  Per round
        each shard ships only (position, label) pairs for last-round
        CHANGES — frontier-sized traffic — and the driver sees one
        changed-count scalar per shard."""
        import ray

        if not self.actors:
            raise RuntimeError("PageRankBSP handle is closed")
        n_parts = self.n_parts
        ray.get([a.labels_reset.remote() for a in self.actors])
        for _ in range(max_iters):
            scat = [
                a.cc_scatter.options(num_returns=n_parts).remote()
                for a in self.actors
            ]
            if n_parts == 1:
                scat = [[s] for s in scat]
            changed = ray.get(
                [
                    self.actors[j].cc_gather.remote(
                        *[scat[i][j] for i in range(n_parts)]
                    )
                    for j in range(n_parts)
                ]
            )
            if sum(changed) == 0:
                break
        result_refs = [
            a.labels_result.remote("doc_id", "component")
            for a in self.actors
        ]
        ray.get(result_refs)  # seal before any close()
        return ray.data.from_arrow_refs(result_refs)

    def label_prop(self, max_iters: int = 10):
        """Synchronous label propagation (most-frequent neighbor label
        plus one self-vote, ties to the smallest label) — (entity_id,
        community), identical to :func:`graphops.label_propagation`
        round for round.  Requires a handle built over the
        direction-doubled DISTINCT undirected edge list (use
        :func:`label_propagation_bsp` unless you built that yourself —
        duplicate edges would change the vote counts).  Votes are
        map-side combined: per round a shard ships one (position, label,
        count) entry per distinct (dst, label), never per edge."""
        import ray

        if not self.actors:
            raise RuntimeError("PageRankBSP handle is closed")
        n_parts = self.n_parts
        ray.get([a.labels_reset.remote() for a in self.actors])
        for _ in range(max_iters):
            scat = [
                a.lp_scatter.options(num_returns=n_parts).remote()
                for a in self.actors
            ]
            if n_parts == 1:
                scat = [[s] for s in scat]
            changed = ray.get(
                [
                    self.actors[j].lp_gather.remote(
                        *[scat[i][j] for i in range(n_parts)]
                    )
                    for j in range(n_parts)
                ]
            )
            if sum(changed) == 0:
                break
        result_refs = [
            a.labels_result.remote("entity_id", "community")
            for a in self.actors
        ]
        ray.get(result_refs)  # seal before any close()
        return ray.data.from_arrow_refs(result_refs)

    def k_core(self, k: int = 3, max_iters: int = 30):
        """k-core peeling over the sharded graph — (entity_id, degree)
        with the degree inside the core, identical to
        :func:`graphops.k_core` iteration for iteration (including the
        capped-run case: the final degree vector counts the last
        round's removals, matching the dataflow op's post-loop
        ``degrees(und)``).  Requires a handle built over the doubled
        DISTINCT undirected edge list (use :func:`k_core_bsp`).  Per
        round the wire carries only the slot positions of newly dead
        nodes; the dataflow plan pays a degree exchange plus two
        semi-joins per round."""
        import ray

        if not self.actors:
            raise RuntimeError("PageRankBSP handle is closed")
        n_parts = self.n_parts
        new_dead = sum(
            ray.get([a.kc_reset.remote(k) for a in self.actors])
        )
        rounds = 1

        def exchange(method: str):
            scat = [
                a.kc_scatter.options(num_returns=n_parts).remote()
                for a in self.actors
            ]
            if n_parts == 1:
                scat = [[s] for s in scat]
            return ray.get(
                [
                    getattr(self.actors[i], method).remote(
                        *[scat[j][i] for j in range(n_parts)]
                    )
                    for i in range(n_parts)
                ]
            )

        while new_dead > 0 and rounds < max_iters:
            new_dead = sum(exchange("kc_apply"))
            rounds += 1
        exchange("kc_finalize")
        result_refs = [a.kc_result.remote() for a in self.actors]
        ray.get(result_refs)  # seal before any close()
        return ray.data.from_arrow_refs(result_refs)

    def walks(
        self,
        walk_len: int = 8,
        walks_per_node: int = 2,
        seed: int = 42,
    ):
        """Deterministic random-walk corpus over the sharded graph —
        (start_node, walk_no, step, entity_id), bit-identical to
        :func:`graphops.random_walks` (same wrapping-int64 neighbor
        mix, same ascending-id neighbor ranking, same
        emit-then-die-at-sinks semantics).  A walker steps on its
        current node's home shard and moves as one (start, walk_no,
        next) triple per step — the dataflow op pays one padded join
        (two exchanges + compaction) per step for the same move."""
        import ray

        if not self.actors:
            raise RuntimeError("PageRankBSP handle is closed")
        n_parts = self.n_parts
        ray.get(
            [a.rw_reset.remote(walks_per_node, seed) for a in self.actors]
        )
        for step in range(1, walk_len + 1):
            scat = [
                a.rw_step.options(num_returns=n_parts).remote(step)
                for a in self.actors
            ]
            if n_parts == 1:
                scat = [[s] for s in scat]
            live = ray.get(
                [
                    self.actors[j].rw_recv.remote(
                        *[scat[i][j] for i in range(n_parts)]
                    )
                    for j in range(n_parts)
                ]
            )
            if sum(live) == 0:
                break
        result_refs = [a.rw_result.remote() for a in self.actors]
        ray.get(result_refs)  # seal before any close()
        return ray.data.from_arrow_refs(result_refs)

    def close(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def __enter__(self) -> "PageRankBSP":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def pagerank_bsp(
    edges,
    iters: int = 8,
    damping: float = 0.85,
    num_partitions: int | None = None,
    seeds=None,
):
    """edges(subj_id, obj_id, weight, …) → (entity_id, rank):
    bit-identical to :func:`graphops.pagerank` (including the
    ``seeds=`` personalized variant), computed on a BSP actor pool —
    the scale path for iterative graph analytics (see module docstring
    for the plan and why Ray Data's per-round exchanges anti-scale
    here).  One-shot convenience over :class:`PageRankBSP`;
    iterate-many callers should hold the handle instead."""
    with PageRankBSP(edges, num_partitions=num_partitions) as h:
        return h.run(iters=iters, damping=damping, seeds=seeds)


def bfs_bsp(
    edges,
    source: int,
    max_hops: int = 15,
    num_partitions: int | None = None,
):
    """edges → (entity_id, hop): single-source BFS reachability on the
    BSP actor pool, identical output to :func:`graphops.bfs_hops`.
    One-shot convenience over :meth:`PageRankBSP.bfs`; the handle form
    amortizes the partition exchange across many seeds (multi-seed
    impact analysis is the common shape of this query)."""
    with PageRankBSP(edges, num_partitions=num_partitions) as h:
        return h.bfs(source, max_hops=max_hops)


def components_bsp(
    pairs,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 10,
    num_partitions: int | None = None,
):
    """(a, b) pair Dataset → (doc_id, component): connected components
    on the BSP actor pool, identical output to
    :func:`graphops.connected_components` — the scale path for near-dup
    clustering (MinHash pairs → components), where the dataflow
    formulation pays two edge-sized exchanges per round.  Doubles the
    pair directions inside one ``map_batches`` (the same structure the
    dataflow op builds with ``_both_directions``) and runs the min-label
    delta loop on the sharded handle."""

    def doubled(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or a not in t.column_names:
            return pa.table(
                {
                    "subj_id": pa.array([], type=pa.int64()),
                    "obj_id": pa.array([], type=pa.int64()),
                    "weight": pa.array([], type=pa.int64()),
                }
            )
        x = t.column(a).cast(pa.int64()).combine_chunks()
        y = t.column(b).cast(pa.int64()).combine_chunks()
        return pa.table(
            {
                "subj_id": pa.concat_arrays([x, y]),
                "obj_id": pa.concat_arrays([y, x]),
                "weight": pa.array(
                    np.ones(2 * t.num_rows, dtype=np.int64)
                ),
            }
        )

    with PageRankBSP(
        pairs.map_batches(doubled, batch_format="pyarrow"),
        num_partitions=num_partitions,
    ) as h:
        return h.components(max_iters=max_iters)


def label_propagation_bsp(
    edges_ds,
    max_iters: int = 10,
    num_partitions: int | None = None,
):
    """edges(subj_id, obj_id, …) → (entity_id, community): synchronous
    label-propagation community detection on the BSP actor pool,
    identical output to :func:`graphops.label_propagation`.  Builds the
    same DISTINCT undirected adjacency the dataflow op votes over
    (``_und_and_degrees`` — duplicate edges must not multiply votes),
    then runs the vote-combiner loop on the sharded handle."""
    from .graphops import _und_and_degrees

    und, _deg, num_partitions = _und_and_degrees(edges_ds, num_partitions)

    def doubled(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table(
                {
                    "subj_id": pa.array([], type=pa.int64()),
                    "obj_id": pa.array([], type=pa.int64()),
                    "weight": pa.array([], type=pa.int64()),
                }
            )
        x = t.column("a").combine_chunks()
        y = t.column("b").combine_chunks()
        return pa.table(
            {
                "subj_id": pa.concat_arrays([x, y]),
                "obj_id": pa.concat_arrays([y, x]),
                "weight": pa.array(
                    np.ones(2 * t.num_rows, dtype=np.int64)
                ),
            }
        )

    with PageRankBSP(
        und.map_batches(doubled, batch_format="pyarrow"),
        num_partitions=num_partitions,
    ) as h:
        return h.label_prop(max_iters=max_iters)


def k_core_bsp(
    edges_ds,
    k: int = 3,
    max_iters: int = 30,
    num_partitions: int | None = None,
):
    """edges(subj_id, obj_id, …) → (entity_id, degree): k-core of the
    undirected entity graph on the BSP actor pool, identical output to
    :func:`graphops.k_core` — so the same degree-threshold oracle
    covers both plans.  Builds the same distinct undirected edge list
    the dataflow op peels (self-loops dropped), doubled into the
    handle's directed shard layout."""
    from .graphops import _und_and_degrees

    und, _deg, num_partitions = _und_and_degrees(edges_ds, num_partitions)

    def doubled(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table(
                {
                    "subj_id": pa.array([], type=pa.int64()),
                    "obj_id": pa.array([], type=pa.int64()),
                    "weight": pa.array([], type=pa.int64()),
                }
            )
        x = t.column("a").combine_chunks()
        y = t.column("b").combine_chunks()
        return pa.table(
            {
                "subj_id": pa.concat_arrays([x, y]),
                "obj_id": pa.concat_arrays([y, x]),
                "weight": pa.array(np.ones(2 * t.num_rows, dtype=np.int64)),
            }
        )

    with PageRankBSP(
        und.map_batches(doubled, batch_format="pyarrow"),
        num_partitions=num_partitions,
    ) as h:
        return h.k_core(k=k, max_iters=max_iters)


def random_walks_bsp(
    edges_ds,
    walk_len: int = 8,
    walks_per_node: int = 2,
    seed: int = 42,
    num_partitions: int | None = None,
):
    """edges(subj_id, obj_id, …) → (start_node, walk_no, step,
    entity_id): the DeepWalk corpus generator on the BSP actor pool,
    bit-identical to :func:`graphops.random_walks` — so the same
    unrolled SQL oracle covers both plans.  One-shot convenience over
    :meth:`PageRankBSP.walks`; embedding pipelines that sweep
    (walk_len, walks_per_node, seed) should hold the handle and pay the
    shard build once."""
    with PageRankBSP(edges_ds, num_partitions=num_partitions) as h:
        return h.walks(
            walk_len=walk_len, walks_per_node=walks_per_node, seed=seed
        )


class _HITSShard:
    """One HITS BSP worker: owns the nodes with ``h(node) == part``,
    the FORWARD edges with ``h(src) == part`` (the auth phase reads the
    local hub score at src and messages dst) and the REVERSE edges with
    ``h(dst) == part`` (the hub phase reads the local auth score at dst
    and messages src).  Same numpy layout discipline as
    :class:`_PRShard`, held once per direction; replays
    :func:`graphops.hits`'s fixed-point contract bit-for-bit."""

    def __init__(self, part: int, n_parts: int):
        self.part = part
        self.n_parts = n_parts

    def _dir_struct(self, tables, join_col: str, emit_col: str) -> dict:
        """Static per-direction structure: local score index per edge,
        distinct-emit-id run boundaries, and per-target-shard slice
        bounds — the HITS twin of ``_PRShard.load``'s edge block."""
        if tables:
            et = pa.concat_tables(tables)
            j = et.column(join_col).to_numpy(zero_copy_only=False)
            e = et.column(emit_col).to_numpy(zero_copy_only=False)
            w = et.column("w").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            epart = _part_of(e, self.n_parts)
            order = np.lexsort((e, epart))
            j, e, w, epart = j[order], e[order], w[order], epart[order]
            # every join-end node is home here by construction
            join_idx = np.searchsorted(self.ids, j).astype(np.intp)
            starts = np.flatnonzero(
                np.r_[True, e[1:] != e[:-1]]
            ).astype(np.intp)
            msg_ids = e[starts]
            jbounds = np.searchsorted(
                epart[starts], np.arange(self.n_parts + 1)
            )
        else:
            join_idx = np.empty(0, dtype=np.intp)
            w = np.empty(0, dtype=np.int64)
            starts = np.empty(0, dtype=np.intp)
            msg_ids = np.empty(0, dtype=np.int64)
            jbounds = np.zeros(self.n_parts + 1, dtype=np.int64)
        return {
            "join_idx": join_idx,
            "w": w,
            "starts": starts,
            "msg_ids": msg_ids,
            "jbounds": jbounds,
        }

    def load(self, node_refs, fwd_refs, rev_refs) -> int:
        import ray

        nodes = [t for t in ray.get(list(node_refs)) if t.num_rows]
        if nodes:
            ids = (
                pa.concat_tables(nodes)
                .column("entity_id")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            self.ids = np.sort(ids, kind="stable")
        else:
            self.ids = np.empty(0, dtype=np.int64)
        self.dirs = {
            "fwd": self._dir_struct(
                [t for t in ray.get(list(fwd_refs)) if t.num_rows],
                "src",
                "dst",
            ),
            "rev": self._dir_struct(
                [t for t in ray.get(list(rev_refs)) if t.num_rows],
                "dst",
                "src",
            ),
        }
        self.gath: dict = {}
        self.hub_fp = np.empty(0, dtype=np.int64)
        self.auth_fp = np.empty(0, dtype=np.int64)
        return len(self.ids)

    def structure(self, direction: str):
        d = self.dirs[direction]
        return [
            d["msg_ids"][d["jbounds"][j]: d["jbounds"][j + 1]]
            for j in range(self.n_parts)
        ]

    def gather_structure(self, direction: str, *id_arrays) -> None:
        arrs: list[np.ndarray] = []
        for a in id_arrays:
            if isinstance(a, list):  # n_parts == 1 flatten, as _PRShard
                arrs.extend(np.asarray(x) for x in a)
            else:
                arrs.append(np.asarray(a))
        all_ids = (
            np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
        )
        idx = np.searchsorted(self.ids, all_ids).astype(np.intp)
        order = np.argsort(idx, kind="stable")
        sidx = idx[order]
        gstarts = np.flatnonzero(
            np.r_[True, sidx[1:] != sidx[:-1]]
        ).astype(np.intp)
        self.gath[direction] = {
            "order": order,
            "starts": gstarts,
            "target": sidx[gstarts] if len(sidx) else sidx,
            # position-addressed view for the frontier ops (bow-tie
            # BFS): local node index of the p-th slot of sender i's
            # static message is idx[off[i] + p] — same as _PRShard
            "idx": idx,
            "off": np.concatenate(
                ([0], np.cumsum([len(a) for a in arrs]))
            ).astype(np.intp),
        }

    def reset(self, init_fp: int) -> None:
        self.hub_fp = np.full(len(self.ids), init_fp, dtype=np.int64)
        self.auth_fp = np.zeros(len(self.ids), dtype=np.int64)

    # -- dual-direction BFS over the same shards (the bow-tie pass:
    #    forward reach over "fwd", backward reach over "rev"; frontier
    #    messages are POSITIONS into the static structures) -----------

    def bt_reset(self, source: int) -> None:
        self.bt_dist = {
            d: np.full(len(self.ids), -1, dtype=np.int64)
            for d in ("fwd", "rev")
        }
        pos = int(np.searchsorted(self.ids, source))
        if pos < len(self.ids) and int(self.ids[pos]) == source:
            self.bt_dist["fwd"][pos] = 0
            self.bt_dist["rev"][pos] = 0

    def bt_scatter(self, direction: str, hop: int):
        d = self.dirs[direction]
        dist = self.bt_dist[direction]
        if len(d["starts"]):
            active_edge = dist[d["join_idx"]] == hop - 1
            run_active = np.logical_or.reduceat(active_edge, d["starts"])
        else:
            run_active = np.empty(0, dtype=bool)
        jb = d["jbounds"]
        return [
            np.flatnonzero(run_active[jb[j]: jb[j + 1]]).astype(np.int64)
            for j in range(self.n_parts)
        ]

    def bt_gather(self, direction: str, hop: int, *pos_arrays) -> int:
        arrs: list[np.ndarray] = []
        for a in pos_arrays:
            if isinstance(a, list):  # n_parts == 1 flatten
                arrs.extend(np.asarray(x) for x in a)
            else:
                arrs.append(np.asarray(a))
        if not arrs:
            return 0
        g = self.gath[direction]
        idxs = [
            g["idx"][g["off"][i] + a.astype(np.intp)]
            for i, a in enumerate(arrs)
            if len(a)
        ]
        if not idxs:
            return 0
        dist = self.bt_dist[direction]
        cand = np.unique(np.concatenate(idxs))
        new = cand[dist[cand] == -1]
        dist[new] = hop
        return int(len(new))

    def bt_counts(self):
        """Region histogram of this shard's home nodes: tag = forward
        (1) + 2·backward (2) reachability — index = the shared
        other/out/in/core encoding of ``graphops._bowtie_classify``."""
        tag = (self.bt_dist["fwd"] >= 0).astype(np.int64) + 2 * (
            self.bt_dist["rev"] >= 0
        ).astype(np.int64)
        return [int((tag == k).sum()) for k in range(4)]

    # -- k-source Brandes betweenness over the same dual-direction
    #    shards: forward σ-BFS pushes along "fwd", the backward
    #    dependency recursion pulls along "rev"; per-source state is a
    #    (n_local, k) int64 matrix and every sum is the dataflow twin's
    #    commutative integer op, so results are bit-identical ----------

    def bc_reset(self, sources) -> None:
        n, k = len(self.ids), len(sources)
        self.bc_depth = np.full((n, k), -1, dtype=np.int64)
        self.bc_sigma = np.zeros((n, k), dtype=np.int64)
        self.bc_delta = np.zeros((n, k), dtype=np.int64)
        for s_i, s in enumerate(sources):
            pos = int(np.searchsorted(self.ids, s))
            if pos < n and int(self.ids[pos]) == s:
                self.bc_depth[pos, s_i] = 0
                self.bc_sigma[pos, s_i] = 1

    def bc_fwd_scatter(self, d: int):
        """Round-d forward messages: per distinct out-neighbor run, the
        per-source σ sum over edges whose LOCAL src sits at depth
        d−1 — the dataflow plan's ``fwd_partial`` combine, computed on
        the static structure."""
        dd = self.dirs["fwd"]
        E = len(dd["join_idx"])
        R = len(dd["starts"])
        k = self.bc_depth.shape[1]
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty((0, k), dtype=np.int64),
        )
        if not R:
            return [empty for _ in range(self.n_parts)]
        act = self.bc_depth[dd["join_idx"]] == d - 1
        contrib = np.where(act, self.bc_sigma[dd["join_idx"]], 0)
        if contrib.size:
            lengths = np.diff(np.r_[dd["starts"], E])
            m = int(contrib.max())
            if m and m * int(lengths.max()) >= 2**63:
                raise OverflowError(
                    "betweenness σ partial exceeds int64; lower max_depth"
                )
        run_sum = np.add.reduceat(contrib, dd["starts"], axis=0)
        run_active = run_sum.any(axis=1)
        jb = dd["jbounds"]
        out = []
        for j in range(self.n_parts):
            sl = run_active[jb[j]: jb[j + 1]]
            idx = np.flatnonzero(sl).astype(np.int64)
            out.append((idx, run_sum[jb[j]: jb[j + 1]][idx]))
        return out

    def bc_fwd_gather(self, d: int, *msgs) -> int:
        """Sum incoming σ per (node, source); nodes still unvisited for
        a source are discovered at depth d with that σ (the dataflow
        ``unseen_only`` filter) — later arrivals are discarded."""
        flat: list = []
        for v in msgs:
            if isinstance(v, list):
                flat.extend(v)
            else:
                flat.append(v)
        g = self.gath["fwd"]
        n, k = self.bc_depth.shape
        inc = np.zeros((n, k), dtype=np.int64)
        for i, (pos, mat) in enumerate(flat):
            pos = np.asarray(pos)
            if not len(pos):
                continue
            li = g["idx"][g["off"][i] + pos.astype(np.intp)]
            np.add.at(inc, li, np.asarray(mat))
        # contributions are nonnegative: a negative or near-limit sum
        # means the int64 accumulate wrapped — raise, never continue
        if inc.size and (int(inc.min()) < 0 or int(inc.max()) >= 2**62):
            raise OverflowError(
                "betweenness σ sum exceeds int64; lower max_depth"
            )
        new_mask = (self.bc_depth == -1) & (inc > 0)
        self.bc_depth[new_mask] = d
        self.bc_sigma[new_mask] = inc[new_mask]
        return int(new_mask.sum())

    def bc_bwd_scatter(self, d: int):
        """Backward round-d messages: for every in-edge (v, w) whose
        LOCAL node w sits at depth d+1 (per source), ship (σ_w, δ_w)
        toward v as per-edge rows addressed by v's run position — the
        receiver holds σ_v and applies the fixed-point rule."""
        dd = self.dirs["rev"]
        E = len(dd["join_idx"])
        R = len(dd["starts"])
        k = self.bc_depth.shape[1]
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty((0, k), dtype=np.int64),
            np.empty((0, k), dtype=np.int64),
        )
        if not R:
            return [empty for _ in range(self.n_parts)]
        if not hasattr(self, "_bc_rev_roe"):
            lengths = np.diff(np.r_[dd["starts"], E])
            self._bc_rev_roe = np.repeat(
                np.arange(R, dtype=np.int64), lengths
            )
        roe = self._bc_rev_roe
        jidx = dd["join_idx"]
        act = self.bc_depth[jidx] == d + 1
        swm = np.where(act, self.bc_sigma[jidx], 0)
        dwm = np.where(act, self.bc_delta[jidx], 0)
        edge_active = act.any(axis=1)
        jb = dd["jbounds"]
        starts = dd["starts"]
        out = []
        for j in range(self.n_parts):
            lo = int(starts[jb[j]]) if jb[j] < R else E
            hi = int(starts[jb[j + 1]]) if jb[j + 1] < R else E
            sel = np.flatnonzero(edge_active[lo:hi]).astype(np.intp) + lo
            out.append((roe[sel] - jb[j], swm[sel], dwm[sel]))
        return out

    def bc_bwd_gather(self, d: int, *msgs) -> None:
        """Apply the dependency rule at the receiver: for each incoming
        (σ_w, δ_w) row landing on a LOCAL node v at depth d,
        ``δ_v += (σ_v · (SCALE + δ_w)) // σ_w`` — the dataflow twin's
        exact integer expression, products bound-checked in Python ints
        before the vectorized evaluation (numpy int64 wraps silently)."""
        from .graphops import BC_SCALE

        flat: list = []
        for v in msgs:
            if isinstance(v, list):
                flat.extend(v)
            else:
                flat.append(v)
        g = self.gath["rev"]
        for i, (pos, swm, dwm) in enumerate(flat):
            pos = np.asarray(pos)
            if not len(pos):
                continue
            li = g["idx"][g["off"][i] + pos.astype(np.intp)]
            swm = np.asarray(swm)
            dwm = np.asarray(dwm)
            sv = self.bc_sigma[li]
            valid = (swm > 0) & (self.bc_depth[li] == d)
            if not valid.any():
                continue
            max_sv = int(sv[valid].max())
            max_dw = int(dwm[valid].max())
            if max_sv * (BC_SCALE + max_dw) >= 2**63:
                raise OverflowError(
                    "betweenness δ fixed-point product exceeds int64; "
                    "lower max_depth or BC_SCALE"
                )
            num = np.where(valid, sv, 0) * (
                BC_SCALE + np.where(valid, dwm, 0)
            )
            c = num // np.where(valid, swm, 1)
            np.add.at(self.bc_delta, li, np.where(valid, c, 0))
        if self.bc_delta.size and (
            int(self.bc_delta.min()) < 0
            or int(self.bc_delta.max()) >= 2**62
        ):
            raise OverflowError(
                "betweenness δ sum exceeds int64; lower max_depth"
            )

    def bc_result(self) -> pa.Table:
        """(entity_id, bc_fp, bc) over this shard's home nodes reached
        at depth ≥ 1 by any source; per-source δ is counted only for
        sources that reached the node at depth ≥ 1 (the dataflow plan's
        levels-≥-1 union), summed in Python ints."""
        from .graphops import BC_SCALE

        reached = self.bc_depth >= 1
        rows = reached.any(axis=1)
        ids = self.ids[rows]
        masked = np.where(reached[rows], self.bc_delta[rows], 0)
        fp = [int(x) for x in masked.astype(object).sum(axis=1)] if len(
            ids
        ) else []
        for v in fp:
            if not (-(1 << 63) <= v < (1 << 63)):
                raise OverflowError(
                    "betweenness bc_fp total exceeds int64"
                )
        fp_arr = np.array(fp, dtype=np.int64) if fp else np.empty(
            0, dtype=np.int64
        )
        return pa.table(
            {
                "entity_id": pa.array(ids, type=pa.int64()),
                "bc_fp": pa.array(fp_arr, type=pa.int64()),
                "bc": pa.array(
                    fp_arr.astype(np.float64) / float(BC_SCALE),
                    type=pa.float64(),
                ),
            }
        )

    def scatter(self, direction: str):
        """One half-round's outgoing combined contributions + this
        shard's contribution total (returned last, ``num_returns =
        P + 1`` — the driver's rescale divisor needs only the global
        sum, exactly :func:`graphops.hits`'s per-phase ``total``)."""
        d = self.dirs[direction]
        fp = self.hub_fp if direction == "fwd" else self.auth_fp
        r = fp[d["join_idx"]]
        if len(r) and int(r.max()) * int(d["w"].max()) >= 2**62:
            raise OverflowError(
                "hits fixed-point product would overflow int64; "
                "normalize edge weights first"
            )
        c = r * d["w"]
        sums = (
            np.add.reduceat(c, d["starts"])
            if len(d["starts"])
            else np.empty(0, dtype=np.int64)
        )
        jb = d["jbounds"]
        return [
            sums[jb[j]: jb[j + 1]] for j in range(self.n_parts)
        ] + [int(c.sum())]

    def apply(self, direction: str, div: int, *values) -> None:
        """Sum one half-round's incoming contributions into the home
        score vector and rescale by the driver's divisor — ``fwd``
        writes authorities, ``rev`` writes hubs.  Nodes with no
        incoming mass get ``0 // div == 0``, matching the dataflow
        plan's zero-row union."""
        raw = np.zeros(len(self.ids), dtype=np.int64)
        g = self.gath[direction]
        if values:
            all_c = np.concatenate([np.asarray(v) for v in values])
            if len(all_c):
                sc = all_c[g["order"]]
                raw[g["target"]] = np.add.reduceat(sc, g["starts"])
        fp = raw // div
        if direction == "fwd":
            self.auth_fp = fp
        else:
            self.hub_fp = fp

    def result(self) -> pa.Table:
        from .graphops import HITS_SCALE

        scale = float(HITS_SCALE)  # power of two: float division exact
        return pa.table(
            {
                "entity_id": pa.array(self.ids, type=pa.int64()),
                "auth": pa.array(self.auth_fp.astype(np.float64) / scale),
                "hub": pa.array(self.hub_fp.astype(np.float64) / scale),
            }
        )


class HITSBSP:
    """Setup-once sharded handle for HITS hubs-and-authorities — the
    same shape as :class:`PageRankBSP` but with BOTH edge directions
    resident per shard (the auth phase pushes hub·w along edges, the
    hub phase pushes auth·w against them), so each half-round is one
    scatter/gather wave plus one driver scalar (the global raw total
    fixing the round's rescale divisor).  The dataflow twin
    (:func:`graphops.hits`) pays 2 ``local_hash_join`` + 2 grouped-Sum
    exchanges per iteration over the static edge table; here the edges
    never move after setup.  Results are BIT-IDENTICAL to the dataflow
    plan at any partition count (integer contributions commute; the
    rescale ``raw // max(total // HITS_SCALE, 1)`` uses driver scalars
    only), so the same DuckDB oracle covers both plans."""

    def __init__(self, edges, num_partitions: int | None = None):
        import ray

        from ..shuffle import default_partitions
        from .graphops import node_degrees

        self.n_parts = n_parts = num_partitions or default_partitions()
        deg = node_degrees(edges).materialize()
        self.n_nodes = deg.count()
        node_refs = _partition_refs(
            deg.select_columns(["entity_id"]), "entity_id", n_parts
        )

        def to_edge(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": t.column("subj_id").cast(pa.int64()),
                    "dst": t.column("obj_id").cast(pa.int64()),
                    "w": t.column("weight").cast(pa.int64()),
                }
            )

        e = edges.map_batches(to_edge, batch_format="pyarrow").materialize()
        fwd_refs = _partition_refs(e, "src", n_parts)
        rev_refs = _partition_refs(e, "dst", n_parts)

        # same scheduler-headroom rationale as PageRankBSP.__init__
        total_cpus = ray.cluster_resources().get("CPU", float(n_parts))
        cpus_per_actor = max(
            0.01, min(1.0, int((total_cpus - 1) * 100 / n_parts) / 100)
        )
        Shard = ray.remote(num_cpus=cpus_per_actor)(_HITSShard)
        self.actors = [Shard.remote(p, n_parts) for p in range(n_parts)]
        ray.get(
            [
                a.load.remote(node_refs[p], fwd_refs[p], rev_refs[p])
                for p, a in enumerate(self.actors)
            ]
        )
        for direction in ("fwd", "rev"):
            struct = [
                a.structure.options(num_returns=n_parts).remote(direction)
                for a in self.actors
            ]
            if n_parts == 1:
                struct = [[s] for s in struct]
            ray.get(
                [
                    self.actors[j].gather_structure.remote(
                        direction, *[struct[i][j] for i in range(n_parts)]
                    )
                    for j in range(n_parts)
                ]
            )

    def run(self, iters: int = 5):
        """One full HITS: reset scores, ``iters`` auth+hub half-round
        pairs, return the (entity_id, auth, hub) Dataset."""
        import ray

        from .graphops import HITS_SCALE

        if not self.actors:
            raise RuntimeError("HITSBSP handle is closed")
        n_parts = self.n_parts
        init_fp = HITS_SCALE // max(self.n_nodes, 1)
        ray.get([a.reset.remote(init_fp) for a in self.actors])
        for _ in range(iters):
            for direction in ("fwd", "rev"):
                scat = [
                    a.scatter.options(num_returns=n_parts + 1).remote(
                        direction
                    )
                    for a in self.actors
                ]
                total = sum(ray.get([s[-1] for s in scat]))
                # same wraparound sentinel as graphops.hits
                if not 0 <= total < 2**62:
                    raise OverflowError(
                        "hits round total out of int64 safety range; "
                        "normalize edge weights first"
                    )
                div = max(total // HITS_SCALE, 1)
                ray.get(
                    [
                        self.actors[j].apply.remote(
                            direction,
                            div,
                            *[scat[i][j] for i in range(n_parts)],
                        )
                        for j in range(n_parts)
                    ]
                )
        result_refs = [a.result.remote() for a in self.actors]
        ray.get(result_refs)  # seal before any close()
        return ray.data.from_arrow_refs(result_refs)

    def bowtie(self, source: int, max_hops: int = 15):
        """Broder bow-tie regions around ``source`` over the SAME
        dual-direction shards — (region, n_nodes), identical to
        :func:`graphops.bowtie` for any source that is a graph node
        (the query seed always is: it's the top hub).  Both BFS passes
        ship frontier positions over the static structures; the final
        histogram reaches the driver as 4 scalars per shard."""
        import ray

        if not self.actors:
            raise RuntimeError("HITSBSP handle is closed")
        n_parts = self.n_parts
        ray.get([a.bt_reset.remote(source) for a in self.actors])
        for direction in ("fwd", "rev"):
            for hop in range(1, max_hops + 1):
                scat = [
                    a.bt_scatter.options(num_returns=n_parts).remote(
                        direction, hop
                    )
                    for a in self.actors
                ]
                if n_parts == 1:
                    scat = [[s] for s in scat]
                new = ray.get(
                    [
                        self.actors[j].bt_gather.remote(
                            direction,
                            hop,
                            *[scat[i][j] for i in range(n_parts)],
                        )
                        for j in range(n_parts)
                    ]
                )
                if sum(new) == 0:
                    break
        counts = ray.get([a.bt_counts.remote() for a in self.actors])
        totals = [sum(c[k] for c in counts) for k in range(4)]
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

    def betweenness(self, sources, max_depth: int = 6):
        """k-source Brandes betweenness over the SAME dual-direction
        shards — (entity_id, bc_fp, bc), bit-identical to
        :func:`graphops.betweenness` for the same ``sources`` on a
        DISTINCT-pair edge table (feed the handle deduped edges; see
        :func:`betweenness_bsp`).  Forward: ≤ ``max_depth``
        σ-propagation waves; backward: one wave per level, deepest
        first; driver state is one scalar per forward round."""
        import ray

        if not self.actors:
            raise RuntimeError("HITSBSP handle is closed")
        n_parts = self.n_parts
        ray.get(
            [a.bc_reset.remote(list(sources)) for a in self.actors]
        )
        deepest = 0
        for d in range(1, max_depth + 1):
            scat = [
                a.bc_fwd_scatter.options(num_returns=n_parts).remote(d)
                for a in self.actors
            ]
            if n_parts == 1:
                scat = [[s] for s in scat]
            new = ray.get(
                [
                    self.actors[j].bc_fwd_gather.remote(
                        d, *[scat[i][j] for i in range(n_parts)]
                    )
                    for j in range(n_parts)
                ]
            )
            if sum(new) == 0:
                break
            deepest = d
        for d in range(deepest - 1, -1, -1):
            scat = [
                a.bc_bwd_scatter.options(num_returns=n_parts).remote(d)
                for a in self.actors
            ]
            if n_parts == 1:
                scat = [[s] for s in scat]
            ray.get(
                [
                    self.actors[j].bc_bwd_gather.remote(
                        d, *[scat[i][j] for i in range(n_parts)]
                    )
                    for j in range(n_parts)
                ]
            )
        result_refs = [a.bc_result.remote() for a in self.actors]
        ray.get(result_refs)  # seal before any close()
        return ray.data.from_arrow_refs(result_refs)

    def close(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def __enter__(self) -> "HITSBSP":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def hits_bsp(edges, iters: int = 5, num_partitions: int | None = None):
    """edges(subj_id, obj_id, weight, …) → (entity_id, auth, hub):
    bit-identical to :func:`graphops.hits`, computed on a BSP actor
    pool — the scale path for the link-analysis complement to
    :func:`pagerank_bsp` (HITS iterates in both edge directions, so
    the dataflow plan pays twice PageRank's per-round exchanges).
    One-shot convenience over :class:`HITSBSP`."""
    with HITSBSP(edges, num_partitions=num_partitions) as h:
        return h.run(iters=iters)


#: distinct odd 64-bit salt per replica — XOR keeps every replica's id
#: space bijective and the copies disjoint with overwhelming probability
_REPLICA_SALT = 0x9E3779B97F4A7C15


def replicate_edges(edges, k: int, batch_size: int = 65536):
    """k deterministic disjoint copies of an edge table — the scaling
    stressor for the two-cluster-size criterion.

    The sandbox's bench web graph (~5M edges) finishes a BSP PageRank
    round in ~0.2 s, below the single-box barrier/messaging floor, so
    CPU scaling is invisible at any protocol; replicating the graph
    k-fold raises per-round compute until it dominates.  Node ids are
    XOR-salted per replica (id ⊕ i·SALT mod 2⁶⁴): bijective within a
    replica, so each copy preserves the exact degree distribution and
    rank structure of the original, and cross-replica id collisions are
    ~2⁻⁶⁴ per pair.  Purely a benchmark device — documented in
    BASELINE.md §Measured.

    Expansion happens INSIDE one ``map_batches`` (each input batch
    emits its k salted copies as one output table) rather than as a
    k-way ``Dataset.union`` — a 40-branch union drove Ray Data 2.49's
    streaming-executor scheduling loop into a busy-spin that dispatched
    nothing for >10 min at 32 CPUs, while the single-operator form
    streams.  ``batch_size`` bounds the k× output blow-up per block."""

    def rep(t: pa.Table) -> pa.Table:
        ids = {
            name: t.column(name)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
            for name in ("subj_id", "obj_id")
        }
        parts = []
        for i in range(k):
            m = np.uint64((_REPLICA_SALT * i) & 0xFFFFFFFFFFFFFFFF)
            cols = {}
            for name in t.column_names:
                if name in ids:
                    cols[name] = pa.array((ids[name] ^ m).view(np.int64))
                else:
                    cols[name] = t.column(name)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts).combine_chunks()

    return edges.map_batches(
        rep, batch_format="pyarrow", batch_size=batch_size
    )


def betweenness_bsp(
    edges,
    sources,
    max_depth: int = 6,
    num_partitions: int | None = None,
):
    """edges(subj_id, obj_id, …) → (entity_id, bc_fp, bc): k-source
    Brandes betweenness on the dual-direction BSP actor pool,
    bit-identical to :func:`graphops.betweenness` — forward σ-BFS
    pushes along the forward shards, the backward dependency recursion
    pulls along the reverse shards, all sums the twin's commutative
    int64 fixed-point ops (products bound-checked in Python ints —
    overflow raises, never wraps).  The edge table is deduplicated to
    DISTINCT (subj_id, obj_id) pairs first, exactly like the dataflow
    twin, so both plans share the ``kg_betweenness`` oracle.  The
    dataflow plan pays ~4 exchanges per BFS level plus ~3 per backward
    level; here the structures are static after one shard build."""
    from ..shuffle import hash_grouped

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj_id": t.column("subj_id").cast(pa.int64()),
                "obj_id": t.column("obj_id").cast(pa.int64()),
            }
        )

    dd = hash_grouped(
        edges.map_batches(to_pairs, batch_format="pyarrow"),
        ["subj_id", "obj_id"],
        [],
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: t.append_column(
            "weight", pa.array([1] * len(t), type=pa.int64())
        ),
        batch_format="pyarrow",
    )
    with HITSBSP(dd, num_partitions=num_partitions) as h:
        return h.betweenness(sources, max_depth=max_depth)


def bowtie_bsp(
    edges,
    source: int,
    max_hops: int = 15,
    num_partitions: int | None = None,
):
    """edges(subj_id, obj_id, …) → (region, n_nodes): the Broder
    bow-tie decomposition with BOTH reachability passes on ONE
    dual-direction BSP handle (:class:`HITSBSP` owns forward and
    reverse structures already) — identical output to
    :func:`graphops.bowtie` for any source that is a graph node, so
    one oracle covers both plans.  One shard build serves both passes
    (the first version built two single-direction handles and LOST to
    the dataflow twin on shallow-reach seeds); per hop the wire
    carries frontier positions, and the classify histogram reaches the
    driver as 4 scalars per shard."""
    with HITSBSP(edges, num_partitions=num_partitions) as h:
        return h.bowtie(source, max_hops=max_hops)


class _HyperBallShard:
    """One HyperBall BSP worker: owns the nodes with ``h(node) == part``
    and the edges with ``h(obj) == part`` — the ball recurrence
    ``ball(v) ∪= ball(u)`` for every edge (v, u) reads the LOCAL sketch
    at the edge's object end and messages the subject end, i.e. exactly
    :class:`_HITSShard`'s reverse direction, with an m-wide int64
    register payload (m = 2^p, the HyperBall precision knob — the
    message format parameterizes with it) and element-wise max as the
    combiner."""

    def __init__(self, part: int, n_parts: int, p_hb: int = 4):
        self.part = part
        self.n_parts = n_parts
        self.p_hb = p_hb
        self.m_hb = 1 << p_hb

    def load(self, node_refs, edge_refs) -> int:
        import ray

        from .hyperball import _init_registers

        nodes = [t for t in ray.get(list(node_refs)) if t.num_rows]
        if nodes:
            ids = (
                pa.concat_tables(nodes)
                .column("entity_id")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            self.ids = np.sort(ids, kind="stable")
        else:
            self.ids = np.empty(0, dtype=np.int64)
        init = _init_registers(
            pa.table({"entity_id": pa.array(self.ids, type=pa.int64())}),
            p=self.p_hb,
        )
        self.init_regs = np.stack(
            [
                init.column(c).to_numpy(zero_copy_only=False)
                for c in init.column_names[1:]
            ],
            axis=1,
        ).astype(np.int64) if len(self.ids) else np.empty(
            (0, self.m_hb), dtype=np.int64
        )
        self.regs = self.init_regs.copy()

        edges = [t for t in ray.get(list(edge_refs)) if t.num_rows]
        if edges:
            et = pa.concat_tables(edges)
            src = et.column("src").to_numpy(zero_copy_only=False)
            dst = et.column("dst").to_numpy(zero_copy_only=False)
            # messages flow dst-home → src-home; combine per distinct src
            spart = _part_of(src, self.n_parts)
            order = np.lexsort((src, spart))
            src, dst, spart = src[order], dst[order], spart[order]
            self.dst_idx = np.searchsorted(self.ids, dst).astype(np.intp)
            starts = np.flatnonzero(
                np.r_[True, src[1:] != src[:-1]]
            ).astype(np.intp)
            self.starts = starts
            self.msg_src = src[starts]
            self.jbounds = np.searchsorted(
                spart[starts], np.arange(self.n_parts + 1)
            )
        else:
            self.dst_idx = np.empty(0, dtype=np.intp)
            self.starts = np.empty(0, dtype=np.intp)
            self.msg_src = np.empty(0, dtype=np.int64)
            self.jbounds = np.zeros(self.n_parts + 1, dtype=np.int64)
        return len(self.ids)

    def structure(self):
        return [
            self.msg_src[self.jbounds[j]: self.jbounds[j + 1]]
            for j in range(self.n_parts)
        ]

    def gather_structure(self, *id_arrays) -> None:
        """Position-addressed incoming view: local node index of the
        p-th slot of sender i's static message is ``g_idx[g_off[i]+p]``
        — messages are SPARSE (position, sketch) pairs, the systolic
        form of the HyperBall paper (only counters that changed last
        round travel)."""
        arrs: list[np.ndarray] = []
        for a in id_arrays:
            if isinstance(a, list):  # n_parts == 1 flatten
                arrs.extend(np.asarray(x) for x in a)
            else:
                arrs.append(np.asarray(a))
        all_ids = (
            np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
        )
        self.g_idx = np.searchsorted(self.ids, all_ids).astype(np.intp)
        self.g_off = np.concatenate(
            ([0], np.cumsum([len(a) for a in arrs]))
        ).astype(np.intp)

    def reset(self, harmonic: bool = False) -> None:
        from .hyperball import _estimate_np

        self.regs = self.init_regs.copy()
        # round 1 must ship every sketch: the h = 0 state is all-new
        self.changed = np.ones(len(self.ids), dtype=bool)
        self.harmonic = harmonic
        self.round = 0
        if harmonic:
            self.harm = np.zeros(len(self.ids), dtype=np.float64)
            self.e_prev = (
                _estimate_np(self.regs)
                if len(self.ids)
                else np.empty(0, dtype=np.float64)
            )

    def scatter(self):
        """One round's outgoing sketches, PRUNED to runs touched by a
        changed counter: per active distinct source, (position into the
        static i→j slot structure, combined neighbor max).  Max is
        monotone, so a run with no changed contributor re-sends a value
        the receiver already holds — skipping it is state-identical."""
        n_edges = len(self.dst_idx)
        if not len(self.starts):
            return [
                (
                    np.empty(0, dtype=np.int64),
                    np.empty((0, self.m_hb), np.int64),
                )
                for _ in range(self.n_parts)
            ]
        lengths = np.diff(np.r_[self.starts, n_edges])
        run_active = np.logical_or.reduceat(
            self.changed[self.dst_idx], self.starts
        )
        edge_sel = np.repeat(run_active, lengths)
        act_lengths = lengths[run_active]
        sub_starts = np.concatenate(
            ([0], np.cumsum(act_lengths[:-1]))
        ).astype(np.intp)
        sums = (
            np.maximum.reduceat(
                self.regs[self.dst_idx[edge_sel]], sub_starts, axis=0
            )
            if len(act_lengths)
            else np.empty((0, self.m_hb), dtype=np.int64)
        )
        run_idx = np.flatnonzero(run_active).astype(np.int64)
        jb = self.jbounds
        out = []
        for j in range(self.n_parts):
            lo = int(np.searchsorted(run_idx, jb[j]))
            hi = int(np.searchsorted(run_idx, jb[j + 1]))
            out.append((run_idx[lo:hi] - jb[j], sums[lo:hi]))
        return out

    def gather(self, *values) -> int:
        """Apply incoming sparse sketches; track which home counters
        changed (next round's scatter prune + the driver's early-exit
        scalar)."""
        msgs: list[tuple] = []
        for v in values:
            if isinstance(v, list):  # n_parts == 1 flatten
                msgs.extend(v)
            else:
                msgs.append(v)
        idxs, vals = [], []
        for i, (pos, val) in enumerate(msgs):
            pos = np.asarray(pos)
            if len(pos):
                idxs.append(self.g_idx[self.g_off[i] + pos.astype(np.intp)])
                vals.append(np.asarray(val))
        self.changed = np.zeros(len(self.ids), dtype=bool)
        if not idxs:
            # still a round: the counter must advance or a later
            # round's harmonic divisor would be wrong
            self._accumulate_round()
            return 0
        all_idx = np.concatenate(idxs)
        all_val = np.concatenate(vals, axis=0)
        order = np.argsort(all_idx, kind="stable")
        sidx = all_idx[order]
        gstarts = np.flatnonzero(
            np.r_[True, sidx[1:] != sidx[:-1]]
        ).astype(np.intp)
        target = sidx[gstarts]
        merged = np.maximum.reduceat(all_val[order], gstarts, axis=0)
        old = self.regs[target]
        new = np.maximum(old, merged)
        diff = (new != old).any(axis=1)
        # fancy indexing yields a copy — assign, don't `out=`
        self.regs[target] = new
        self.changed[target[diff]] = True
        self._accumulate_round()
        return int(diff.sum())

    def _accumulate_round(self) -> None:
        """In harmonic mode fold this round's ball growth into the
        centrality sum — the same fixed op order as the dataflow twin:
        ``harm += (e_h − e_{h−1}) / h`` with h counted from 1.  A
        shard that received nothing still advances the round counter
        (its term is exactly 0)."""
        self.round += 1
        if not self.harmonic or not len(self.ids):
            return
        from .hyperball import _estimate_np

        e = _estimate_np(self.regs)
        self.harm = self.harm + (e - self.e_prev) / float(self.round)
        self.e_prev = e

    def result(self) -> pa.Table:
        from .hyperball import _estimate_batch, reg_cols

        if self.harmonic:
            return pa.table(
                {
                    "entity_id": pa.array(self.ids, type=pa.int64()),
                    "harmonic": pa.array(self.harm, type=pa.float64()),
                }
            )
        regs_tbl = pa.table(
            {
                "entity_id": pa.array(self.ids, type=pa.int64()),
                **{
                    c: pa.array(self.regs[:, j])
                    for j, c in enumerate(reg_cols(self.p_hb))
                },
            }
        )
        return _estimate_batch(regs_tbl)


def hyperball_bsp(
    edges,
    iters: int = 4,
    num_partitions: int | None = None,
    p: int = 4,
):
    """edges(subj_id, obj_id, …) → (entity_id, ball_est): bit-identical
    to :func:`hyperball.hyperball` at the same precision ``p``
    (element-wise register max commutes; the estimate expression is
    literally shared), computed on a BSP actor pool — the scale path:
    per round one scatter/gather wave of combined m-wide register
    messages (m = 2^p) over static shards (systolic: only counters that
    changed last round travel, and the loop exits at the fixed point),
    against the dataflow plan's per-round join + m-column grouped-Max
    exchanges."""
    return _hyperball_bsp_impl(
        edges, iters, num_partitions, "out", False, p_hb=p
    )


def harmonic_bsp(
    edges,
    iters: int = 4,
    num_partitions: int | None = None,
    p: int = 4,
):
    """edges(subj_id, obj_id, …) → (entity_id, harmonic): bit-identical
    to :func:`hyperball.harmonic_centrality` — the "in"-direction
    systolic rounds with the per-round ball-growth term folded into a
    per-shard accumulator (same fixed float op order), so the dataflow
    twin's end-of-run estimate-join chain disappears entirely."""
    return _hyperball_bsp_impl(
        edges, iters, num_partitions, "in", True, p_hb=p
    )


def _hyperball_bsp_impl(
    edges,
    iters: int,
    num_partitions: int | None,
    direction: str,
    harmonic: bool,
    p_hb: int = 4,
):
    import ray

    from ..shuffle import default_partitions, hash_grouped

    n_parts = num_partitions or default_partitions()
    read_col, emit_col = (
        ("obj_id", "subj_id") if direction == "out" else ("subj_id", "obj_id")
    )

    def to_pairs(t: pa.Table) -> pa.Table:
        # "dst" is the READ end (whose sketch the edge forwards),
        # "src" the receiving end — matches _HyperBallShard's layout
        return pa.table(
            {
                "src": t.column(emit_col).cast(pa.int64()),
                "dst": t.column(read_col).cast(pa.int64()),
            }
        )

    pairs = hash_grouped(
        edges.map_batches(to_pairs, batch_format="pyarrow"),
        ["src", "dst"],
        [],
        num_partitions=num_partitions,
    ).materialize()

    def to_nodes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"entity_id": pa.array([], type=pa.int64())})
        both = pa.concat_arrays(
            [
                t.column("src").combine_chunks(),
                t.column("dst").combine_chunks(),
            ]
        )
        return pa.table({"entity_id": both.unique()})

    nodes = hash_grouped(
        pairs.map_batches(to_nodes, batch_format="pyarrow"),
        ["entity_id"],
        [],
        num_partitions=num_partitions,
    )
    node_refs = _partition_refs(nodes, "entity_id", n_parts)
    edge_refs = _partition_refs(pairs, "dst", n_parts)

    total_cpus = ray.cluster_resources().get("CPU", float(n_parts))
    cpus_per_actor = max(
        0.01, min(1.0, int((total_cpus - 1) * 100 / n_parts) / 100)
    )
    Shard = ray.remote(num_cpus=cpus_per_actor)(_HyperBallShard)
    actors = [Shard.remote(p, n_parts, p_hb) for p in range(n_parts)]
    try:
        ray.get(
            [
                a.load.remote(node_refs[p], edge_refs[p])
                for p, a in enumerate(actors)
            ]
        )
        struct = [
            a.structure.options(num_returns=n_parts).remote()
            for a in actors
        ]
        if n_parts == 1:
            struct = [[s] for s in struct]
        ray.get(
            [
                actors[j].gather_structure.remote(
                    *[struct[i][j] for i in range(n_parts)]
                )
                for j in range(n_parts)
            ]
        )
        ray.get([a.reset.remote(harmonic) for a in actors])
        for _ in range(iters):
            scat = [
                a.scatter.options(num_returns=n_parts).remote()
                for a in actors
            ]
            if n_parts == 1:
                scat = [[s] for s in scat]
            n_changed = ray.get(
                [
                    actors[j].gather.remote(
                        *[scat[i][j] for i in range(n_parts)]
                    )
                    for j in range(n_parts)
                ]
            )
            if sum(n_changed) == 0:
                break  # every ball is closed: further rounds are no-ops
        result_refs = [a.result.remote() for a in actors]
        ray.get(result_refs)  # seal before the actors die
        return ray.data.from_arrow_refs(result_refs)
    finally:
        for a in actors:
            ray.kill(a)
