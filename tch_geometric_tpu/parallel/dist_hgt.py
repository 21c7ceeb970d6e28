"""Distributed HGT sampling over a PARTITIONED heterogeneous topology.

The last sampler family of VERDICT item 2.  The reference's HGT sampler
(/root/reference/src/algo/hgt_sampling.rs:138-278) keeps a GLOBAL per-type
budget (node -> {score, timestamp}) updated per edge and samples
``num_samples[type][layer]`` nodes with probability ~ score^2 over the
whole budget — state that in a partitioned world must itself be sharded.
Design:

* **Budget tables shard with the ownership rule** (owner of node v is
  ``v % P``): per-device ``(Np_t,)`` arrays for score / budget-time /
  in-sample flag / output slot, living INSIDE the shard_map program.
* **update_budget** (rs:27-102) is two routed exchanges per relation:
  (1) targets route to their adjacency owner, who draws the <=50-capped
  uniform neighbor subset (keyed by the target's output-slot uid) and
  returns (src gid, effective ts) pairs; (2) the resulting score
  contributions route one-way to each SOURCE's budget owner, who
  accumulates.  Scores are **integer fixed-point** (``SCORE_ONE //
  capped_deg``): integer adds are exact and order-independent, so the
  budget state — and therefore the whole sample — is bit-identical for
  any device count and any request arrival order (float accumulation
  would make rounding depend on P).  Budget timestamps reduce by MAX
  (order-independent; the reference's last-write-wins is scatter-order
  dependent even on one device — an unpinnable quirk we replace).
* **sample_from** (rs:104-135, prob ~ score^2) is a distributed top-k:
  each owner Gumbel-perturbs ``2*log(score)`` of its rows with noise
  keyed by GLOBAL node id, takes a local top-n, all_gathers the P*n
  candidates, and every device reduces the identical global top-n.
* **Induced adjacency** (rs:244-268): sampled dst nodes route to their
  adjacency owner for the <=50 in-edge subset; the candidate sources
  route to THEIR budget owners for the (in_sample, output slot) lookup.

Work splits across devices by slicing every replicated target list
``P``-ways; outputs: per-type node lists replicated, per-rel COO carried
with a leading device axis (concatenate device blocks for the global COO).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..sampling import rng
from ..sampling.hgt import MAX_NEIGHBORS
from ..sampling.neighbor import _select_lanes
from ..utils.types import NAN_TIMESTAMP, rel_key
from .dist_sampling import (PartitionedGraph, _route_to_owners, _uid_floyd,
                            _uid_keys, _uid_uniform_lane_topk,
                            build_partitioned_graph, exchange_rounds,
                            resolve_num_rounds)

NEG_INF = float("-inf")
SCORE_ONE = 1 << 14   # fixed-point unit: contribution = SCORE_ONE // deg_cap
#   (quantizes 1/deg to ~6e-5 relative — the law divergence is documented;
#   what it buys is EXACT, order-independent integer accumulation, hence
#   bit-identical budgets for any device count)


def build_partitioned_hetero(col_ptrs, row_indices, edge_types, num_parts,
                             *, edge_timestamps=None,
                             node_counts: Dict[str, int] = None):
    """Per-relation interleave partitioning: dict rel -> PartitionedGraph.

    ``node_counts[t]`` must cover every type (budget tables need |V_t|)."""
    rels = {}
    for e in edge_types:
        r = rel_key(tuple(e))
        ts = None
        if edge_timestamps is not None and r in edge_timestamps:
            ts = edge_timestamps[r]
        rels[r] = build_partitioned_graph(
            np.asarray(col_ptrs[r]), np.asarray(row_indices[r]), num_parts,
            edge_timestamps=ts)
    return rels


def _pad_to(x, n, fill=0):
    x = np.asarray(x)
    out = np.full((n,), fill, x.dtype)
    out[: x.shape[0]] = x
    return out


@struct.dataclass
class StackedRels:
    """All relations' :class:`PartitionedGraph` arrays stacked on a leading
    relation axis (padded to common shapes) — the ``lax.scan``-able form
    that collapses the per-relation HLO unroll (VERDICT r4 item 4: the
    partitioned-HGT program's op count is linear in #relations; one scanned
    body compiles once instead of R times).

    The owner-block axis stays FIRST (relation axis second) so the same
    ``PartitionSpec(axis)`` that shards a per-relation dict shards this
    container — trainers and samplers need no spec changes.  Inside
    shard_map each device sees ``(Np, R, ...)`` blocks.  Optional
    attribute groups (ell / timestamps) must be uniformly present or
    absent across relations — :func:`stack_partitioned_rels` enforces
    (dropping ELL for all when mixed).
    """

    ldeg: jax.Array       # (P*Np, R) i32
    lstart: jax.Array     # (P*Np, R)
    gstart: jax.Array     # (P*Np, R)
    lindices: jax.Array   # (P*Emax, R)
    ell: Optional[jax.Array] = None      # (P*Np, R, W)
    lts: Optional[jax.Array] = None     # (P*Emax, R)
    ell_ts: Optional[jax.Array] = None   # (P*Np, R, W-2)
    num_rels: int = struct.field(pytree_node=False, default=0)
    num_parts: int = struct.field(pytree_node=False, default=1)
    rows_per_part: int = struct.field(pytree_node=False, default=0)
    local_edge_cap: int = struct.field(pytree_node=False, default=0)
    max_degree: int = struct.field(pytree_node=False, default=0)


def stack_partitioned_rels(rels: Dict[str, PartitionedGraph],
                           rel_order: Sequence[str]) -> StackedRels:
    """Host-side: stack per-relation graphs into one padded pytree.

    ``rel_order`` fixes the relation axis (use the sorted rel_specs order
    the sampler iterates).  Padding: rows/edges per owner block to the max
    across relations (padded rows have degree 0 — never sampled), ELL
    width to the max (deg/start stay in the trailing two lanes).
    """
    gs = [rels[r] for r in rel_order]
    Pn = gs[0].num_parts
    assert all(g.num_parts == Pn for g in gs)
    R = len(gs)
    Npm = max(g.rows_per_part for g in gs)
    Em = max(g.local_edge_cap for g in gs)
    has_ell = all(g.ell is not None for g in gs)
    has_ts = all(g.lts is not None for g in gs)
    Wm = max((np.asarray(g.ell).shape[1] for g in gs), default=0) \
        if has_ell else 0

    def blocks(a, n_r, n_m, fill=0):
        a = np.asarray(a).reshape(Pn, n_r, *np.asarray(a).shape[1:])
        out = np.full((Pn, n_m) + a.shape[2:], fill, a.dtype)
        out[:, :n_r] = a
        return out.reshape((Pn * n_m,) + a.shape[2:])

    ldeg = np.stack([blocks(g.ldeg, g.rows_per_part, Npm)
                     for g in gs], axis=1)
    lstart = np.stack([blocks(g.lstart, g.rows_per_part, Npm)
                       for g in gs], axis=1)
    gstart = np.stack([blocks(g.gstart, g.rows_per_part, Npm)
                       for g in gs], axis=1)
    lind = np.stack([blocks(g.lindices, g.local_edge_cap, Em)
                     for g in gs], axis=1)
    lts = (np.stack([blocks(g.lts, g.local_edge_cap, Em,
                            fill=NAN_TIMESTAMP) for g in gs], axis=1)
           if has_ts else None)
    ell = ell_ts = None
    if has_ell:
        rows = []
        for g in gs:
            e = blocks(g.ell, g.rows_per_part, Npm)     # (P*Npm, W_r)
            W_r = e.shape[1]
            out = np.zeros((e.shape[0], Wm), e.dtype)
            out[:, : W_r - 2] = e[:, : W_r - 2]
            out[:, -2] = e[:, -2]
            out[:, -1] = e[:, -1]
            rows.append(out)
        ell = np.stack(rows, axis=1)
        if has_ts and all(g.ell_ts is not None for g in gs):
            rows = []
            for g in gs:
                e = blocks(g.ell_ts, g.rows_per_part, Npm,
                           fill=NAN_TIMESTAMP)
                out = np.full((e.shape[0], Wm - 2), NAN_TIMESTAMP, e.dtype)
                out[:, : e.shape[1]] = e
                rows.append(out)
            ell_ts = np.stack(rows, axis=1)
    return StackedRels(
        ldeg=ldeg, lstart=lstart, gstart=gstart, lindices=lind, ell=ell,
        lts=lts, ell_ts=ell_ts, num_rels=R, num_parts=Pn, rows_per_part=Npm,
        local_edge_cap=Em, max_degree=max(g.max_degree for g in gs))


def put_stacked_rels(rels: Dict[str, PartitionedGraph],
                     rel_order: Sequence[str], mesh: Mesh,
                     axis: str = "data") -> StackedRels:
    """Stack host-side and device_put sharded ``P(axis)`` (same spec as
    the per-relation dict: the owner-block axis is first)."""
    from jax.sharding import NamedSharding
    stk = stack_partitioned_rels(rels, rel_order)
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), sh), stk)


def _owner_subset(g: PartitionedGraph, keys, rows, M: int):
    """Uniform <=M-subset of each row's in-edges (owner side).

    Returns (src (B,M), eptr (B,M), ets (B,M), ok (B,M), ncount (B,)).
    ``ets`` is the raw edge timestamp (NAN if the graph carries none)."""
    B = rows.shape[0]
    if g.ell is not None:
        row = g.ell[rows]
        lanes, deg, starts = row[:, :-2], row[:, -2], row[:, -1]
        pos, ok = _uid_uniform_lane_topk(keys, deg, lanes.shape[-1], M)
        cpos = jnp.clip(pos, 0, lanes.shape[-1] - 1)
        src = _select_lanes(lanes, cpos)
        eptr = starts[:, None] + pos
        ets = (_select_lanes(g.ell_ts[rows], cpos) if g.ell_ts is not None
               else jnp.full((B, M), NAN_TIMESTAMP, jnp.int32))
    else:
        deg = g.ldeg[rows]
        pos, ok = _uid_floyd(keys, deg, M)
        pos, ok = pos.reshape(-1, M), ok.reshape(-1, M)
        lptr = jnp.clip(g.lstart[rows][:, None] + pos, 0,
                        g.lindices.shape[0] - 1)
        src = g.lindices[lptr]
        eptr = g.gstart[rows][:, None] + pos
        ets = (g.lts[lptr] if g.lts is not None
               else jnp.full((B, M), NAN_TIMESTAMP, jnp.int32))
    ncount = jnp.minimum(deg, M)
    return src, eptr, ets, ok, ncount


def _scatter_route(payload, owner, valid, apply_fn, state, *, axis,
                   num_parts, capacity, num_rounds):
    """One-way routed scatter: requests go to owners, ``apply_fn(state,
    recv (P, C, Q), in_round_mask (P, C)) -> state`` folds them in.  No
    response path.  Returns (state, overflow)."""
    router = _route_to_owners(owner, valid, num_parts, capacity)
    rounds = (num_rounds if router.max_rounds is None
              else min(num_rounds, router.max_rounds))
    carried = jnp.zeros_like(valid)
    for rnd in range(rounds):
        in_round = router.in_round(rnd)
        req = router.scatter(jnp.concatenate(
            [payload, in_round.astype(jnp.int32)[:, None]], axis=-1), rnd)
        recv = jax.lax.all_to_all(req, axis, 0, 0)
        state = apply_fn(state, recv[..., :-1], recv[..., -1] != 0)
        carried = carried | in_round
    return state, (valid & ~carried).sum()


def _owner_subset_at(stk: StackedRels, ri, keys, rows, M: int):
    """Stacked twin of :func:`_owner_subset`: arrays carry a trailing
    relation axis, ``ri`` a (traced) relation index — scalar (the scan
    path) or a per-row ``(B,)`` vector (the fused path, where one batched
    exchange carries requests of every relation together).

    Every fetch flattens (rows, rel) into ONE index (``rows * R + ri`` on
    the reshaped ``(Np*R, ...)`` view) so the accesses stay on the gather
    engine's fast single-level row path — 2-D advanced indexing
    ``arr[rows, ri]`` lowers to a general two-index-vector gather that
    measured 2.2x slower at hetero bench scale (174 vs ~80 ms/step)."""
    B = rows.shape[0]
    R = stk.ldeg.shape[-1]
    ri = jnp.asarray(ri, jnp.int32)
    ri_col = ri if ri.ndim == 0 else ri[:, None]   # broadcasts over (B, M)
    fidx = rows * R + ri
    if stk.ell is not None:
        W = stk.ell.shape[-1]
        row = stk.ell.reshape(-1, W)[fidx]
        lanes, deg, starts = row[:, :-2], row[:, -2], row[:, -1]
        pos, ok = _uid_uniform_lane_topk(keys, deg, lanes.shape[-1], M)
        cpos = jnp.clip(pos, 0, lanes.shape[-1] - 1)
        src = _select_lanes(lanes, cpos)
        eptr = starts[:, None] + pos
        ets = (_select_lanes(
            stk.ell_ts.reshape(-1, stk.ell_ts.shape[-1])[fidx], cpos)
               if stk.ell_ts is not None
               else jnp.full((B, M), NAN_TIMESTAMP, jnp.int32))
    else:
        deg = stk.ldeg.reshape(-1)[fidx]
        pos, ok = _uid_floyd(keys, deg, M)
        pos, ok = pos.reshape(-1, M), ok.reshape(-1, M)
        lptr = jnp.clip(stk.lstart.reshape(-1)[fidx][:, None] + pos, 0,
                        stk.lindices.shape[0] - 1)
        src = stk.lindices.reshape(-1)[lptr * R + ri_col]
        eptr = stk.gstart.reshape(-1)[fidx][:, None] + pos
        ets = (stk.lts.reshape(-1)[lptr * R + ri_col]
               if stk.lts is not None
               else jnp.full((B, M), NAN_TIMESTAMP, jnp.int32))
    ncount = jnp.minimum(deg, M)
    return src, eptr, ets, ok, ncount


def _dist_hgt_device_stacked(key, stk: StackedRels, seeds, seed_ts, *,
                             dev, meta, axis: str, fused: bool = False):
    """Scan-over-relations twin of :func:`_dist_hgt_device` (VERDICT r4
    item 4): the per-relation exchange bodies compile ONCE as lax.scan
    bodies over :class:`StackedRels` instead of unrolling R times, cutting
    the program's op count from ~linear in #relations to ~constant.

    ``fused=True`` goes further: instead of scanning one relation per
    step (which serializes the exchange bodies XLA otherwise overlaps —
    the measured 2.2x step-time cost of the scan), ALL relations' requests
    ride ONE batched exchange per phase, each request row carrying its
    relation index.  This is exact because everything that crosses
    relations commutes: budget scores are integer fixed-point ``.add``
    (order-independent), budget timestamps are ``.max``, and every draw is
    keyed by fold(key, phase, ri, uid) — not by execution order.  Op count
    stays ~constant in R (no scan, no unroll) and the step gets R-times
    larger (better-utilized) collectives and owner-side batches instead of
    R sequential small ones.

    Law: draws are keyed identically (fold(key, phase, ri) + global slot
    uid), so outputs are bit-identical to the unrolled path whenever
    neither plan overflows (pinned by tests/test_dist_hgt.py::
    test_stacked_matches_unrolled); capacities use the max slice width
    across relations (>= the unrolled per-relation capacities, so the
    stacked plan can only overflow less; the fused plan pools capacity
    ``R * cap`` across relations and can only overflow less still).
    """
    (node_types, rel_specs, num_samples_t, num_hops, timerange,
     node_counts_t, seed_caps_t, capacity_factor, num_rounds, Pn) = meta
    num_samples = dict(num_samples_t)
    node_counts = dict(node_counts_t)
    seed_caps = dict(seed_caps_t)
    M = MAX_NEIGHBORS
    T = len(node_types)
    R = len(rel_specs)
    t_index = {t: i for i, t in enumerate(node_types)}
    src_idx = jnp.asarray([t_index[s] for _r, s, _d in rel_specs],
                          jnp.int32)
    dst_idx = jnp.asarray([t_index[d] for _r, _s, d in rel_specs],
                          jnp.int32)
    counts_arr = jnp.asarray([node_counts[t] for t in node_types],
                             jnp.int32)

    def cap_for(L):
        return max(1, min(int(np.ceil(capacity_factor * L / Pn)), L))

    # ---- sharded budget tables, stacked (T, Npm) ----
    Np = {t: -(-node_counts[t] // Pn) if node_counts[t] else 1
          for t in node_types}
    Npm = max(Np.values())
    Np_arr = jnp.asarray([Np[t] for t in node_types], jnp.int32)
    # `+ dev * 0` stamps the tables as device-varying from birth so the
    # lax.scan carries type-check under shard_map's varying-axis system
    # (the bodies are dev-dependent; an unvarying init would mismatch)
    dv = jnp.asarray(dev, jnp.int32) * 0
    score = jnp.zeros((T, Npm), jnp.int32) + dv
    btime = jnp.full((T, Npm), NAN_TIMESTAMP, jnp.int32) + dv
    in_sample = jnp.zeros((T, Npm), jnp.bool_) | (dv != 0)
    local_id = jnp.zeros((T, Npm), jnp.int32) + dv
    gid_row = jnp.arange(Npm, dtype=jnp.int32) * Pn + dev   # (Npm,)

    # ---- replicated output lists (dicts, as in the unrolled path) ----
    caps = {t: [seed_caps[t]] + [num_samples[t][l] for l in range(num_hops)]
            for t in node_types}
    base = {t: np.cumsum([0] + caps[t]).tolist() for t in node_types}
    nodes, node_ts, node_valid = {}, {}, {}
    for ti, t in enumerate(node_types):
        C = base[t][-1]
        n = jnp.zeros((C,), jnp.int32)
        ts_ = jnp.full((C,), NAN_TIMESTAMP, jnp.int32)
        val = jnp.zeros((C,), jnp.bool_)
        if seed_caps[t]:
            n = n.at[: seed_caps[t]].set(seeds[t])
            ts_ = ts_.at[: seed_caps[t]].set(seed_ts[t])
            val = val.at[: seed_caps[t]].set(seeds[t] >= 0)
        nodes[t], node_ts[t], node_valid[t] = n, ts_, val
        if seed_caps[t]:
            mine = (seeds[t] % Pn == dev) & (seeds[t] >= 0)
            loc = jnp.where(mine, seeds[t] // Pn, Npm)
            in_sample = in_sample.at[ti, loc].set(True, mode="drop")
            local_id = local_id.at[ti, loc].set(
                jnp.arange(seed_caps[t], dtype=jnp.int32), mode="drop")

    overflow = jnp.zeros((), jnp.int32)

    def _stack_typed(d, fill, m_max):
        outs = []
        for t in node_types:
            v = d[t]
            outs.append(jnp.pad(v.astype(jnp.int32),
                                (0, m_max - v.shape[0]),
                                constant_values=fill))
        return jnp.stack(outs)

    def update_budget(upd_key, new_nodes, new_ts, new_valid):
        """rs:27-102: ONE scanned body over the relation axis."""
        nonlocal score, btime, overflow
        m_max = max(v.shape[0] for v in new_nodes.values())
        if m_max == 0 or R == 0:
            return
        mp_max = m_max // Pn
        m_arr = jnp.asarray([new_nodes[t].shape[0] for t in node_types],
                            jnp.int32)
        nn = _stack_typed(new_nodes, 0, m_max)           # (T, m_max)
        nts = _stack_typed(new_ts, NAN_TIMESTAMP, m_max)
        nok = jnp.stack([jnp.pad(new_valid[t],
                                 (0, m_max - new_valid[t].shape[0]))
                         for t in node_types])
        cap1 = cap_for(mp_max)
        cap2 = cap_for(mp_max * M)
        lane = jnp.arange(mp_max, dtype=jnp.int32)

        def pre(ri):
            """Request-side per-relation prep (shared by scan and fused)."""
            dst_i = dst_idx[ri]
            mp_r = m_arr[dst_i] // Pn
            off = dev * mp_r
            tgt = jax.lax.dynamic_slice(nn, (dst_i, off), (1, mp_max))[0]
            tts = jax.lax.dynamic_slice(nts, (dst_i, off), (1, mp_max))[0]
            tok = jax.lax.dynamic_slice(nok, (dst_i, off),
                                        (1, mp_max))[0] & (lane < mp_r)
            uid = off + lane
            dmax = jnp.maximum(counts_arr[dst_i] - 1, 0)
            gid = jnp.clip(tgt, 0, dmax)
            owner = (gid % Pn).astype(jnp.int32)
            local = (gid // Pn).astype(jnp.int32)
            return local, uid, tts, tok, owner

        def fused_update():
            """ALL relations in ONE exchange pair: rows carry ri."""
            ris = jnp.arange(R, dtype=jnp.int32)
            local, uid, tts_r, tok, owner = jax.vmap(pre)(ris)  # (R, mp)
            riB = jnp.broadcast_to(ris[:, None], (R, mp_max))
            payload = jnp.stack([local, uid, tts_r, riB],
                                axis=-1).reshape(R * mp_max, 4)

            def owner_fn(recv):
                Pm, C, _ = recv.shape
                rows = jnp.clip(recv[..., 0].reshape(-1), 0, Npm - 1)
                uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
                t_ts = recv[..., 2].reshape(-1)
                ris_r = recv[..., 3].reshape(-1)
                # keys == scan path's fold(fold(upd_key, ri), uid) per row
                keys = jax.vmap(lambda r_, u: jax.random.fold_in(
                    jax.random.fold_in(upd_key, r_), u))(
                        ris_r.astype(jnp.uint32), uids)
                srcs, _eptr, ets, ok, ncount = _owner_subset_at(
                    stk, ris_r, keys, rows, M)
                vts = jnp.where(ets == NAN_TIMESTAMP, t_ts[:, None], ets)
                if timerange is not None:
                    lo, hi = timerange
                    ok = ok & ((vts == NAN_TIMESTAMP)
                               | ((vts >= lo) & (vts < hi)))
                srcs = jnp.where(ok, srcs, -1)
                out = jnp.concatenate([srcs, vts, ncount[:, None]],
                                      axis=-1)
                return out.reshape(Pm, C, 2 * M + 1)

            res, got, ovf = exchange_rounds(
                payload, owner.reshape(-1), tok.reshape(-1), owner_fn,
                axis=axis, num_parts=Pn, capacity=R * cap1,
                num_rounds=num_rounds, ret_cols=2 * M + 1)
            srcs = res[:, :M]                     # (R*mp_max, M)
            vts = res[:, M: 2 * M]
            ncount = res[:, 2 * M]
            cok = (srcs >= 0) & got[:, None]

            fsrc = srcs.reshape(-1)
            fvts = vts.reshape(-1)
            fnc = jnp.broadcast_to(ncount[:, None],
                                   (R * mp_max, M)).reshape(-1)
            fok = cok.reshape(-1)
            fsrc_i = jnp.broadcast_to(
                src_idx[riB.reshape(-1)][:, None],
                (R * mp_max, M)).reshape(-1)
            smax = jnp.maximum(counts_arr[fsrc_i] - 1, 0)
            sgid = jnp.clip(fsrc, 0, smax)
            sowner = (sgid % Pn).astype(jnp.int32)
            slocal = (sgid // Pn).astype(jnp.int32)

            def apply_fn(state, recv, in_round):
                sc_, bt_ = state
                loc = recv[..., 0].reshape(-1)
                nc = recv[..., 1].reshape(-1)
                ts_ = recv[..., 2].reshape(-1)
                si = jnp.clip(recv[..., 3].reshape(-1), 0, T - 1)
                ok = in_round.reshape(-1)
                floc = si * Npm + jnp.clip(loc, 0, Npm - 1)
                ok = ok & ~in_sample.reshape(-1)[floc]
                idx = jnp.where(ok, floc, T * Npm)       # drop lane
                contrib = jnp.where(ok, SCORE_ONE // jnp.maximum(nc, 1), 0)
                sc_ = sc_.reshape(-1).at[idx].add(
                    contrib, mode="drop").reshape(T, Npm)
                bt_ = bt_.reshape(-1).at[idx].max(
                    ts_, mode="drop").reshape(T, Npm)
                return sc_, bt_

            pay2 = jnp.stack([slocal, fnc, fvts, fsrc_i], axis=-1)
            st, ovf2 = _scatter_route(
                pay2, sowner, fok, apply_fn, (score, btime), axis=axis,
                num_parts=Pn, capacity=R * cap2, num_rounds=num_rounds)
            return st[0], st[1], ovf + ovf2

        if fused:
            sc_n, bt_n, ovf_new = fused_update()
            score, btime = sc_n, bt_n
            overflow = overflow + ovf_new
            return

        def body(carry, ri):
            sc, bt, ovf_c = carry
            src_i = src_idx[ri]
            local, uid, tts, tok, owner = pre(ri)
            rk = rng.fold(upd_key, ri)

            def owner_fn(recv):
                Pm, C, _ = recv.shape
                rows = jnp.clip(recv[..., 0].reshape(-1), 0, Npm - 1)
                uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
                t_ts = recv[..., 2].reshape(-1)
                keys = _uid_keys(rk, uids)
                srcs, _eptr, ets, ok, ncount = _owner_subset_at(
                    stk, ri, keys, rows, M)
                vts = jnp.where(ets == NAN_TIMESTAMP, t_ts[:, None], ets)
                if timerange is not None:
                    lo, hi = timerange
                    ok = ok & ((vts == NAN_TIMESTAMP)
                               | ((vts >= lo) & (vts < hi)))
                srcs = jnp.where(ok, srcs, -1)
                out = jnp.concatenate([srcs, vts, ncount[:, None]],
                                      axis=-1)
                return out.reshape(Pm, C, 2 * M + 1)

            payload = jnp.stack([local, uid, tts], axis=-1)
            res, got, ovf = exchange_rounds(
                payload, owner, tok, owner_fn, axis=axis, num_parts=Pn,
                capacity=cap1, num_rounds=num_rounds, ret_cols=2 * M + 1)
            srcs = res[:, :M]
            vts = res[:, M: 2 * M]
            ncount = res[:, 2 * M]
            cok = (srcs >= 0) & got[:, None]

            fsrc = srcs.reshape(-1)
            fvts = vts.reshape(-1)
            fnc = jnp.broadcast_to(ncount[:, None],
                                   (mp_max, M)).reshape(-1)
            fok = cok.reshape(-1)
            smax = jnp.maximum(counts_arr[src_i] - 1, 0)
            sgid = jnp.clip(fsrc, 0, smax)
            sowner = (sgid % Pn).astype(jnp.int32)
            slocal = (sgid // Pn).astype(jnp.int32)

            def apply_fn(state, recv, in_round):
                # flat (T*Npm) addressing keeps every table access on the
                # single-level gather/scatter fast path (drop lane is the
                # whole-table bound)
                sc_, bt_ = state
                loc = recv[..., 0].reshape(-1)
                nc = recv[..., 1].reshape(-1)
                ts_ = recv[..., 2].reshape(-1)
                ok = in_round.reshape(-1)
                floc = src_i * Npm + jnp.clip(loc, 0, Npm - 1)
                ok = ok & ~in_sample.reshape(-1)[floc]
                idx = jnp.where(ok, floc, T * Npm)       # drop lane
                contrib = jnp.where(ok, SCORE_ONE // jnp.maximum(nc, 1), 0)
                sc_ = sc_.reshape(-1).at[idx].add(
                    contrib, mode="drop").reshape(T, Npm)
                bt_ = bt_.reshape(-1).at[idx].max(
                    ts_, mode="drop").reshape(T, Npm)
                return sc_, bt_

            pay2 = jnp.stack([slocal, fnc, fvts], axis=-1)
            (sc, bt), ovf2 = _scatter_route(
                pay2, sowner, fok, apply_fn, (sc, bt), axis=axis,
                num_parts=Pn, capacity=cap2, num_rounds=num_rounds)
            return (sc, bt, ovf_c + ovf + ovf2), None

        (score, btime, ovf_new), _ = jax.lax.scan(
            body, (score, btime, jnp.zeros((), jnp.int32) + dv),
            jnp.arange(R, dtype=jnp.int32))
        overflow = overflow + ovf_new

    # ---- seed budget init (rs:183-196) ----
    update_budget(rng.fold(key, 0),
                  {t: nodes[t][: seed_caps[t]] for t in node_types},
                  {t: node_ts[t][: seed_caps[t]] for t in node_types},
                  {t: node_valid[t][: seed_caps[t]] for t in node_types})

    # ---- per-hop distributed score^2 sampling (unrolled over T: small) --
    for layer in range(num_hops):
        new_nodes, new_ts_d, new_valid = {}, {}, {}
        for ti, t in enumerate(node_types):
            n = num_samples[t][layer]
            if n == 0 or node_counts[t] == 0:
                z = jnp.zeros((n,), jnp.int32)
                new_nodes[t] = z
                new_ts_d[t] = jnp.full((n,), NAN_TIMESTAMP, jnp.int32)
                new_valid[t] = jnp.zeros((n,), bool)
                continue
            Npt = Np[t]
            sc_t = score[ti, :Npt]
            bt_t = btime[ti, :Npt]
            gid_t = gid_row[:Npt]
            tkey = rng.fold(key, 1, layer, ti)
            noise = jax.vmap(lambda g: jax.random.gumbel(
                jax.random.fold_in(tkey, g), (), jnp.float32))(
                    gid_t.astype(jnp.uint32))
            live = (sc_t > 0) & (gid_t < node_counts[t])
            logits = jnp.where(
                live,
                2.0 * jnp.log(jnp.maximum(sc_t.astype(jnp.float32), 1.0))
                + noise,
                NEG_INF)
            k_loc = min(n, Npt)
            lv, li = jax.lax.top_k(logits, k_loc)
            cand_gid = gid_t[li]
            cand_ts = bt_t[li]
            av = jax.lax.all_gather(lv, axis).reshape(-1)
            ag = jax.lax.all_gather(cand_gid, axis).reshape(-1)
            at = jax.lax.all_gather(cand_ts, axis).reshape(-1)
            gv, gi = jax.lax.top_k(av, n)
            valid = jnp.isfinite(gv)
            chosen = jnp.where(valid, ag[gi], 0)
            chosen_ts = jnp.where(valid, at[gi], NAN_TIMESTAMP)
            new_nodes[t], new_ts_d[t], new_valid[t] = (chosen, chosen_ts,
                                                       valid)

            slot = base[t][layer + 1] + jnp.arange(n, dtype=jnp.int32)
            nodes[t] = nodes[t].at[slot].set(chosen)
            node_ts[t] = node_ts[t].at[slot].set(chosen_ts)
            node_valid[t] = node_valid[t].at[slot].set(valid)
            mine = valid & (chosen % Pn == dev)
            loc = jnp.where(mine, chosen // Pn, Npm)
            score = score.at[ti, loc].set(0, mode="drop")
            in_sample = in_sample.at[ti, loc].set(True, mode="drop")
            local_id = local_id.at[ti, loc].set(slot, mode="drop")

        if layer < num_hops - 1:
            update_budget(rng.fold(key, 2, layer), new_nodes, new_ts_d,
                          new_valid)

    # ---- induced adjacency (rs:244-268): ONE scanned body over R ----
    C_max = max((base[t][-1] for t in node_types), default=0)
    Cp_max = C_max // Pn if C_max else 0
    rows_o, cols_o, eptr_o, ev_o = {}, {}, {}, {}
    if R and Cp_max:
        C_arr = jnp.asarray([base[t][-1] for t in node_types], jnp.int32)
        nodes_stk = _stack_typed(nodes, 0, C_max)
        nv_stk = jnp.stack([jnp.pad(node_valid[t],
                                    (0, C_max - node_valid[t].shape[0]))
                            for t in node_types])
        cap_a = cap_for(Cp_max)
        cap_m = cap_for(Cp_max * M)
        lane = jnp.arange(Cp_max, dtype=jnp.int32)

        def adj_pre(ri):
            dst_i = dst_idx[ri]
            Cp_r = C_arr[dst_i] // Pn
            off = dev * Cp_r
            tgt = jax.lax.dynamic_slice(nodes_stk, (dst_i, off),
                                        (1, Cp_max))[0]
            tok = jax.lax.dynamic_slice(nv_stk, (dst_i, off),
                                        (1, Cp_max))[0] & (lane < Cp_r)
            uid = off + lane
            dmax = jnp.maximum(counts_arr[dst_i] - 1, 0)
            gid = jnp.clip(tgt, 0, dmax)
            owner = (gid % Pn).astype(jnp.int32)
            local = (gid // Pn).astype(jnp.int32)
            return local, uid, tok, owner

        def adj_body(ovf_c, ri):
            src_i = src_idx[ri]
            local, uid, tok, owner = adj_pre(ri)
            rk = rng.fold(key, 3, ri)

            def adj_owner_fn(recv):
                Pm, Cc, _ = recv.shape
                rows = jnp.clip(recv[..., 0].reshape(-1), 0, Npm - 1)
                uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
                keys = _uid_keys(rk, uids)
                srcs, eptr, _ets, ok, _nc = _owner_subset_at(
                    stk, ri, keys, rows, M)
                srcs = jnp.where(ok, srcs, -1)
                return jnp.concatenate([srcs, eptr], axis=-1).reshape(
                    Pm, Cc, 2 * M)

            payload = jnp.stack([local, uid], axis=-1)
            res, got, ovf = exchange_rounds(
                payload, owner, tok, adj_owner_fn, axis=axis,
                num_parts=Pn, capacity=cap_a, num_rounds=num_rounds,
                ret_cols=2 * M)
            srcs = res[:, :M]
            eptr = res[:, M:]
            cok = (srcs >= 0) & got[:, None]

            fsrc = srcs.reshape(-1)
            fok = cok.reshape(-1)
            smax = jnp.maximum(counts_arr[src_i] - 1, 0)
            sgid = jnp.clip(fsrc, 0, smax)
            sowner = (sgid % Pn).astype(jnp.int32)
            slocal = (sgid // Pn).astype(jnp.int32)

            def mem_owner_fn(recv):
                Pm, Cc, _ = recv.shape
                floc = src_i * Npm + jnp.clip(recv[..., 0].reshape(-1), 0,
                                              Npm - 1)
                flag = in_sample.reshape(-1)[floc]
                lid = local_id.reshape(-1)[floc]
                return jnp.stack([flag.astype(jnp.int32), lid],
                                 axis=-1).reshape(Pm, Cc, 2)

            res2, got2, ovf2 = exchange_rounds(
                jnp.stack([slocal], axis=-1), sowner, fok, mem_owner_fn,
                axis=axis, num_parts=Pn, capacity=cap_m,
                num_rounds=num_rounds, ret_cols=2)
            keep = fok & got2 & (res2[:, 0] != 0)
            out_rows = jnp.where(keep, res2[:, 1], 0)
            out_cols = jnp.broadcast_to(uid[:, None],
                                        (Cp_max, M)).reshape(-1)
            out_eptr = eptr.reshape(-1)
            return ovf_c + ovf + ovf2, (out_rows, out_cols, out_eptr, keep)

        def adj_fused():
            """ALL relations' adjacency + membership probes in one
            exchange pair each (rows carry ri / the src TYPE index)."""
            ris = jnp.arange(R, dtype=jnp.int32)
            local, uid, tok, owner = jax.vmap(adj_pre)(ris)  # (R, Cp_max)
            riB = jnp.broadcast_to(ris[:, None], (R, Cp_max))
            key3 = rng.fold(key, 3)
            payload = jnp.stack([local, uid, riB],
                                axis=-1).reshape(R * Cp_max, 3)

            def adj_owner_fn(recv):
                Pm, Cc, _ = recv.shape
                rows = jnp.clip(recv[..., 0].reshape(-1), 0, Npm - 1)
                uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
                ris_r = recv[..., 2].reshape(-1)
                keys = jax.vmap(lambda r_, u: jax.random.fold_in(
                    jax.random.fold_in(key3, r_), u))(
                        ris_r.astype(jnp.uint32), uids)
                srcs, eptr, _ets, ok, _nc = _owner_subset_at(
                    stk, ris_r, keys, rows, M)
                srcs = jnp.where(ok, srcs, -1)
                return jnp.concatenate([srcs, eptr], axis=-1).reshape(
                    Pm, Cc, 2 * M)

            res, got, ovf = exchange_rounds(
                payload, owner.reshape(-1), tok.reshape(-1), adj_owner_fn,
                axis=axis, num_parts=Pn, capacity=R * cap_a,
                num_rounds=num_rounds, ret_cols=2 * M)
            srcs = res[:, :M]
            eptr = res[:, M:]
            cok = (srcs >= 0) & got[:, None]

            fsrc = srcs.reshape(-1)
            fok = cok.reshape(-1)
            fsrc_i = jnp.broadcast_to(
                src_idx[riB.reshape(-1)][:, None],
                (R * Cp_max, M)).reshape(-1)
            smax = jnp.maximum(counts_arr[fsrc_i] - 1, 0)
            sgid = jnp.clip(fsrc, 0, smax)
            sowner = (sgid % Pn).astype(jnp.int32)
            slocal = (sgid // Pn).astype(jnp.int32)

            def mem_owner_fn(recv):
                Pm, Cc, _ = recv.shape
                si = jnp.clip(recv[..., 1].reshape(-1), 0, T - 1)
                floc = si * Npm + jnp.clip(recv[..., 0].reshape(-1), 0,
                                           Npm - 1)
                flag = in_sample.reshape(-1)[floc]
                lid = local_id.reshape(-1)[floc]
                return jnp.stack([flag.astype(jnp.int32), lid],
                                 axis=-1).reshape(Pm, Cc, 2)

            res2, got2, ovf2 = exchange_rounds(
                jnp.stack([slocal, fsrc_i], axis=-1), sowner, fok,
                mem_owner_fn, axis=axis, num_parts=Pn,
                capacity=R * cap_m, num_rounds=num_rounds, ret_cols=2)
            keep_f = fok & got2 & (res2[:, 0] != 0)
            rows_f = jnp.where(keep_f, res2[:, 1], 0)
            cols_f = jnp.broadcast_to(
                uid.reshape(R * Cp_max)[:, None],
                (R * Cp_max, M)).reshape(-1)
            sh = (R, Cp_max * M)
            return (ovf + ovf2, rows_f.reshape(sh), cols_f.reshape(sh),
                    eptr.reshape(sh), keep_f.reshape(sh))

        if fused:
            (ovf_new, rows_s, cols_s, eptr_s, keep_s) = adj_fused()
        else:
            ovf_new, (rows_s, cols_s, eptr_s, keep_s) = jax.lax.scan(
                adj_body, jnp.zeros((), jnp.int32) + dv,
                jnp.arange(R, dtype=jnp.int32))
        overflow = overflow + ovf_new
        for ri, (r, src, dst) in enumerate(rel_specs):
            C = base[dst][-1]
            if C == 0 or node_counts[dst] == 0 or node_counts[src] == 0:
                z = jnp.zeros((0,), jnp.int32)
                rows_o[r], cols_o[r], eptr_o[r] = z, z, z
                ev_o[r] = jnp.zeros((0,), bool)
                continue
            n_r = (C // Pn) * M
            rows_o[r] = rows_s[ri, :n_r]
            cols_o[r] = cols_s[ri, :n_r]
            eptr_o[r] = eptr_s[ri, :n_r]
            ev_o[r] = keep_s[ri, :n_r]
    else:
        for r, _s, _d in rel_specs:
            z = jnp.zeros((0,), jnp.int32)
            rows_o[r], cols_o[r], eptr_o[r] = z, z, z
            ev_o[r] = jnp.zeros((0,), bool)

    return (nodes, node_ts, node_valid, rows_o, cols_o, eptr_o, ev_o,
            overflow)


def _dist_hgt_device(key, rels, seeds, seed_ts, *, dev, meta, axis: str,
                     fused: bool = True):
    """Engine dispatch: a per-relation dict runs the unrolled program; a
    :class:`StackedRels` runs the relation-fused program (default) or the
    scan-over-relations program (``fused=False`` — kept for A/B: it was
    VERDICT r4 item 4's first fix, measured 2.2x slower per step)."""
    if isinstance(rels, StackedRels):
        return _dist_hgt_device_stacked(key, rels, seeds, seed_ts, dev=dev,
                                        meta=meta, axis=axis, fused=fused)
    return _dist_hgt_device_unrolled(key, rels, seeds, seed_ts, dev=dev,
                                     meta=meta, axis=axis)


def _dist_hgt_device_unrolled(key, rels: Dict[str, PartitionedGraph],
                              seeds, seed_ts, *, dev, meta, axis: str):
    (node_types, rel_specs, num_samples_t, num_hops, timerange,
     node_counts_t, seed_caps_t, capacity_factor, num_rounds, Pn) = meta
    num_samples = dict(num_samples_t)
    node_counts = dict(node_counts_t)
    seed_caps = dict(seed_caps_t)
    M = MAX_NEIGHBORS

    def cap_for(L):
        return max(1, min(int(np.ceil(capacity_factor * L / Pn)), L))

    # ---- sharded budget tables (one block per device) ----
    Np = {t: -(-node_counts[t] // Pn) if node_counts[t] else 1
          for t in node_types}
    score = {t: jnp.zeros((Np[t],), jnp.int32) for t in node_types}
    btime = {t: jnp.full((Np[t],), NAN_TIMESTAMP, jnp.int32)
             for t in node_types}
    in_sample = {t: jnp.zeros((Np[t],), jnp.bool_) for t in node_types}
    local_id = {t: jnp.zeros((Np[t],), jnp.int32) for t in node_types}
    # my rows' global ids (interleaved ownership: row j owns node j*P + dev)
    gid_of = {t: jnp.arange(Np[t], dtype=jnp.int32) * Pn + dev
              for t in node_types}

    # ---- replicated output lists ----
    caps = {t: [seed_caps[t]] + [num_samples[t][l] for l in range(num_hops)]
            for t in node_types}
    base = {t: np.cumsum([0] + caps[t]).tolist() for t in node_types}
    nodes, node_ts, node_valid = {}, {}, {}
    for t in node_types:
        C = base[t][-1]
        n = jnp.zeros((C,), jnp.int32)
        ts_ = jnp.full((C,), NAN_TIMESTAMP, jnp.int32)
        val = jnp.zeros((C,), jnp.bool_)
        if seed_caps[t]:
            n = n.at[: seed_caps[t]].set(seeds[t])
            ts_ = ts_.at[: seed_caps[t]].set(seed_ts[t])
            val = val.at[: seed_caps[t]].set(seeds[t] >= 0)
        nodes[t], node_ts[t], node_valid[t] = n, ts_, val
        # mark my seeds in-sample with their output slot
        mine = (seeds[t] % Pn == dev) & (seeds[t] >= 0) if seed_caps[t] else \
            jnp.zeros((0,), bool)
        if seed_caps[t]:
            loc = jnp.where(mine, seeds[t] // Pn, Np[t])
            in_sample[t] = in_sample[t].at[loc].set(True, mode="drop")
            local_id[t] = local_id[t].at[loc].set(
                jnp.arange(seed_caps[t], dtype=jnp.int32), mode="drop")

    overflow = jnp.zeros((), jnp.int32)

    def update_budget(upd_key, new_nodes, new_ts, new_valid):
        """rs:27-102 over the partition: two exchanges per relation."""
        nonlocal score, btime, overflow
        for ri, (r, src, dst) in enumerate(rel_specs):
            m = new_nodes[dst].shape[0]
            if m == 0 or node_counts[dst] == 0 or node_counts[src] == 0:
                continue
            g = rels[r]
            # each device requests for its mp-slice of the replicated list
            mp = m // Pn
            sl = slice(0, mp)  # static size; dynamic offset below
            off = dev * mp
            tgt = jax.lax.dynamic_slice(new_nodes[dst], (off,), (mp,))
            tts = jax.lax.dynamic_slice(new_ts[dst], (off,), (mp,))
            tok = jax.lax.dynamic_slice(new_valid[dst], (off,), (mp,))
            uid = off + jnp.arange(mp, dtype=jnp.int32)

            gid = jnp.clip(tgt, 0, max(node_counts[dst] - 1, 0))
            owner = (gid % Pn).astype(jnp.int32)
            local = (gid // Pn).astype(jnp.int32)
            rk = rng.fold(upd_key, ri)

            def owner_fn(recv, g=g, rk=rk):
                Pm, C, _ = recv.shape
                rows = jnp.clip(recv[..., 0].reshape(-1), 0,
                                g.ldeg.shape[0] - 1)
                uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
                t_ts = recv[..., 2].reshape(-1)
                keys = _uid_keys(rk, uids)
                srcs, _eptr, ets, ok, ncount = _owner_subset(g, keys, rows, M)
                # effective ts: NaN inherits the target's ts (rs:82-85)
                vts = jnp.where(ets == NAN_TIMESTAMP, t_ts[:, None], ets)
                if timerange is not None:
                    lo, hi = timerange
                    ok = ok & ((vts == NAN_TIMESTAMP)
                               | ((vts >= lo) & (vts < hi)))
                srcs = jnp.where(ok, srcs, -1)
                out = jnp.concatenate(
                    [srcs, vts, ncount[:, None]], axis=-1)
                return out.reshape(Pm, C, 2 * M + 1)

            payload = jnp.stack([local, uid, tts.astype(jnp.int32)], axis=-1)
            res, got, ovf = exchange_rounds(
                payload, owner, tok, owner_fn, axis=axis, num_parts=Pn,
                capacity=cap_for(mp), num_rounds=num_rounds,
                ret_cols=2 * M + 1)
            overflow = overflow + ovf
            srcs = res[:, :M]                      # (mp, M) gid or -1
            vts = res[:, M: 2 * M]
            ncount = res[:, 2 * M]
            cok = (srcs >= 0) & got[:, None]

            # --- route contributions to the SOURCE-type budget owners ---
            fsrc = srcs.reshape(-1)
            fvts = vts.reshape(-1)
            fnc = jnp.broadcast_to(ncount[:, None], (mp, M)).reshape(-1)
            fok = cok.reshape(-1)
            sgid = jnp.clip(fsrc, 0, max(node_counts[src] - 1, 0))
            sowner = (sgid % Pn).astype(jnp.int32)
            slocal = (sgid // Pn).astype(jnp.int32)

            def apply_fn(state, recv, in_round, src=src):
                sc, bt = state
                loc = recv[..., 0].reshape(-1)
                nc = recv[..., 1].reshape(-1)
                ts_ = recv[..., 2].reshape(-1)
                ok = in_round.reshape(-1)
                # Line 4 (rs:98): already-sampled sources don't re-enter
                ok = ok & ~in_sample[src][jnp.clip(loc, 0, Np[src] - 1)]
                idx = jnp.where(ok, loc, Np[src])      # drop lane
                contrib = jnp.where(ok, SCORE_ONE //
                                    jnp.maximum(nc, 1), 0)
                sc = sc.at[idx].add(contrib, mode="drop")
                bt = bt.at[idx].max(ts_, mode="drop")
                return sc, bt

            pay2 = jnp.stack([slocal, fnc, fvts.astype(jnp.int32)], axis=-1)
            (score[src], btime[src]), ovf2 = _scatter_route(
                pay2, sowner, fok, apply_fn, (score[src], btime[src]),
                axis=axis, num_parts=Pn, capacity=cap_for(mp * M),
                num_rounds=num_rounds)
            overflow = overflow + ovf2

    # ---- seed budget init (rs:183-196) ----
    update_budget(rng.fold(key, 0),
                  {t: nodes[t][: seed_caps[t]] for t in node_types},
                  {t: node_ts[t][: seed_caps[t]] for t in node_types},
                  {t: node_valid[t][: seed_caps[t]] for t in node_types})

    # ---- per-hop distributed score^2 sampling ----
    for layer in range(num_hops):
        new_nodes, new_ts_d, new_valid = {}, {}, {}
        for ti, t in enumerate(node_types):
            n = num_samples[t][layer]
            if n == 0 or node_counts[t] == 0:
                z = jnp.zeros((n,), jnp.int32)
                new_nodes[t] = z
                new_ts_d[t] = jnp.full((n,), NAN_TIMESTAMP, jnp.int32)
                new_valid[t] = jnp.zeros((n,), bool)
                continue
            # per-node Gumbel noise keyed by GLOBAL id: P-invariant
            tkey = rng.fold(key, 1, layer, ti)
            noise = jax.vmap(lambda g: jax.random.gumbel(
                jax.random.fold_in(tkey, g), (), jnp.float32))(
                    gid_of[t].astype(jnp.uint32))
            live = (score[t] > 0) & (gid_of[t] < node_counts[t])
            logits = jnp.where(
                live,
                2.0 * jnp.log(jnp.maximum(score[t].astype(jnp.float32),
                                          1.0)) + noise,
                NEG_INF)
            k_loc = min(n, Np[t])
            lv, li = jax.lax.top_k(logits, k_loc)
            cand_gid = gid_of[t][li]
            cand_ts = btime[t][li]
            # all devices see all candidates -> identical global top-n
            av = jax.lax.all_gather(lv, axis).reshape(-1)
            ag = jax.lax.all_gather(cand_gid, axis).reshape(-1)
            at = jax.lax.all_gather(cand_ts, axis).reshape(-1)
            gv, gi = jax.lax.top_k(av, n)
            valid = jnp.isfinite(gv)
            chosen = jnp.where(valid, ag[gi], 0)
            chosen_ts = jnp.where(valid, at[gi], NAN_TIMESTAMP)
            new_nodes[t], new_ts_d[t], new_valid[t] = chosen, chosen_ts, valid

            slot = base[t][layer + 1] + jnp.arange(n, dtype=jnp.int32)
            nodes[t] = nodes[t].at[slot].set(chosen)
            node_ts[t] = node_ts[t].at[slot].set(chosen_ts)
            node_valid[t] = node_valid[t].at[slot].set(valid)
            # move out of budget on the owner (rs:213-221)
            mine = valid & (chosen % Pn == dev)
            loc = jnp.where(mine, chosen // Pn, Np[t])
            score[t] = score[t].at[loc].set(0, mode="drop")
            in_sample[t] = in_sample[t].at[loc].set(True, mode="drop")
            local_id[t] = local_id[t].at[loc].set(slot, mode="drop")

        if layer < num_hops - 1:
            update_budget(rng.fold(key, 2, layer), new_nodes, new_ts_d,
                          new_valid)

    # ---- induced adjacency (rs:244-268) ----
    rows_o, cols_o, eptr_o, ev_o = {}, {}, {}, {}
    for ri, (r, src, dst) in enumerate(rel_specs):
        C = base[dst][-1]
        if C == 0 or node_counts[dst] == 0 or node_counts[src] == 0:
            z = jnp.zeros((0,), jnp.int32)
            rows_o[r], cols_o[r], eptr_o[r] = z, z, z
            ev_o[r] = jnp.zeros((0,), bool)
            continue
        g = rels[r]
        Cp = C // Pn
        off = dev * Cp
        tgt = jax.lax.dynamic_slice(nodes[dst], (off,), (Cp,))
        tok = jax.lax.dynamic_slice(node_valid[dst], (off,), (Cp,))
        uid = off + jnp.arange(Cp, dtype=jnp.int32)
        gid = jnp.clip(tgt, 0, max(node_counts[dst] - 1, 0))
        owner = (gid % Pn).astype(jnp.int32)
        local = (gid // Pn).astype(jnp.int32)
        rk = rng.fold(key, 3, ri)

        def adj_owner_fn(recv, g=g, rk=rk):
            Pm, Cc, _ = recv.shape
            rows = jnp.clip(recv[..., 0].reshape(-1), 0, g.ldeg.shape[0] - 1)
            uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
            keys = _uid_keys(rk, uids)
            srcs, eptr, _ets, ok, _nc = _owner_subset(g, keys, rows, M)
            srcs = jnp.where(ok, srcs, -1)
            return jnp.concatenate([srcs, eptr], axis=-1).reshape(
                Pm, Cc, 2 * M)

        payload = jnp.stack([local, uid], axis=-1)
        res, got, ovf = exchange_rounds(
            payload, owner, tok, adj_owner_fn, axis=axis, num_parts=Pn,
            capacity=cap_for(Cp), num_rounds=num_rounds, ret_cols=2 * M)
        overflow = overflow + ovf
        srcs = res[:, :M]
        eptr = res[:, M:]
        cok = (srcs >= 0) & got[:, None]

        # membership + slot lookup at the source owners (rs:247: only
        # in-sample sources are kept)
        fsrc = srcs.reshape(-1)
        fok = cok.reshape(-1)
        sgid = jnp.clip(fsrc, 0, max(node_counts[src] - 1, 0))
        sowner = (sgid % Pn).astype(jnp.int32)
        slocal = (sgid // Pn).astype(jnp.int32)

        def mem_owner_fn(recv, src=src):
            Pm, Cc, _ = recv.shape
            loc = jnp.clip(recv[..., 0].reshape(-1), 0, Np[src] - 1)
            flag = in_sample[src][loc]
            lid = local_id[src][loc]
            return jnp.stack([flag.astype(jnp.int32), lid],
                             axis=-1).reshape(Pm, Cc, 2)

        res2, got2, ovf2 = exchange_rounds(
            jnp.stack([slocal], axis=-1), sowner, fok, mem_owner_fn,
            axis=axis, num_parts=Pn, capacity=cap_for(Cp * M),
            num_rounds=num_rounds, ret_cols=2)
        overflow = overflow + ovf2
        keep = fok & got2 & (res2[:, 0] != 0)
        rows_o[r] = jnp.where(keep, res2[:, 1], 0)
        cols_o[r] = jnp.broadcast_to(uid[:, None], (Cp, M)).reshape(-1)
        eptr_o[r] = eptr.reshape(-1)
        ev_o[r] = keep

    return (nodes, node_ts, node_valid, rows_o, cols_o, eptr_o, ev_o,
            overflow)


def dist_hgt_sample(key, rels: Dict[str, PartitionedGraph], edge_types,
                    inputs, num_samples, num_hops: int, mesh: Mesh, *,
                    node_counts: Dict[str, int],
                    input_timestamps=None,
                    timerange: Optional[Tuple[int, int]] = None,
                    node_types: Optional[Sequence[str]] = None,
                    axis: str = "data", capacity_factor: float = 2.0,
                    num_rounds: Optional[int] = None,
                    stacked=False):
    """Distributed HGT sampling (public entry point).

    ``stacked`` selects the program structure over relations:

    * ``False`` — unrolled: every relation's exchange bodies inline
      (program size linear in R).
    * ``True`` / ``"fused"`` — :class:`StackedRels` with ALL relations'
      requests riding ONE batched exchange per phase (rows carry their
      relation index): program size ~constant in R AND the collectives
      are R-times larger/fewer instead of serialized.
    * ``"scan"`` — :class:`StackedRels` with a lax.scan over relations
      (VERDICT r4 item 4's first fix; kept for A/B — ~48% fewer HLO ops
      than unrolled but a measured ~2.2x step cost from serializing the
      bodies XLA otherwise overlaps).

    Outputs are bit-identical across all three (draws keyed by
    fold(key, phase, ri) + global slot uid; pinned by
    tests/test_dist_hgt.py::test_stacked_matches_unrolled).

    Inputs mirror :func:`~..sampling.hgt.sample_hgt`; ``rels`` from
    :func:`build_partitioned_hetero`.  Returns ``(HGTSample-shaped tuple,
    overflow)``: per-type ``nodes/node_ts/node_valid`` replicated arrays,
    per-rel ``rows/cols/eptr/edge_valid`` with a leading device axis
    (device d's block covers dst slots [d*C/P, (d+1)*C/P)); ``rows`` hold
    output-slot indices into the dst/src type's node list, as the
    reference emits (src/python.rs:457-481).
    """
    Pn = int(mesh.shape[axis])
    if node_types is None:
        node_types = sorted({t for e in edge_types for t in (e[0], e[2])})
    rel_specs = tuple(sorted((rel_key(tuple(e)), e[0], e[2])
                             for e in edge_types))
    for r, _s, _d in rel_specs:
        assert rels[r].num_parts == Pn, (r, rels[r].num_parts, Pn)

    # pad every per-type list to a multiple of P (work splits P-ways) and
    # make per-layer caps P-divisible too
    seeds_p, ts_p, seed_caps = {}, {}, {}
    for t in node_types:
        v = np.asarray(inputs.get(t, np.zeros((0,), np.int64)))
        m = -(-max(v.shape[0], 0) // Pn) * Pn if v.shape[0] else 0
        seed_caps[t] = int(m)
        seeds_p[t] = _pad_to(v.astype(np.int32), m, fill=-1)
        tsv = None
        if input_timestamps is not None and t in input_timestamps:
            tsv = np.asarray(input_timestamps[t], np.int32)
        ts_p[t] = (_pad_to(tsv, m, fill=NAN_TIMESTAMP) if tsv is not None
                   else np.full((m,), NAN_TIMESTAMP, np.int32))
    ns = {t: tuple(-(-int(x) // Pn) * Pn for x in num_samples[t])
          for t in node_types}

    meta = (tuple(node_types), rel_specs,
            tuple((t, ns[t]) for t in node_types), int(num_hops),
            None if timerange is None else (int(timerange[0]),
                                            int(timerange[1])),
            tuple((t, int(node_counts[t])) for t in node_types),
            tuple(sorted(seed_caps.items())), float(capacity_factor),
            resolve_num_rounds(num_rounds, Pn), Pn)

    assert stacked in (False, True, "fused", "scan"), stacked
    run = _dist_hgt_fn(mesh, axis, meta, bool(stacked),
                       stacked != "scan")
    from .multihost import put_partitioned
    with mesh:
        if stacked:
            rels_put = put_stacked_rels(rels, [r for r, _s, _d in rel_specs],
                                        mesh, axis)
        else:
            rels_put = {r: put_partitioned(rels[r], mesh, P(axis))
                        for r, _s, _d in rel_specs}
        seeds_put = {t: put_partitioned(
            jnp.asarray(np.tile(seeds_p[t], (Pn, 1))), mesh, P(axis))
            for t in node_types}
        ts_put = {t: put_partitioned(
            jnp.asarray(np.tile(ts_p[t], (Pn, 1))), mesh, P(axis))
            for t in node_types}
        out = run(key, rels_put, seeds_put, ts_put)
    nodes, node_ts, node_valid, rows, cols, eptr, ev, ovf = out
    # per-type lists are computed identically on every device (all_gathered
    # candidates); keep block 0 as THE replicated copy
    take0 = lambda d: {k: v[0] for k, v in d.items()}
    return ((take0(nodes), take0(node_ts), take0(node_valid),
             rows, cols, eptr, ev), ovf)


@functools.lru_cache(maxsize=64)
def _dist_hgt_fn(mesh, axis, meta, stacked: bool = False,
                 fused: bool = True):
    repl, shard = P(), P(axis)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(repl, shard, shard, shard),
        out_specs=(shard, shard, shard, shard, shard, shard, shard, shard))
    def run(key, rels, seeds, seed_ts):
        dev = jax.lax.axis_index(axis)
        seeds = {t: v[0] for t, v in seeds.items()}
        seed_ts = {t: v[0] for t, v in seed_ts.items()}
        (nodes, node_ts, node_valid, rows, cols, eptr, ev,
         ovf) = _dist_hgt_device(key, rels, seeds, seed_ts, dev=dev,
                                 meta=meta, axis=axis, fused=fused)
        add_dev = lambda d: {k: v[None] for k, v in d.items()}
        return (add_dev(nodes), add_dev(node_ts), add_dev(node_valid),
                add_dev(rows), add_dev(cols), add_dev(eptr), add_dev(ev),
                ovf[None])

    return run
