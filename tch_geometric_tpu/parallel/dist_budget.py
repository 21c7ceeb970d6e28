"""Distributed per-node budget sampling over a PARTITIONED topology.

BASELINE config 5's sampler over the edge-partitioned graph.  The reference
budget sampler (/root/reference/src/algo/budget_sampling.rs:155-265) gives
every frontier node a candidate budget of up to ``MAX_NEIGHBORS=50``
reservoir-capped in-edges (rs:63-126) and then uniformly samples ``k`` of
the temporally-admissible candidates (rs:128-152).  Both stages only need
the frontier node's OWN adjacency row, so in the partitioned world the
whole per-node budget pipeline runs owner-side inside one request/response
exchange per hop (:func:`~.dist_sampling.exchange_rounds`):

  requester ships ``(local_row, uid, filter_state)`` -> owner fills the
  50-candidate budget (uniform k-subset of the row: lane-top-k on the ELL
  table, Floyd for wider rows), applies the runtime temporal filter
  (rs:13-38: half-open window on ``v_ts - state``, NaN passes), uniformly
  Gumbel-top-k's ``k`` admissible candidates, and returns
  ``(node, eptr, new_state, valid) * k``.

Draws are keyed by the request's GLOBAL tree-slot uid (one fill stream +
one select stream per hop), so sampled trees are bit-identical for any
device count — the invariance pinned in tests/test_dist_budget.py.

:func:`dist_budget_sample` is the homogeneous projection (one node type,
one relation — BASELINE config 5's shape); :func:`dist_budget_sample_hetero`
is the full TYPED sampler: per-relation owner exchanges return raw
candidates and the cross-relation uniform selection runs requester-side
(candidates from R different owners meet only at the requester), with
child uids CHAINED from parent uids so draws stay device-count invariant
despite per-device relation-interleaved layouts.  Divergences from
reference quirks follow sampling/budget.py: Floyd samples from ALL edges
(not the first 50), real global edge ptrs, populated layer offsets.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..sampling import rng
from ..sampling.budget import MAX_NEIGHBORS
from ..sampling.neighbor import NeighborSample, _layer_layout, _select_lanes
from ..utils.types import NAN_TIMESTAMP
from .dist_sampling import (PartitionedGraph, _uid_floyd, _uid_keys,
                            _uid_uniform_lane_topk, exchange_rounds,
                            resolve_num_rounds)

NEG_INF = float("-inf")  # python literal: package import must not
#   create device arrays (jax.distributed.initialize needs an
#   uninitialised backend; see parallel/multihost.py)


def _budget_filter(filter_static, w_t, v_t):
    """TemporalFilter::filter, runtime-struct variant (budget_sampling.rs:
    20-29): NaN passes; half-open window on the (signed) delta."""
    if filter_static is None:
        return jnp.ones_like(v_t, dtype=jnp.bool_)
    (lo, hi), fwd, _rel = filter_static
    d = v_t - w_t
    if not fwd:
        d = -d
    ok = jnp.logical_and(d >= lo, d < hi)
    nan = jnp.logical_or(w_t == NAN_TIMESTAMP, v_t == NAN_TIMESTAMP)
    return jnp.logical_or(nan, ok)


def _budget_mutate(filter_static, w_t, v_t):
    """TemporalFilter::mutate (rs:31-38): relative freezes the root state."""
    if filter_static is None:
        return v_t
    _w, _f, relative = filter_static
    return jnp.broadcast_to(w_t, v_t.shape) if relative else v_t


def _owner_budget(g: PartitionedGraph, key_hop, recv, k: int,
                  filter_static):
    """Owner-side budget fill + select for received requests.

    ``recv (P, C, 3)``: [local_row, uid, state].  Returns
    ``(node, eptr, new_state, valid)`` each (P, C, k)."""
    Pn, C, _ = recv.shape
    rows = jnp.clip(recv[..., 0].reshape(-1), 0, g.ldeg.shape[0] - 1)
    uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
    state = recv[..., 2].reshape(-1)
    fill_keys = _uid_keys(rng.fold(key_hop, 1), uids)
    sel_keys = _uid_keys(rng.fold(key_hop, 2), uids)
    B = rows.shape[0]
    M = MAX_NEIGHBORS

    # ---- Budget::update: uniform <=50-candidate subset of the row ----
    if g.ell is not None:
        row = g.ell[rows]
        lanes, deg, starts = row[:, :-2], row[:, -2], row[:, -1]
        pos, pvalid = _uid_uniform_lane_topk(fill_keys, deg,
                                             lanes.shape[-1], M)
        cpos = jnp.clip(pos, 0, lanes.shape[-1] - 1)
        cand_v = _select_lanes(lanes, cpos)
        cand_e = starts[:, None] + pos
        cand_ts = (_select_lanes(g.ell_ts[rows], cpos)
                   if g.ell_ts is not None
                   else jnp.full((B, M), NAN_TIMESTAMP, jnp.int32))
    else:
        deg = g.ldeg[rows]
        lstart = g.lstart[rows]
        pos, pvalid = _uid_floyd(fill_keys, deg, M)
        pos, pvalid = pos.reshape(-1, M), pvalid.reshape(-1, M)
        lptr = jnp.clip(lstart[:, None] + pos, 0, g.lindices.shape[0] - 1)
        cand_v = g.lindices[lptr]
        cand_e = g.gstart[rows][:, None] + pos
        cand_ts = (g.lts[lptr] if g.lts is not None
                   else jnp.full((B, M), NAN_TIMESTAMP, jnp.int32))

    # candidate ts: NaN edge ts falls back to the frontier state (budget.py /
    # budget_sampling.rs:82-85 semantics)
    vts = jnp.where(cand_ts == NAN_TIMESTAMP, state[:, None], cand_ts)
    cand_ok = jnp.logical_and(pvalid,
                              _budget_filter(filter_static, state[:, None],
                                             vts))
    new_ts = _budget_mutate(filter_static, state[:, None], vts)

    # ---- Budget::sample: uniform Gumbel-top-k over valid candidates ----
    noise = jax.vmap(lambda kk: jax.random.gumbel(kk, (M,), jnp.float32))(
        sel_keys)
    score = jnp.where(cand_ok, noise, NEG_INF)
    vals, sel = jax.lax.top_k(score, min(k, M))
    valid = jnp.isfinite(vals)
    if k > M:
        sel = jnp.pad(sel, ((0, 0), (0, k - M)))
        valid = jnp.pad(valid, ((0, 0), (0, k - M)))
    sel = jnp.clip(sel, 0, M - 1)
    node = jnp.take_along_axis(cand_v, sel, axis=1)
    eptr = jnp.take_along_axis(cand_e, sel, axis=1)
    nts = jnp.take_along_axis(new_ts, sel, axis=1)

    shape = (Pn, C, k)
    return (node.reshape(shape).astype(jnp.int32),
            eptr.reshape(shape).astype(jnp.int32),
            nts.reshape(shape).astype(jnp.int32),
            valid.reshape(shape))


def _dist_budget_device(key, g: PartitionedGraph, seeds_local, seed_ts, *,
                        dev, fanouts: Tuple[int, ...], axis: str,
                        num_parts: int, total_seeds: int,
                        capacity_factor: float, filter_static,
                        num_rounds: int):
    """Multi-hop distributed budget sampling for one device's seed shard."""
    B0 = seeds_local.shape[0]
    node_base, edge_base = _layer_layout(B0, fanouts)
    gnode_base, _ = _layer_layout(total_seeds, fanouts)

    nodes = [seeds_local.astype(jnp.int32)]
    valids = [jnp.ones((B0,), jnp.bool_)]
    states = [seed_ts.astype(jnp.int32)]
    rows, cols, eptrs, evalids = [], [], [], []
    overflow = jnp.zeros((), jnp.int32)

    L = B0
    for ell, k in enumerate(fanouts):
        frontier, fvalid, fstate = nodes[ell], valids[ell], states[ell]
        fuid = gnode_base[ell] + dev * L + jnp.arange(L, dtype=jnp.int32)
        capacity = max(1, min(int(np.ceil(capacity_factor * L / num_parts)),
                              L))
        hop_key = rng.fold(key, ell)

        gid = jnp.clip(frontier, 0, max(g.num_nodes - 1, 0))
        owner = (gid % num_parts).astype(jnp.int32)
        local = (gid // num_parts).astype(jnp.int32)

        def owner_fn(recv, hop_key=hop_key, k=k):
            node, eptr, nts, valid = _owner_budget(
                g, hop_key, recv, k, filter_static)
            return jnp.concatenate([node, eptr, nts,
                                    valid.astype(jnp.int32)], axis=-1)

        payload = jnp.stack([local, fuid.astype(jnp.int32),
                             fstate.astype(jnp.int32)], axis=-1)
        mine, got, ovf = exchange_rounds(
            payload, owner, fvalid, owner_fn, axis=axis,
            num_parts=num_parts, capacity=capacity, num_rounds=num_rounds,
            ret_cols=4 * k)
        overflow = overflow + ovf
        neighbor = mine[:, :k]
        eptr = mine[:, k: 2 * k]
        new_state = mine[:, 2 * k: 3 * k]
        valid = (mine[:, 3 * k:] != 0) & got[:, None]

        slot = node_base[ell + 1] + (
            jnp.arange(L, dtype=jnp.int32)[:, None] * k
            + jnp.arange(k, dtype=jnp.int32)[None, :])
        col = node_base[ell] + jnp.arange(L, dtype=jnp.int32)[:, None]
        nodes.append(neighbor.reshape(-1))
        valids.append(valid.reshape(-1))
        states.append(new_state.reshape(-1))
        rows.append(slot.reshape(-1))
        cols.append(jnp.broadcast_to(col, (L, k)).reshape(-1))
        eptrs.append(eptr.reshape(-1))
        evalids.append(valid.reshape(-1))
        L = L * k

    sample = NeighborSample(
        nodes=jnp.concatenate(nodes),
        node_valid=jnp.concatenate(valids),
        node_state=jnp.concatenate(states),
        rows=jnp.concatenate(rows),
        cols=jnp.concatenate(cols),
        eptr=jnp.concatenate(eptrs),
        edge_valid=jnp.concatenate(evalids),
        node_base=node_base, edge_base=edge_base, fanouts=tuple(fanouts))
    return sample, overflow


def _owner_candidates(g: PartitionedGraph, fill_key, recv, M: int):
    """Owner side of the TYPED budget fill: return the <=M uniform
    candidate subset of each requested row — (node, eptr, raw_ts, valid)
    shipped back for requester-side cross-relation selection."""
    Pn, C, _ = recv.shape
    rows = jnp.clip(recv[..., 0].reshape(-1), 0, g.ldeg.shape[0] - 1)
    uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
    keys = _uid_keys(fill_key, uids)
    B = rows.shape[0]
    if g.ell is not None:
        row = g.ell[rows]
        lanes, deg, starts = row[:, :-2], row[:, -2], row[:, -1]
        pos, pvalid = _uid_uniform_lane_topk(keys, deg, lanes.shape[-1], M)
        cpos = jnp.clip(pos, 0, lanes.shape[-1] - 1)
        cand_v = _select_lanes(lanes, cpos)
        cand_e = starts[:, None] + pos
        cand_ts = (_select_lanes(g.ell_ts[rows], cpos)
                   if g.ell_ts is not None
                   else jnp.full((B, M), NAN_TIMESTAMP, jnp.int32))
    else:
        deg = g.ldeg[rows]
        pos, pvalid = _uid_floyd(keys, deg, M)
        pos, pvalid = pos.reshape(-1, M), pvalid.reshape(-1, M)
        lptr = jnp.clip(g.lstart[rows][:, None] + pos, 0,
                        g.lindices.shape[0] - 1)
        cand_v = g.lindices[lptr]
        cand_e = g.gstart[rows][:, None] + pos
        cand_ts = (g.lts[lptr] if g.lts is not None
                   else jnp.full((B, M), NAN_TIMESTAMP, jnp.int32))
    out = jnp.concatenate([cand_v, cand_e, cand_ts,
                           pvalid.astype(jnp.int32)], axis=-1)
    return out.reshape(Pn, C, 4 * M)


def _dist_budget_hetero_device(key, rels, seeds, seed_ts, *, dev, meta,
                               axis: str):
    """Typed distributed budget sampling for one device's seed shards.

    Mirrors sampling/budget._budget_sampling_impl's layout (per-type hop
    segments subdivided by relation, budget_sampling.rs:155-265) with the
    fill routed to each relation's adjacency owners and the cross-relation
    uniform selection running requester-side (candidates from R different
    owner exchanges meet only at the requester)."""
    from ..sampling.budget import _Layout
    (node_types, rel_specs, fanouts_t, num_seeds_t, num_hops, filter_static,
     capacity_factor, num_rounds, Pn) = meta
    layout = _Layout(node_types, [tuple(r) for r in rel_specs],
                     dict(fanouts_t), dict(num_seeds_t), num_hops)
    M = MAX_NEIGHBORS
    rels_by_dst = {t: [(ri, r, src) for ri, (r, src, dst)
                       in enumerate(rel_specs) if dst == t]
                   for t in node_types}

    nodes = {t: [seeds[t].astype(jnp.int32)] for t in node_types}
    valids = {t: [seeds[t] >= 0] for t in node_types}
    states = {t: [seed_ts[t].astype(jnp.int32)] for t in node_types}
    rows = {r: [] for r, _s, _d in rel_specs}
    cols = {r: [] for r, _s, _d in rel_specs}
    eptrs = {r: [] for r, _s, _d in rel_specs}
    evalids = {r: [] for r, _s, _d in rel_specs}
    overflow = jnp.zeros((), jnp.int32)

    # Device-count-invariant uids chain from the PARENT's uid: the child of
    # the parent at global hop-segment position p via relation r, slot s is
    #   gbase[src][ell+1] + g_rel_off[(r,ell)] + p*k + s
    # where the g* quantities come from the GLOBAL layout (per-device caps
    # x Pn).  Chaining through parent uids keeps ids consistent across P
    # even though each device's hop segment interleaves relations.
    glayout = _Layout(node_types, [tuple(r) for r in rel_specs],
                      dict(fanouts_t),
                      {t: n * Pn for t, n in dict(num_seeds_t).items()},
                      num_hops)
    uids = {t: [dev * layout.cap[t][0]
                + jnp.arange(layout.cap[t][0], dtype=jnp.int32)]
            for t in node_types}

    for ell in range(num_hops):
        hop_new = {t: {} for t in node_types}
        for t in node_types:
            B = layout.cap[t][ell]
            k = layout.fanouts[t][ell]
            t_rels = rels_by_dst[t]
            R = len(t_rels)
            if B == 0 or k == 0 or R == 0:
                for ri, r, src in t_rels:
                    empty = jnp.zeros((0,), jnp.int32)
                    hop_new[src][r] = (empty, jnp.zeros((0,), bool), empty,
                                       empty)
                    rows[r].append(empty)
                    cols[r].append(empty)
                    eptrs[r].append(empty)
                    evalids[r].append(jnp.zeros((0,), bool))
                continue
            frontier = nodes[t][ell]
            fvalid = valids[t][ell]
            fstate = states[t][ell]
            # absolute uid = global type-segment base + carried position
            fuid = glayout.node_base[t][ell] + uids[t][ell]
            capacity = max(1, min(int(np.ceil(capacity_factor * B / Pn)), B))

            cand_v, cand_e, cand_ts, cand_ok = [], [], [], []
            for ri, r, src in t_rels:
                g = rels[r]
                gid = jnp.clip(frontier, 0, max(g.num_nodes - 1, 0))
                owner = (gid % Pn).astype(jnp.int32)
                local = (gid // Pn).astype(jnp.int32)
                fill_key = rng.fold(key, ell, ri)

                def owner_fn(recv, g=g, fill_key=fill_key):
                    return _owner_candidates(g, fill_key, recv, M)

                payload = jnp.stack([local, fuid], axis=-1)
                res, got, ovf = exchange_rounds(
                    payload, owner, fvalid, owner_fn, axis=axis,
                    num_parts=Pn, capacity=capacity, num_rounds=num_rounds,
                    ret_cols=4 * M)
                overflow = overflow + ovf
                v = res[:, :M]
                e = res[:, M: 2 * M]
                ts_ = res[:, 2 * M: 3 * M]
                ok = (res[:, 3 * M:] != 0) & got[:, None]
                # NaN edge ts inherits frontier state (rs:82-85)
                vts = jnp.where(ts_ == NAN_TIMESTAMP, fstate[:, None], ts_)
                ok = jnp.logical_and(
                    ok, _budget_filter(filter_static, fstate[:, None], vts))
                cand_v.append(v)
                cand_e.append(e)
                cand_ts.append(_budget_mutate(filter_static,
                                              fstate[:, None], vts))
                cand_ok.append(ok)

            cand_v = jnp.stack(cand_v, axis=1)      # (B, R, M)
            cand_e = jnp.stack(cand_e, axis=1)
            cand_ts = jnp.stack(cand_ts, axis=1)
            cand_ok = jnp.stack(cand_ok, axis=1)

            # requester-side uniform Gumbel-top-k across ALL relations'
            # candidates, keyed per GLOBAL frontier uid (P-invariant)
            sel_keys = _uid_keys(
                rng.fold(key, ell, 1000 + node_types.index(t)),
                fuid.astype(jnp.uint32))
            noise = jax.vmap(lambda kk: jax.random.gumbel(
                kk, (R * M,), jnp.float32))(sel_keys)
            score = jnp.where(cand_ok.reshape(B, R * M), noise, NEG_INF)
            kk_ = min(k, R * M)
            vals, sel = jax.lax.top_k(score, kk_)
            sel_valid = jnp.isfinite(vals)
            if kk_ < k:
                sel = jnp.pad(sel, ((0, 0), (0, k - kk_)))
                sel_valid = jnp.pad(sel_valid, ((0, 0), (0, k - kk_)))
            sel = jnp.clip(sel, 0, R * M - 1)
            sel_rel = sel // M
            take = lambda a: jnp.take_along_axis(a.reshape(B, R * M), sel,
                                                 axis=1)
            sel_v, sel_e, sel_ts = take(cand_v), take(cand_e), take(cand_ts)

            col = (layout.node_base[t][ell]
                   + jnp.arange(B, dtype=jnp.int32)[:, None])
            for pos_r, (ri, r, src) in enumerate(t_rels):
                match = jnp.logical_and(sel_valid, sel_rel == pos_r)
                base_slot = (layout.node_base[src][ell + 1]
                             + layout.rel_node_off[(r, ell)])
                slot = base_slot + (
                    jnp.arange(B, dtype=jnp.int32)[:, None] * k
                    + jnp.arange(k, dtype=jnp.int32)[None, :])
                # child uid position within the global src hop segment
                child_uid = (glayout.rel_node_off[(r, ell)]
                             + uids[t][ell][:, None] * k
                             + jnp.arange(k, dtype=jnp.int32)[None, :])
                hop_new[src][r] = (sel_v.reshape(-1), match.reshape(-1),
                                   sel_ts.reshape(-1),
                                   child_uid.reshape(-1))
                rows[r].append(slot.reshape(-1))
                cols[r].append(jnp.broadcast_to(col, (B, k)).reshape(-1))
                eptrs[r].append(sel_e.reshape(-1))
                evalids[r].append(match.reshape(-1))

        for t in node_types:
            parts = [hop_new[t][r] for r, src_t, _d in rel_specs
                     if src_t == t and r in hop_new[t]]
            if parts:
                nodes[t].append(jnp.concatenate([p[0] for p in parts]))
                valids[t].append(jnp.concatenate([p[1] for p in parts]))
                states[t].append(jnp.concatenate([p[2] for p in parts]))
                uids[t].append(jnp.concatenate([p[3] for p in parts]))
            else:
                nodes[t].append(jnp.zeros((0,), jnp.int32))
                valids[t].append(jnp.zeros((0,), bool))
                states[t].append(jnp.zeros((0,), jnp.int32))
                uids[t].append(jnp.zeros((0,), jnp.int32))

    def cat(parts, dtype):
        return (jnp.concatenate(parts) if parts
                else jnp.zeros((0,), dtype))

    return ({t: cat(nodes[t], jnp.int32) for t in node_types},
            {t: cat(states[t], jnp.int32) for t in node_types},
            {t: cat(valids[t], jnp.bool_) for t in node_types},
            {r: cat(rows[r], jnp.int32) for r, _s, _d in rel_specs},
            {r: cat(cols[r], jnp.int32) for r, _s, _d in rel_specs},
            {r: cat(eptrs[r], jnp.int32) for r, _s, _d in rel_specs},
            {r: cat(evalids[r], jnp.bool_) for r, _s, _d in rel_specs},
            overflow)


def dist_budget_sample_hetero(key, rels, edge_types, inputs, num_neighbors,
                              num_hops: int, mesh: Mesh, *,
                              input_timestamps=None,
                              window: Optional[Tuple[int, int]] = None,
                              forward: bool = False, relative: bool = False,
                              node_types=None, axis: str = "data",
                              capacity_factor: float = 2.0,
                              num_rounds: Optional[int] = None):
    """TYPED distributed budget sampling (budget_sampling.rs:155-265 over a
    partition).  ``rels`` from :func:`~.dist_hgt.build_partitioned_hetero`;
    other args mirror :func:`~..sampling.budget.sample_budget`.  Per-type
    seed batches must divide the mesh axis; device d samples the subtrees
    of seeds ``[d*B_t/P, (d+1)*B_t/P)`` per type.  Returns per-device-
    leading-axis dicts ``(nodes, node_ts, node_valid, rows, cols, eptr,
    edge_valid)`` + overflow; layouts match the single-device _Layout per
    device shard."""
    Pn = int(mesh.shape[axis])
    if node_types is None:
        node_types = sorted({t for e in edge_types for t in (e[0], e[2])})
    from ..utils.types import rel_key
    rel_specs = tuple(sorted((rel_key(tuple(e)), e[0], e[2])
                             for e in edge_types))
    inputs = {t: np.asarray(inputs.get(t, np.zeros((0,), np.int64)))
              for t in node_types}
    for t, v in inputs.items():
        assert v.shape[0] % Pn == 0, (t, v.shape, Pn)
    num_seeds = {t: v.shape[0] // Pn for t, v in inputs.items()}
    filter_static = None
    if window is not None:
        filter_static = ((int(window[0]), int(window[1])), bool(forward),
                         bool(relative))
    meta = (tuple(node_types), rel_specs,
            tuple((t, tuple(int(x) for x in num_neighbors[t]))
                  for t in node_types),
            tuple(sorted(num_seeds.items())), int(num_hops), filter_static,
            float(capacity_factor), resolve_num_rounds(num_rounds, Pn),
            Pn)

    seeds_ts = {}
    for t in node_types:
        if input_timestamps is not None and t in input_timestamps:
            seeds_ts[t] = np.asarray(input_timestamps[t], np.int32)
        else:
            seeds_ts[t] = np.full(inputs[t].shape, NAN_TIMESTAMP, np.int32)

    run = _dist_budget_hetero_fn(mesh, axis, meta)
    from .multihost import put_partitioned
    with mesh:
        rels_put = {r: put_partitioned(rels[r], mesh, P(axis))
                    for r, _s, _d in rel_specs}
        seeds_put = {t: put_partitioned(
            jnp.asarray(inputs[t], jnp.int32), mesh, P(axis))
            for t in node_types}
        ts_put = {t: put_partitioned(jnp.asarray(seeds_ts[t]), mesh,
                                     P(axis))
                  for t in node_types}
        out = run(key, rels_put, seeds_put, ts_put)
    return tuple(out[:7]), out[7]


@functools.lru_cache(maxsize=64)
def _dist_budget_hetero_fn(mesh, axis, meta):
    repl, shard = P(), P(axis)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(repl, shard, shard, shard),
                       out_specs=(shard,) * 7 + (shard,))
    def run(key, rels, seeds, seed_ts):
        dev = jax.lax.axis_index(axis)
        out = _dist_budget_hetero_device(key, rels, seeds, seed_ts,
                                         dev=dev, meta=meta, axis=axis)
        *dicts, ovf = out
        add_dev = lambda d: {kk: v[None] for kk, v in d.items()}
        return tuple(add_dev(d) for d in dicts) + (ovf[None],)

    return run


def dist_budget_sample(key, graph: PartitionedGraph, seeds, fanouts,
                       mesh: Mesh, *, axis: str = "data",
                       input_timestamps=None,
                       window: Optional[Tuple[int, int]] = None,
                       forward: bool = False, relative: bool = False,
                       capacity_factor: float = 1.3,
                       num_rounds: Optional[int] = None):
    """Distributed homogeneous budget sampling (public entry point).

    ``fanouts[ell]`` = candidates drawn per frontier node at hop ell (the
    reference's ``num_neighbors[type][layer]``), each drawn uniformly from
    a <=50-candidate budget of the node's in-edges.  ``window/forward/
    relative`` mirror the reference's runtime TemporalFilter
    (budget_sampling.rs:13-38); timestamps come from
    ``build_partitioned_graph(..., edge_timestamps=...)``.

    Returns ``(NeighborSample with leading device axis, overflow (P,))`` —
    same layout contract as :func:`~.dist_sampling.dist_sample_neighbors`.
    """
    Pn = int(mesh.shape[axis])
    assert graph.num_parts == Pn, (
        f"graph was partitioned for {graph.num_parts} devices but the mesh "
        f"axis {axis!r} has {Pn}")
    fanouts = tuple(int(kk) for kk in fanouts)
    seeds = jnp.asarray(seeds)
    B = seeds.shape[0]
    assert B % Pn == 0
    filter_static = None
    if window is not None:
        filter_static = ((int(window[0]), int(window[1])), bool(forward),
                         bool(relative))
        assert graph.lts is not None, \
            "temporal filter needs edge_timestamps at build_partitioned_graph"
    seed_ts = (jnp.full((B,), NAN_TIMESTAMP, jnp.int32)
               if input_timestamps is None
               else jnp.asarray(input_timestamps, jnp.int32))

    run = _dist_budget_fn(mesh, axis, Pn, B, fanouts, filter_static,
                          float(capacity_factor),
                          resolve_num_rounds(num_rounds, Pn))
    from .multihost import put_partitioned
    with mesh:
        return run(key, put_partitioned(graph, mesh, P(axis)),
                   put_partitioned(seeds, mesh, P(axis)),
                   put_partitioned(seed_ts, mesh, P(axis)))


@functools.lru_cache(maxsize=64)
def _dist_budget_fn(mesh, axis, Pn, B, fanouts, filter_static,
                    capacity_factor, num_rounds):
    repl, shard = P(), P(axis)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(repl, shard, shard, shard),
                       out_specs=(shard, shard))
    def run(key, gshard, seeds_local, ts_local):
        dev = jax.lax.axis_index(axis)
        sample, ovf = _dist_budget_device(
            key, gshard, seeds_local, ts_local, dev=dev, fanouts=fanouts,
            axis=axis, num_parts=Pn, total_seeds=B,
            capacity_factor=capacity_factor, filter_static=filter_static,
            num_rounds=num_rounds)
        return jax.tree_util.tree_map(lambda a: a[None], sample), ovf[None]

    return run
