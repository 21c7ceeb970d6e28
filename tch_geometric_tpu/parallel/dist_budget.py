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

This is the homogeneous projection of the reference's typed sampler (one
node type, one relation); the typed variant runs per-relation over a dict
of :class:`PartitionedGraph` s with the same owner_fn.  Divergences from
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sampling import rng
from ..sampling.budget import MAX_NEIGHBORS
from ..sampling.neighbor import NeighborSample, _layer_layout, _select_lanes
from ..utils.types import NAN_TIMESTAMP
from .dist_sampling import (PartitionedGraph, _uid_floyd, _uid_keys,
                            _uid_uniform_lane_topk, exchange_rounds)

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


def dist_budget_sample(key, graph: PartitionedGraph, seeds, fanouts,
                       mesh: Mesh, *, axis: str = "data",
                       input_timestamps=None,
                       window: Optional[Tuple[int, int]] = None,
                       forward: bool = False, relative: bool = False,
                       capacity_factor: float = 1.3, num_rounds: int = 1):
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
                          float(capacity_factor), int(num_rounds))
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
