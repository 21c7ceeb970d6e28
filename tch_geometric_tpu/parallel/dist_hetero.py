"""Distributed HETEROGENEOUS neighbor sampling over partitioned relations.

Completes the distributed coverage of the reference sampler family:
``neighbor_sampling_heterogenous`` (/root/reference/src/algo/
neighbor_sampling.rs:233-356) over a partition.  Each relation's CSC is
interleave-partitioned by dst ownership (:func:`~.dist_hgt.
build_partitioned_hetero`); per hop, per relation, the dst-type frontier
routes to the relation's adjacency owners, who sample ``k_r[ell]`` in-edges
with the SAME owner engine as homogeneous distributed sampling
(``_owner_sample``: uniform +- replacement, Gumbel-weighted, 3-mode
temporal filters) keyed by the request's uid.

Uids CHAIN from parent uids through the GLOBAL HeteroLayout (per-device
seed caps x P), so draws are bit-identical for any device count even
though each device's typed pools interleave relations — the same scheme
as the typed distributed budget sampler.

Layout per device mirrors sampling/hetero_neighbor.HeteroLayout over the
device's seed shard; concatenating device blocks per hop segment
reassembles the global sample.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..sampling import rng
from ..sampling.hetero_neighbor import HeteroLayout
from ..utils.config import TemporalEdgeFilter
from ..utils.types import NAN_TIMESTAMP, rel_key
from .dist_sampling import (_owner_sample, exchange_rounds,
                            resolve_num_rounds)

NEG_INF = float("-inf")


def _dist_hetero_device(key, rels, seeds, seed_ts, *, dev, meta, axis):
    (node_types, rel_specs, fanouts_t, num_seeds_t, num_hops,
     with_replacement, weighted_t, filter_static, capacity_factor,
     num_rounds, window, Pn) = meta
    fanouts = dict(fanouts_t)
    weighted = dict(weighted_t)
    layout = HeteroLayout(node_types, [tuple(r) for r in rel_specs],
                          fanouts, dict(num_seeds_t), num_hops)
    glayout = HeteroLayout(node_types, [tuple(r) for r in rel_specs],
                           fanouts,
                           {t: n * Pn for t, n in dict(num_seeds_t).items()},
                           num_hops)
    filter_cfg = None
    if filter_static is not None:
        w, fwd, mode = filter_static
        filter_cfg = TemporalEdgeFilter(window=w, forward=fwd, mode=mode)

    nodes = {t: [seeds[t].astype(jnp.int32)] for t in node_types}
    valids = {t: [seeds[t] >= 0] for t in node_types}
    states = {t: [seed_ts[t].astype(jnp.int32)] for t in node_types}
    uids = {t: [dev * layout.cap[t][0]
                + jnp.arange(layout.cap[t][0], dtype=jnp.int32)]
            for t in node_types}
    rows = {r: [] for r, _s, _d in rel_specs}
    cols = {r: [] for r, _s, _d in rel_specs}
    eptrs = {r: [] for r, _s, _d in rel_specs}
    evalids = {r: [] for r, _s, _d in rel_specs}
    overflow = jnp.zeros((), jnp.int32)

    for ell in range(num_hops):
        hop_new = {t: {} for t in node_types}
        for ri, (r, src, dst) in enumerate(rel_specs):
            k = fanouts[r][ell]
            B = layout.cap[dst][ell]
            if B == 0 or k == 0:
                empty = jnp.zeros((0,), jnp.int32)
                hop_new[src][r] = (empty, jnp.zeros((0,), bool), empty,
                                   empty)
                rows[r].append(empty)
                cols[r].append(empty)
                eptrs[r].append(empty)
                evalids[r].append(jnp.zeros((0,), bool))
                continue
            g = rels[r]
            frontier = nodes[dst][ell]
            fvalid = valids[dst][ell]
            fstate = states[dst][ell]
            fuid = glayout.node_base[dst][ell] + uids[dst][ell]
            capacity = max(1, min(int(np.ceil(capacity_factor * B / Pn)), B))
            hop_key = rng.fold(key, ell, ri)

            gid = jnp.clip(frontier, 0, max(g.num_nodes - 1, 0))
            owner = (gid % Pn).astype(jnp.int32)
            local = (gid // Pn).astype(jnp.int32)

            def owner_fn(recv, g=g, hop_key=hop_key, k=k, r=r):
                neighbor, eptr, pvalid, new_state = _owner_sample(
                    g, hop_key, recv, k, with_replacement,
                    bool(weighted.get(r, False)),
                    filter_cfg if g.lts is not None else None, window)
                return jnp.concatenate(
                    [neighbor, eptr, pvalid.astype(jnp.int32), new_state],
                    axis=-1)

            payload = jnp.stack([local, fuid, fstate.astype(jnp.int32)],
                                axis=-1)
            mine, got, ovf = exchange_rounds(
                payload, owner, fvalid, owner_fn, axis=axis, num_parts=Pn,
                capacity=capacity, num_rounds=num_rounds, ret_cols=4 * k)
            overflow = overflow + ovf
            neighbor = mine[:, :k]
            eptr = mine[:, k: 2 * k]
            valid = (mine[:, 2 * k: 3 * k] != 0) & got[:, None]
            new_state = mine[:, 3 * k:]

            slot = (layout.node_base[src][ell + 1]
                    + layout.rel_node_off[(r, ell)]
                    + jnp.arange(B, dtype=jnp.int32)[:, None] * k
                    + jnp.arange(k, dtype=jnp.int32)[None, :])
            col = (layout.node_base[dst][ell]
                   + jnp.arange(B, dtype=jnp.int32)[:, None])
            child_uid = (glayout.rel_node_off[(r, ell)]
                         + uids[dst][ell][:, None] * k
                         + jnp.arange(k, dtype=jnp.int32)[None, :])
            hop_new[src][r] = (neighbor.reshape(-1), valid.reshape(-1),
                               new_state.reshape(-1), child_uid.reshape(-1))
            rows[r].append(slot.reshape(-1))
            cols[r].append(jnp.broadcast_to(col, (B, k)).reshape(-1))
            eptrs[r].append(eptr.reshape(-1))
            evalids[r].append(valid.reshape(-1))

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
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype)

    return ({t: cat(nodes[t], jnp.int32) for t in node_types},
            {t: cat(states[t], jnp.int32) for t in node_types},
            {t: cat(valids[t], jnp.bool_) for t in node_types},
            {r: cat(rows[r], jnp.int32) for r, _s, _d in rel_specs},
            {r: cat(cols[r], jnp.int32) for r, _s, _d in rel_specs},
            {r: cat(eptrs[r], jnp.int32) for r, _s, _d in rel_specs},
            {r: cat(evalids[r], jnp.bool_) for r, _s, _d in rel_specs},
            overflow)


def dist_hetero_neighbor_sample(key, rels, edge_types, inputs, num_neighbors,
                                num_hops: int, mesh: Mesh, *,
                                with_replacement: bool = False,
                                weighted=None,
                                input_timestamps=None,
                                filter: Optional[tuple] = None,
                                node_types=None, axis: str = "data",
                                capacity_factor: float = 2.0,
                                num_rounds: Optional[int] = None,
                                window: int = 256):
    """Typed distributed neighbor sampling (public entry point).

    ``rels`` from :func:`~.dist_hgt.build_partitioned_hetero` (build with
    per-rel ``edge_weights``/``edge_timestamps`` for weighted/temporal
    relations); ``num_neighbors[rel_key][ell]`` per-relation fanouts
    (src/python.rs:273-395 semantics); ``weighted`` an optional set/dict of
    rel keys sampling proportional to their edge weights; ``filter`` is
    ``((lo, hi), forward, mode)`` applied to relations carrying
    timestamps.  Per-type seed batches must divide the mesh axis.

    Returns ``((nodes, node_ts, node_valid, rows, cols, eptr, edge_valid),
    overflow)`` — per-device leading axis, per-device layouts =
    HeteroLayout over the device's seed shard."""
    Pn = int(mesh.shape[axis])
    if node_types is None:
        node_types = sorted({t for e in edge_types for t in (e[0], e[2])})
    rel_specs = tuple(sorted((rel_key(tuple(e)), e[0], e[2])
                             for e in edge_types))
    inputs = {t: np.asarray(inputs.get(t, np.zeros((0,), np.int64)))
              for t in node_types}
    for t, v in inputs.items():
        assert v.shape[0] % Pn == 0, (t, v.shape, Pn)
    num_seeds = {t: v.shape[0] // Pn for t, v in inputs.items()}
    weighted = set() if weighted is None else set(weighted)
    filter_static = None
    if filter is not None:
        filter_static = (tuple(int(x) for x in filter[0]), bool(filter[1]),
                         int(filter[2]))
    meta = (tuple(node_types), rel_specs,
            tuple((r, tuple(int(x) for x in num_neighbors[r]))
                  for r, _s, _d in rel_specs),
            tuple(sorted(num_seeds.items())), int(num_hops),
            bool(with_replacement),
            tuple((r, r in weighted) for r, _s, _d in rel_specs),
            filter_static, float(capacity_factor),
            resolve_num_rounds(num_rounds, Pn), int(window), Pn)

    seeds_ts = {}
    for t in node_types:
        if input_timestamps is not None and t in input_timestamps:
            seeds_ts[t] = np.asarray(input_timestamps[t], np.int32)
        else:
            seeds_ts[t] = np.full(inputs[t].shape, NAN_TIMESTAMP, np.int32)

    run = _dist_hetero_fn(mesh, axis, meta)
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
def _dist_hetero_fn(mesh, axis, meta):
    repl, shard = P(), P(axis)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(repl, shard, shard, shard),
                       out_specs=(shard,) * 8)
    def run(key, rels, seeds, seed_ts):
        dev = jax.lax.axis_index(axis)
        out = _dist_hetero_device(key, rels, seeds, seed_ts, dev=dev,
                                  meta=meta, axis=axis)
        *dicts, ovf = out
        add_dev = lambda d: {kk: v[None] for kk, v in d.items()}
        return tuple(add_dev(d) for d in dicts) + (ovf[None],)

    return run
