"""Distributed neighbor-aware negative sampling over a PARTITIONED topology.

Completes the distributed sampler family: every sampling algorithm the
reference exposes (/root/reference/src/python.rs:785-796) now also runs
with NOTHING graph-sized replicated.  The reference's negative sampler
(/root/reference/src/algo/negative_sampling.rs:6-48) draws, per input node
``v``, up to ``try_count`` uniform candidates ``w`` per negative and
accepts the first that is a non-edge (``!has_edge(v, w)``) and not ``v``
itself.  The edge-existence probe needs exactly ONE adjacency row:

* outbound (default): ``has_edge(v, w)`` reads **v's row** — all
  ``num_neg * try_count`` candidates for an input ship to v's owner in one
  request and the owner answers every membership test against its local
  ELL/CSC row at once;
* ``inbound`` (the hetero flag at rs:112-115 flips the probe direction):
  ``has_edge(w, v)`` reads **w's row** — probes route per-candidate to each
  candidate's owner, the same batched-probe shape as the node2vec
  distance-1 exchange (:mod:`.dist_walks`).

Candidate draws happen REQUESTER-side keyed by the input's global uid
(counter-based :func:`~..sampling.rng.fold`), so the drawn candidates —
and therefore the accepted negatives — are bit-identical for any device
count (pinned in tests/test_dist_negative.py, the same invariance contract
as every other distributed sampler here).
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
from .dist_sampling import (PartitionedGraph, _uid_keys, exchange_rounds,
                            resolve_num_rounds)
from .dist_walks import _capacity


def _owner_membership(g: PartitionedGraph, recv, n_targets: int,
                      window: int = 512):
    """Owner-side membership probe: ``recv (P, C, 1 + n_targets)`` carries
    ``[local_row, target_0..target_{K-1}]``; returns (P, C, K) bits — is
    ``target_k`` among the row's neighbors?  ELL rows answer with one lane
    compare; wider rows fall back to a chunked CSC window sweep."""
    Pn, C, _ = recv.shape
    rows = jnp.clip(recv[..., 0].reshape(-1), 0, g.ldeg.shape[0] - 1)
    targets = recv[..., 1:].reshape(-1, n_targets)          # (B, K)
    B = rows.shape[0]
    if g.ell is not None:
        row = g.ell[rows]
        lanes, deg = row[:, :-2], row[:, -2]
        W = lanes.shape[-1]
        in_deg = jnp.arange(W, dtype=jnp.int32)[None, :] < deg[:, None]
        hit = jnp.any((lanes[:, :, None] == targets[:, None, :])
                      & in_deg[:, :, None], axis=1)          # (B, K)
    else:
        deg = g.ldeg[rows]
        lstart = g.lstart[rows]
        Ecap = g.lindices.shape[0]
        n_chunks = max(1, -(-max(g.max_degree, 1) // window))

        def body(c, acc):
            pos = c * window + jnp.arange(window, dtype=jnp.int32)[None, :]
            ok = pos < deg[:, None]
            lptr = jnp.clip(lstart[:, None] + pos, 0, Ecap - 1)
            ids = g.lindices[lptr]                           # (B, window)
            return acc | jnp.any(
                (ids[:, :, None] == targets[:, None, :]) & ok[:, :, None],
                axis=1)

        hit = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros((B, n_targets), jnp.bool_)
                                | (deg < 0)[:, None])
    return hit.astype(jnp.int32).reshape(Pn, C, n_targets)


def _dist_negative_device(key, g: PartitionedGraph, inputs_local, *, dev,
                          num_neg: int, try_count: int, inbound: bool,
                          axis: str, num_parts: int, capacity_factor: float,
                          num_rounds: int, exclude=None):
    """One device's shard: draw candidates for its local inputs, probe edge
    existence at the owning device, first-accept locally.

    ``exclude`` (optional, (L,)) rejects one extra node id per input on top
    of the reference's self-rejection — the link trainer passes the true
    dst so negatives exclude both endpoints (see link_train.py)."""
    L = inputs_local.shape[0]
    K = num_neg * try_count
    uid = dev * L + jnp.arange(L, dtype=jnp.int32)
    v = inputs_local.astype(jnp.int32)

    # requester-side candidate draws, keyed per GLOBAL input uid
    keys = _uid_keys(rng.fold(key, 0), uid.astype(jnp.uint32))
    cand = jax.vmap(lambda kk: jax.random.randint(
        kk, (K,), 0, max(g.num_nodes, 1), dtype=jnp.int32))(keys)  # (L, K)

    valid = jnp.ones((L,), jnp.bool_)
    if not inbound:
        # probe row of v: one request per input, K targets each
        gid = jnp.clip(v, 0, max(g.num_nodes - 1, 0))
        owner = (gid % num_parts).astype(jnp.int32)
        local = (gid // num_parts).astype(jnp.int32)
        payload = jnp.concatenate([local[:, None], cand], axis=-1)
        cap = _capacity(L, num_parts, capacity_factor)

        def owner_fn(recv):
            return _owner_membership(g, recv, K)

        res, got, overflow = exchange_rounds(
            payload, owner, valid, owner_fn, axis=axis,
            num_parts=num_parts, capacity=cap, num_rounds=num_rounds,
            ret_cols=K)
        exists = (res != 0) | ~got[:, None]                  # (L, K)
    else:
        # probe row of each candidate: L*K requests, one target (v) each
        cflat = cand.reshape(-1)
        gid = jnp.clip(cflat, 0, max(g.num_nodes - 1, 0))
        owner = (gid % num_parts).astype(jnp.int32)
        local = (gid // num_parts).astype(jnp.int32)
        vflat = jnp.broadcast_to(v[:, None], (L, K)).reshape(-1)
        payload = jnp.stack([local, vflat], axis=-1)
        cap = _capacity(L * K, num_parts, capacity_factor)

        def owner_fn(recv):
            return _owner_membership(g, recv, 1)

        res, got, overflow = exchange_rounds(
            payload, owner, jnp.ones((L * K,), jnp.bool_), owner_fn,
            axis=axis, num_parts=num_parts, capacity=cap,
            num_rounds=num_rounds, ret_cols=1)
        exists = ((res[:, 0] != 0) | ~got).reshape(L, K)

    # first-accept sweep (rs:31-45): non-edge and not a self-loop;
    # dropped (overflowed) probes count as "exists" above = conservative.
    ok = (~exists) & (cand != v[:, None])
    if exclude is not None:
        ok = ok & (cand != exclude.astype(jnp.int32)[:, None])
    ok = ok.reshape(L, num_neg, try_count)
    candn = cand.reshape(L, num_neg, try_count)
    first = jnp.argmax(ok, axis=-1)
    accepted = jnp.any(ok, axis=-1)
    w = jnp.take_along_axis(candn, first[..., None], axis=-1)[..., 0]
    return w, accepted, overflow


def dist_negative_sample(key, graph: PartitionedGraph, inputs, num_neg: int,
                         try_count: int, mesh: Mesh, *,
                         inbound: bool = False, axis: str = "data",
                         capacity_factor: float = 1.3,
                         num_rounds: Optional[int] = None):
    """Distributed negative sampling (negative_sampling.rs:6-48 over a
    partition).

    ``inputs (B,)`` must divide the mesh axis; device ``d`` draws the
    negatives of inputs ``[d*B/P, (d+1)*B/P)``.  Returns
    ``(w (P, L, num_neg), accepted (P, L, num_neg), overflow (P,))`` with a
    leading device axis; ``w[d, i, n]`` is the first accepted non-edge
    candidate (valid where ``accepted``), bit-identical for any device
    count.  Feed the flattened (w, accepted) to the host-side compaction of
    :func:`~..sampling.negative.negative_sample_neighbors_homogenous` for
    the reference's (samples, rows, cols, sample_count) surface.
    """
    Pn = int(mesh.shape[axis])
    assert graph.num_parts == Pn, (
        f"graph was partitioned for {graph.num_parts} devices but the mesh "
        f"axis {axis!r} has {Pn}")
    inputs = jnp.asarray(inputs)
    B = inputs.shape[0]
    assert B % Pn == 0, (B, Pn)
    run = _dist_negative_fn(mesh, axis, Pn, int(num_neg), int(try_count),
                            bool(inbound), float(capacity_factor),
                            resolve_num_rounds(num_rounds, Pn))
    from .multihost import put_partitioned
    with mesh:
        return run(key, put_partitioned(graph, mesh, P(axis)),
                   put_partitioned(inputs.astype(jnp.int32), mesh, P(axis)))


@functools.lru_cache(maxsize=64)
def _dist_negative_fn(mesh, axis, Pn, num_neg, try_count, inbound,
                      capacity_factor, num_rounds):
    repl, shard = P(), P(axis)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=(repl, shard, shard),
                       out_specs=(shard, shard, shard))
    def run(key, gshard, inputs_local):
        dev = jax.lax.axis_index(axis)
        w, accepted, ovf = _dist_negative_device(
            key, gshard, inputs_local, dev=dev, num_neg=num_neg,
            try_count=try_count, inbound=inbound, axis=axis, num_parts=Pn,
            capacity_factor=capacity_factor, num_rounds=num_rounds)
        return w[None], accepted[None], ovf[None]

    return run


# ---------------------------------------------------------------------------
# Typed (heterogeneous) distributed negative sampling
# ---------------------------------------------------------------------------

def _probe_exists(g: PartitionedGraph, v, cand, *, inbound, axis, num_parts,
                  capacity_factor, num_rounds):
    """Edge-existence probes for one relation: ``v (L,)`` inputs ×
    ``cand (L, K)`` candidates.  Returns (exists (L, K) bool, overflow)."""
    L, K = cand.shape
    if not inbound:
        gid = jnp.clip(v, 0, max(g.num_nodes - 1, 0))
        owner = (gid % num_parts).astype(jnp.int32)
        local = (gid // num_parts).astype(jnp.int32)
        payload = jnp.concatenate([local[:, None], cand], axis=-1)
        cap = _capacity(L, num_parts, capacity_factor)
        res, got, overflow = exchange_rounds(
            payload, owner, jnp.ones((L,), jnp.bool_),
            lambda recv: _owner_membership(g, recv, K), axis=axis,
            num_parts=num_parts, capacity=cap, num_rounds=num_rounds,
            ret_cols=K)
        exists = (res != 0) | ~got[:, None]
    else:
        cflat = cand.reshape(-1)
        gid = jnp.clip(cflat, 0, max(g.num_nodes - 1, 0))
        owner = (gid % num_parts).astype(jnp.int32)
        local = (gid // num_parts).astype(jnp.int32)
        vflat = jnp.broadcast_to(v[:, None], (L, K)).reshape(-1)
        payload = jnp.stack([local, vflat], axis=-1)
        cap = _capacity(L * K, num_parts, capacity_factor)
        res, got, overflow = exchange_rounds(
            payload, owner, jnp.ones((L * K,), jnp.bool_),
            lambda recv: _owner_membership(g, recv, 1), axis=axis,
            num_parts=num_parts, capacity=cap, num_rounds=num_rounds,
            ret_cols=1)
        exists = ((res[:, 0] != 0) | ~got).reshape(L, K)
    return exists, overflow


def _dist_negative_hetero_device(key, rels, inputs, *, dev, meta, axis):
    (node_types, type_rels, dst_counts, num_neg, try_count, inbound,
     capacity_factor, num_rounds, Pn) = meta
    K = num_neg * try_count
    out_w, out_acc, out_rel = {}, {}, {}
    overflow = jnp.zeros((), jnp.int32)
    for ti, t in enumerate(node_types):
        v = inputs[t].astype(jnp.int32)          # (L,) type-local global ids
        L = v.shape[0]
        t_rels = type_rels[ti][1]
        R = len(t_rels)
        if L == 0 or R == 0:
            out_w[t] = jnp.zeros((L, num_neg), jnp.int32)
            out_acc[t] = jnp.zeros((L, num_neg), jnp.bool_)
            out_rel[t] = jnp.zeros((L, num_neg), jnp.int32)
            continue
        uid = (dev * L + jnp.arange(L, dtype=jnp.int32)).astype(jnp.uint32)
        tkey = rng.fold(key, ti)
        # uniformly random outgoing relation per (input, neg) (rs:104)
        rkeys = _uid_keys(rng.fold(tkey, 0), uid)
        rel_choice = jax.vmap(lambda kk: jax.random.randint(
            kk, (num_neg,), 0, R, dtype=jnp.int32))(rkeys)
        cands, oks = [], []
        for ri, (r, dst_t) in enumerate(t_rels):
            g = rels[r]
            ckeys = _uid_keys(rng.fold(tkey, 1 + ri), uid)
            n_dst = max(dict(dst_counts)[dst_t], 1)
            cand = jax.vmap(lambda kk: jax.random.randint(
                kk, (K,), 0, n_dst, dtype=jnp.int32))(ckeys)
            exists, ovf = _probe_exists(
                g, v, cand, inbound=inbound, axis=axis, num_parts=Pn,
                capacity_factor=capacity_factor, num_rounds=num_rounds)
            overflow = overflow + ovf
            cands.append(cand)
            oks.append((~exists) & (cand != v[:, None]))
        cand = jnp.stack(cands)                  # (R, L, K)
        ok = jnp.stack(oks)
        # select the chosen relation's candidates per (input, neg)
        sel = rel_choice.T[:, :, None, None]     # (num_neg, L, 1, 1) rel idx
        candn = cand.reshape(R, L, num_neg, try_count)
        okn = ok.reshape(R, L, num_neg, try_count)
        candc = jnp.take_along_axis(
            candn.transpose(2, 1, 0, 3), sel, axis=2)[:, :, 0]  # (neg, L, try)
        okc = jnp.take_along_axis(
            okn.transpose(2, 1, 0, 3), sel, axis=2)[:, :, 0]
        del candn, okn
        first = jnp.argmax(okc, axis=-1)
        out_acc[t] = jnp.any(okc, axis=-1).T             # (L, num_neg)
        out_w[t] = jnp.take_along_axis(
            candc, first[..., None], axis=-1)[..., 0].T
        out_rel[t] = rel_choice
    return out_w, out_acc, out_rel, overflow


def dist_negative_sample_hetero(key, rels, edge_types, inputs, num_neg: int,
                                try_count: int, mesh: Mesh, *,
                                node_counts, inbound: bool = False,
                                axis: str = "data",
                                capacity_factor: float = 1.3,
                                num_rounds: Optional[int] = None):
    """Typed distributed negative sampling (negative_sampling.rs:50-131
    over a partition).

    ``rels``: dict rel_key -> :class:`PartitionedGraph` built from each
    relation's **CSR** (row = src node's out-neighbors — the same layout
    :func:`~..sampling.negative.negative_sample_neighbors_heterogenous`
    takes; ``build_partitioned_hetero`` partitions whatever ptr/indices
    you hand it).  Per input of type ``t``: a uniformly random outgoing
    relation of ``t`` (keyed per global input uid), then first-accept
    rejection over ``try_count`` uniform candidates in that relation's dst
    space, probed at the owning device (``inbound`` flips the probe
    direction, rs:112-115).  Every relation's probe exchange runs for all
    inputs (static shapes); candidates and accepts are bit-identical for
    any device count.

    Returns ``(w, accepted, rel_choice)`` dicts of per-type arrays with a
    leading device axis (``(P, L_t, num_neg)``) plus ``overflow (P,)``;
    ``rel_choice[t][d, i, n]`` indexes type ``t``'s ordered outgoing
    relation list (order of first appearance in ``edge_types``)."""
    Pn = int(mesh.shape[axis])
    from ..utils.types import rel_key as _rk
    edge_types = [tuple(e) for e in edge_types]
    node_types = sorted({tt for e in edge_types for tt in (e[0], e[2])})
    node_rels = {}
    for (src, rel, dst) in edge_types:
        node_rels.setdefault(src, []).append((_rk((src, rel, dst)), dst))
    type_rels = tuple(
        (t, tuple(node_rels.get(t, []))) for t in node_types)
    dst_counts = tuple(sorted({t: int(n) for t, n in node_counts.items()}
                              .items()))
    inputs = {t: np.asarray(inputs.get(t, np.zeros((0,), np.int64)))
              for t in node_types}
    for t, vv in inputs.items():
        assert vv.shape[0] % Pn == 0, (t, vv.shape, Pn)
    meta = (tuple(node_types), type_rels, dst_counts, int(num_neg),
            int(try_count), bool(inbound), float(capacity_factor),
            resolve_num_rounds(num_rounds, Pn), Pn)
    run = _dist_negative_hetero_fn(mesh, axis, meta)
    from .multihost import put_partitioned
    with mesh:
        rels_put = {r: put_partitioned(rels[r], mesh, P(axis))
                    for _t, trs in type_rels for r, _d in trs}
        inputs_put = {t: put_partitioned(
            jnp.asarray(inputs[t], jnp.int32), mesh, P(axis))
            for t in node_types}
        w, acc, rc, ovf = run(key, rels_put, inputs_put)
    return w, acc, rc, ovf


@functools.lru_cache(maxsize=64)
def _dist_negative_hetero_fn(mesh, axis, meta):
    repl, shard = P(), P(axis)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=(repl, shard, shard),
                       out_specs=(shard, shard, shard, shard))
    def run(key, rels, inputs):
        dev = jax.lax.axis_index(axis)
        w, acc, rc, ovf = _dist_negative_hetero_device(
            key, rels, inputs, dev=dev, meta=meta, axis=axis)
        add_dev = lambda d: {kk: vv[None] for kk, vv in d.items()}
        return add_dev(w), add_dev(acc), add_dev(rc), ovf[None]

    return run
