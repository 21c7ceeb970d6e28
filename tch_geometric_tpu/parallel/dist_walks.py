"""Distributed random walks over a PARTITIONED graph topology.

BASELINE config 5 requires CTDNE temporal walks over an edge-partitioned
graph; the reference has no distributed anything (SURVEY §2.5) and its walks
are sequential per-start loops (/root/reference/src/algo/random_walk.rs).
Here the walker STATE lives with the requesting device while adjacency rows
live only with their owner (:class:`PartitionedGraph`): every step routes
``(local_row, uid, state...)`` requests through the owner-routed all_to_all
protocol (``exchange_rounds``), the owner draws the next hop from its local
row with a counter-based key folded on the walk's GLOBAL uid, and the
response routes back.  Draws are therefore **bit-identical for any device
count** (the same invariance pinned for distributed neighbor sampling).

Per-walk semantics mirror the single-device engines (sampling/walks.py):

* node2vec (random_walk.rs:10-75): each step is TWO exchanges — the current
  node's owner draws ``num_trials`` uniform candidates; the candidates'
  owners answer the distance-1 probe (``has_edge(cand, prev)``, rs:59) in
  one batched exchange; the requester applies the Knightking accept rule
  locally (bounded trials, uniform fallback — SURVEY §7.3).
* tempo walk (rs:80-158): root-anchored window admissibility evaluated by
  the owner against its local effective edge timestamps; dead ends restart
  from a reservoir-carried uniform earlier position of the same walk
  (rs:144-148) on the requester.
* CTDNE (rs:185-288): forward-in-time admissibility + exponential/linear/
  uniform bias computed owner-side; whole-walk retry (rs:216,270-273) is a
  device-uniform ``while_loop`` (the retry predicate is a psum so every
  device runs the same trip count and the collectives stay matched).

Timestamps: owners hold EFFECTIVE edge timestamps (NaN falls back to the
dst-node timestamp, rs:121-127) — precompute with :func:`effective_edge_ts`
and pass as ``edge_timestamps`` to :func:`build_partitioned_graph`, so the
node-timestamp table never needs to be consulted remotely.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..sampling.neighbor import _select_lanes
from ..sampling.walks import (WALK_BIAS_EXPONENTIAL, WALK_BIAS_LINEAR,
                              WALK_BIAS_UNIFORM)
from ..utils.types import NAN_TIMESTAMP
from .dist_sampling import (PartitionedGraph, _uid_keys, exchange_rounds,
                            resolve_num_rounds)

NEG_INF = float("-inf")  # python literal: package import must not
#   create device arrays (jax.distributed.initialize needs an
#   uninitialised backend; see parallel/multihost.py)


def _vary(x, axis):
    """Mark a replicated-constant value as device-varying so scan/while
    carries type-match their (varying) outputs inside shard_map."""
    return jax.lax.pcast(x, axis, to="varying")


def effective_edge_ts(indices, edge_ts, node_ts) -> np.ndarray:
    """Per-edge timestamp with dst-node fallback when NaN (rs:121-127).

    Host-side precompute; feed the result to ``build_partitioned_graph`` as
    ``edge_timestamps`` so owners can evaluate windows locally."""
    indices = np.asarray(indices, dtype=np.int64)
    edge_ts = np.asarray(edge_ts, dtype=np.int32)
    node_ts = np.asarray(node_ts, dtype=np.int32)
    return np.where(edge_ts != NAN_TIMESTAMP, edge_ts, node_ts[indices])


# ---------------------------------------------------------------------------
# Owner-side row engines (ELL fast path + chunked window fallback)
# ---------------------------------------------------------------------------

def _owner_row_argmax_ell(g: PartitionedGraph, rows, score_fn):
    """argmax over ELL lanes: ``score_fn(t (B,W), in_deg (B,W)) -> scores``.
    Returns (nxt global id, nxt_ts, ok)."""
    row = g.ell[rows]
    lanes, deg = row[:, :-2], row[:, -2]
    W = lanes.shape[-1]
    in_deg = jnp.arange(W, dtype=jnp.int32)[None, :] < deg[:, None]
    t = (g.ell_ts[rows] if g.ell_ts is not None
         else jnp.full(lanes.shape, NAN_TIMESTAMP, jnp.int32))
    score = score_fn(t, in_deg)
    pos = jnp.argmax(score, axis=-1).astype(jnp.int32)
    ok = jnp.isfinite(jnp.max(score, axis=-1))
    nxt = _select_lanes(lanes, pos[:, None])[:, 0]
    nxt_ts = _select_lanes(t, pos[:, None])[:, 0]
    return nxt, nxt_ts, ok


def _owner_row_argmax_window(g: PartitionedGraph, rows, score_fn,
                             window: int):
    """Chunked-scan argmax over the CSC window for rows beyond the ELL
    width: per chunk compute scores, carry the running (best, pos)."""
    deg = g.ldeg[rows]
    lstart = g.lstart[rows]
    B = rows.shape[0]
    Ecap = g.lindices.shape[0]
    n_chunks = max(1, -(-max(g.max_degree, 1) // window))

    def body(c, carry):
        best, bpos = carry
        pos = c * window + jnp.arange(window, dtype=jnp.int32)[None, :]
        pos = jnp.broadcast_to(pos, (B, window))
        in_deg = pos < deg[:, None]
        lptr = jnp.clip(lstart[:, None] + pos, 0, Ecap - 1)
        t = (g.lts[lptr] if g.lts is not None
             else jnp.full((B, window), NAN_TIMESTAMP, jnp.int32))
        score = score_fn(t, in_deg, chunk=c)
        cb = jnp.max(score, axis=-1)
        cp = c * window + jnp.argmax(score, axis=-1).astype(jnp.int32)
        better = cb > best
        return jnp.where(better, cb, best), jnp.where(better, cp, bpos)

    # inits derive varyingness from deg (a varying input) so the carry
    # types match inside shard_map
    init = (jnp.full((B,), NEG_INF) + deg.astype(jnp.float32) * 0,
            jnp.zeros((B,), jnp.int32) + deg * 0)
    best, pos = jax.lax.fori_loop(0, n_chunks, body, init)
    ok = jnp.isfinite(best)
    lptr = jnp.clip(lstart + pos, 0, Ecap - 1)
    nxt = g.lindices[lptr]
    nxt_ts = (g.lts[lptr] if g.lts is not None
              else jnp.full((B,), NAN_TIMESTAMP, jnp.int32))
    return nxt, nxt_ts, ok


def _owner_step(g: PartitionedGraph, keys, rows, make_score, window: int):
    """Dispatch to the ELL or chunked engine.  ``make_score(t, in_deg,
    keys, chunk_tag)`` returns per-lane scores with -inf for inadmissible;
    gumbel noise must be keyed per (row, chunk) through ``keys``."""
    if g.ell is not None:
        def score_fn(t, in_deg):
            return make_score(t, in_deg, keys, 0)
        return _owner_row_argmax_ell(g, rows, score_fn)

    def score_fn(t, in_deg, chunk):
        return make_score(t, in_deg, keys, chunk)
    return _owner_row_argmax_window(g, rows, score_fn, window)


def _gumbel(keys, shape_tail, chunk):
    """Per-row gumbel noise: one key per row, folded on the chunk index so
    every window chunk gets fresh draws."""
    return jax.vmap(
        lambda kk: jax.random.gumbel(jax.random.fold_in(kk, chunk),
                                     shape_tail, jnp.float32))(keys)


# ---------------------------------------------------------------------------
# Shared step plumbing
# ---------------------------------------------------------------------------

def _route_step(g, frontier, valid, extra_cols, owner_fn, *, axis,
                num_parts, capacity, num_rounds, ret_cols):
    """Route one walk step: payload = [local_row, *extra_cols]."""
    gid = jnp.clip(frontier, 0, max(g.num_nodes - 1, 0))
    owner = (gid % num_parts).astype(jnp.int32)
    local = (gid // num_parts).astype(jnp.int32)
    payload = jnp.stack([local] + [c.astype(jnp.int32) for c in extra_cols],
                        axis=-1)
    return exchange_rounds(payload, owner, valid, owner_fn, axis=axis,
                           num_parts=num_parts, capacity=capacity,
                           num_rounds=num_rounds, ret_cols=ret_cols)


def _capacity(L, num_parts, capacity_factor):
    return max(1, min(int(np.ceil(capacity_factor * L / num_parts)), L))


# ---------------------------------------------------------------------------
# node2vec
# ---------------------------------------------------------------------------

def _dist_node2vec_device(key, g: PartitionedGraph, start, *, dev,
                          walk_length: int, p, q, num_trials: int, axis: str,
                          num_parts: int, capacity_factor: float,
                          num_rounds: int, window: int):
    B = start.shape[0]
    uid = dev * B + jnp.arange(B, dtype=jnp.int32)
    inv_p, inv_q = 1.0 / p, 1.0 / q
    max_prob = jnp.maximum(jnp.maximum(inv_p, 1.0), inv_q)
    prob0, prob1, prob2 = inv_p / max_prob, 1.0 / max_prob, inv_q / max_prob
    T = num_trials
    cap1 = _capacity(B, num_parts, capacity_factor)
    capT = _capacity(B * T, num_parts, capacity_factor)
    overflow = jnp.zeros((), jnp.int32)

    def cand_owner_fn(step_key):
        def owner_fn(recv):
            Pn, C, _ = recv.shape
            rows = jnp.clip(recv[..., 0].reshape(-1), 0, g.ldeg.shape[0] - 1)
            uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
            keys = _uid_keys(step_key, uids)
            if g.ell is not None:
                row = g.ell[rows]
                lanes, deg = row[:, :-2], row[:, -2]
            else:
                deg = g.ldeg[rows]
            pos = jax.vmap(lambda kk, d: jax.random.randint(
                kk, (T,), 0, jnp.maximum(d, 1), dtype=jnp.int32))(keys, deg)
            if g.ell is not None:
                cand = _select_lanes(lanes, pos)
            else:
                lptr = jnp.clip(g.lstart[rows][:, None] + pos, 0,
                                g.lindices.shape[0] - 1)
                cand = g.lindices[lptr]
            out = jnp.concatenate([cand, (deg > 0).astype(jnp.int32)[:, None]],
                                  axis=-1)
            return out.reshape(Pn, C, T + 1)
        return owner_fn

    def tri_owner_fn(recv):
        """has_edge(cand, prev): is ``prev`` among cand's neighbors?"""
        Pn, C, _ = recv.shape
        rows = jnp.clip(recv[..., 0].reshape(-1), 0, g.ldeg.shape[0] - 1)
        prev = recv[..., 1].reshape(-1)
        if g.ell is not None:
            row = g.ell[rows]
            lanes, deg = row[:, :-2], row[:, -2]
            W = lanes.shape[-1]
            in_deg = jnp.arange(W, dtype=jnp.int32)[None, :] < deg[:, None]
            hit = jnp.any((lanes == prev[:, None]) & in_deg, axis=-1)
        else:
            deg = g.ldeg[rows]
            lstart = g.lstart[rows]
            Ecap = g.lindices.shape[0]
            n_chunks = max(1, -(-max(g.max_degree, 1) // window))

            def body(c, acc):
                pos = c * window + jnp.arange(window, dtype=jnp.int32)[None, :]
                ok = pos < deg[:, None]
                lptr = jnp.clip(lstart[:, None] + pos, 0, Ecap - 1)
                return acc | jnp.any((g.lindices[lptr] == prev[:, None]) & ok,
                                     axis=-1)

            hit = jax.lax.fori_loop(0, n_chunks, body,
                                    jnp.zeros(rows.shape, jnp.bool_)
                                    | (deg < 0))
        return hit.astype(jnp.int32).reshape(Pn, C, 1)

    def step(carry, step_key):
        prev, cur, active = carry
        # exchange 1: owner of cur draws T uniform candidates + deg>0
        res, got, ovf1 = _route_step(
            g, cur, active, [uid], cand_owner_fn(step_key), axis=axis,
            num_parts=num_parts, capacity=cap1, num_rounds=num_rounds,
            ret_cols=T + 1)
        cand = res[:, :T]                                   # (B, T) global ids
        act = active & got & (res[:, T] != 0)

        # exchange 2: owners of the candidates answer has_edge(cand, prev)
        cflat = cand.reshape(-1)
        pflat = jnp.broadcast_to(prev[:, None], (B, T)).reshape(-1)
        vflat = jnp.broadcast_to(act[:, None], (B, T)).reshape(-1)
        tri, tgot, ovf2 = _route_step(
            g, cflat, vflat, [pflat], tri_owner_fn, axis=axis,
            num_parts=num_parts, capacity=capT, num_rounds=num_rounds,
            ret_cols=1)
        is_tri = (tri[:, 0] != 0).reshape(B, T) & tgot.reshape(B, T)

        # requester-side accept sweep (Knightking rule, rs:52-66)
        keys = _uid_keys(jax.random.fold_in(step_key, 1), uid.astype(jnp.uint32))
        r = jax.vmap(lambda kk: jax.random.uniform(kk, (T,)))(keys)
        is_back = cand == prev[:, None]
        acc = jnp.where(is_back, r < prob0,
                        jnp.where(is_tri, r < prob1, r < prob2))
        acc = acc.at[:, T - 1].set(True)    # bounded-bias uniform fallback
        first = jnp.argmax(acc, axis=-1)
        chosen = jnp.take_along_axis(cand, first[:, None], axis=1)[:, 0]

        nxt = jnp.where(act, chosen, -1)
        return ((jnp.where(act, cur, prev), jnp.where(act, nxt, cur), act),
                (nxt, ovf1 + ovf2))

    init = (_vary(jnp.full((B,), -1, jnp.int32), axis),
            start.astype(jnp.int32),
            _vary(jnp.ones((B,), jnp.bool_), axis))
    step_keys = jax.random.split(key, walk_length)
    _, (steps, ovfs) = jax.lax.scan(step, init, step_keys)
    walks = jnp.concatenate([start[:, None].astype(jnp.int32),
                             steps.T], axis=1)
    return walks, overflow + ovfs.sum()


def dist_random_walk(key, graph: PartitionedGraph, start, walk_length: int,
                     mesh: Mesh, *, p: float = 1.0, q: float = 1.0,
                     axis: str = "data", num_trials: int = 16,
                     capacity_factor: float = 1.3,
                     num_rounds: int | None = None, window: int = 256):
    """Distributed node2vec walk (random_walk.rs:10-75 semantics).

    ``graph`` must be built from CSR (row_ptrs/col_indices) so rows are
    OUT-edges.  Returns ``(walks (P, B/P, L+1) int32, overflow (P,))`` —
    concatenating device blocks gives the [B, L+1] single-device layout,
    broken walks padded with -1."""
    Pn = int(mesh.shape[axis])
    assert graph.num_parts == Pn
    start = jnp.asarray(start)
    B = start.shape[0]
    assert B % Pn == 0
    if p == 1.0 and q == 1.0:
        num_trials = 1
    run = _dist_walk_fn(mesh, axis, Pn, "node2vec", int(walk_length),
                        int(num_trials), None, None, float(capacity_factor),
                        resolve_num_rounds(num_rounds, Pn), int(window))
    from .multihost import put_partitioned
    with mesh:
        gput = put_partitioned(graph, mesh, P(axis))
        sput = put_partitioned(start, mesh, P(axis))
        zeros = put_partitioned(jnp.zeros((B,), jnp.int32), mesh, P(axis))
        walks, _ts, ovf = run(key, gput, sput, zeros,
                              jnp.float32(p), jnp.float32(q))
        return walks, ovf


# ---------------------------------------------------------------------------
# temporal walk
# ---------------------------------------------------------------------------

def _dist_tempo_device(key, g: PartitionedGraph, start, start_ts, *, dev,
                       walk_length: int, win_lo, win_hi, axis: str,
                       num_parts: int, capacity_factor: float,
                       num_rounds: int, window: int):
    B = start.shape[0]
    uid = dev * B + jnp.arange(B, dtype=jnp.int32)
    start = start.astype(jnp.int32)
    start_ts = start_ts.astype(jnp.int32)
    lo = start_ts + win_lo
    hi = start_ts + win_hi
    root_nan = start_ts == NAN_TIMESTAMP
    cap = _capacity(B, num_parts, capacity_factor)

    def owner_fn_for(step_key):
        def owner_fn(recv):
            Pn, C, _ = recv.shape
            rows = jnp.clip(recv[..., 0].reshape(-1), 0, g.ldeg.shape[0] - 1)
            uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
            rlo = recv[..., 2].reshape(-1)
            rhi = recv[..., 3].reshape(-1)
            rnan = recv[..., 4].reshape(-1) != 0
            keys = _uid_keys(step_key, uids)

            def make_score(t, in_deg, kk, chunk):
                in_win = (t >= rlo[:, None]) & (t < rhi[:, None])
                adm = in_deg & ((t == NAN_TIMESTAMP) | rnan[:, None] | in_win)
                noise = _gumbel(kk, (t.shape[-1],), chunk)
                return jnp.where(adm, noise, NEG_INF)

            nxt, nxt_ts, ok = _owner_step(g, keys, rows, make_score, window)
            out = jnp.stack([nxt, nxt_ts, ok.astype(jnp.int32)], axis=-1)
            return out.reshape(Pn, C, 3)
        return owner_fn

    def step(carry, inp):
        l, step_key = inp
        r_node, r_ts, cur = carry
        res, got, ovf = _route_step(
            g, cur, jnp.ones((B,), bool), [uid, lo, hi,
                                           root_nan.astype(jnp.int32)],
            owner_fn_for(step_key), axis=axis, num_parts=num_parts,
            capacity=cap, num_rounds=num_rounds, ret_cols=3)
        ok = got & (res[:, 2] != 0)
        # dead end -> restart from reservoir-carried uniform earlier position
        # of the SAME walk (rs:144-148)
        nxt = jnp.where(ok, res[:, 0], r_node)
        nxt_ts = jnp.where(ok, res[:, 1], r_ts)
        take = jax.vmap(lambda kk: jax.random.uniform(kk, ()))(
            _uid_keys(jax.random.fold_in(step_key, 7),
                      uid.astype(jnp.uint32))) < 1.0 / (l + 2).astype(jnp.float32)
        return ((jnp.where(take, nxt, r_node), jnp.where(take, nxt_ts, r_ts),
                 nxt), (nxt, nxt_ts, ovf))

    if walk_length <= 1:
        return start[:, None], start_ts[:, None], jnp.zeros((), jnp.int32)
    ls = jnp.arange(walk_length - 1)
    step_keys = jax.random.split(key, walk_length - 1)
    _, (steps, steps_ts, ovfs) = jax.lax.scan(
        step, (start, start_ts, start), (ls, step_keys))
    walks = jnp.concatenate([start[:, None], steps.T], axis=1)
    ts_buf = jnp.concatenate([start_ts[:, None], steps_ts.T], axis=1)
    return walks, ts_buf, ovfs.sum()


def dist_tempo_random_walk(key, graph: PartitionedGraph, start, start_ts,
                           walk_length: int, win, mesh: Mesh, *,
                           axis: str = "data", capacity_factor: float = 1.3,
                           num_rounds: int | None = None, window: int = 256):
    """Distributed temporal walk (random_walk.rs:80-158 semantics).

    ``graph`` must be built with ``edge_timestamps=effective_edge_ts(...)``.
    Returns ``(walks, walk_ts, overflow)``, walks (P, B/P, L)."""
    Pn = int(mesh.shape[axis])
    assert graph.num_parts == Pn
    assert graph.lts is not None, "build with edge_timestamps"
    start = jnp.asarray(start)
    B = start.shape[0]
    assert B % Pn == 0
    run = _dist_walk_fn(mesh, axis, Pn, "tempo", int(walk_length), 0,
                        (int(win[0]), int(win[1])), None,
                        float(capacity_factor),
                        resolve_num_rounds(num_rounds, Pn), int(window))
    from .multihost import put_partitioned
    with mesh:
        return run(key, put_partitioned(graph, mesh, P(axis)),
                   put_partitioned(start, mesh, P(axis)),
                   put_partitioned(jnp.asarray(start_ts, jnp.int32), mesh,
                                   P(axis)),
                   jnp.float32(0), jnp.float32(0))


# ---------------------------------------------------------------------------
# CTDNE biased temporal walk
# ---------------------------------------------------------------------------

def _dist_ctdne_device(key, g: PartitionedGraph, start, start_ts, *, dev,
                       walk_length: int, walk_bias: str, forward: bool,
                       retry_count: int, axis: str, num_parts: int,
                       capacity_factor: float, num_rounds: int, window: int):
    B = start.shape[0]
    L = walk_length
    uid = dev * B + jnp.arange(B, dtype=jnp.int32)
    start = start.astype(jnp.int32)
    start_ts = start_ts.astype(jnp.int32)
    cap = _capacity(B, num_parts, capacity_factor)

    def owner_fn_for(step_key):
        def owner_fn(recv):
            Pn, C, _ = recv.shape
            rows = jnp.clip(recv[..., 0].reshape(-1), 0, g.ldeg.shape[0] - 1)
            uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
            cur_ts = recv[..., 2].reshape(-1)
            keys = _uid_keys(step_key, uids)

            def make_score(t, in_deg, kk, chunk):
                # forward-in-time admissibility (rs:238-248)
                adm = in_deg & ((t == NAN_TIMESTAMP)
                                | (cur_ts[:, None] == NAN_TIMESTAMP)
                                | (cur_ts[:, None] <= t))
                wt = jnp.where(t == NAN_TIMESTAMP, cur_ts[:, None], t)
                if walk_bias == WALK_BIAS_EXPONENTIAL:
                    delta = jnp.where(forward, cur_ts[:, None] - wt,
                                      wt - cur_ts[:, None])
                    logw = delta.astype(jnp.float32)
                elif walk_bias == WALK_BIAS_LINEAR:
                    # true closeness-rank (fixes rs:170-174 argsort/rank
                    # confusion) — needs the whole row at once, so the
                    # linear bias requires the ELL table (single chunk)
                    key_t = jnp.where(adm, wt, jnp.iinfo(jnp.int32).max)
                    order = jnp.argsort(key_t, axis=1)
                    rank = jnp.argsort(order, axis=1)  # rank of each lane
                    n_adm = adm.sum(axis=1, keepdims=True)
                    logw = jnp.log(jnp.maximum(n_adm - rank, 1)
                                   .astype(jnp.float32))
                else:
                    logw = jnp.zeros(t.shape, jnp.float32)
                logw = jnp.where(cur_ts[:, None] == NAN_TIMESTAMP, 0.0, logw)
                noise = _gumbel(kk, (t.shape[-1],), chunk)
                return jnp.where(adm, logw + noise, NEG_INF)

            nxt, nxt_ts, ok = _owner_step(g, keys, rows, make_score, window)
            out = jnp.stack([nxt, nxt_ts, ok.astype(jnp.int32)], axis=-1)
            return out.reshape(Pn, C, 3)
        return owner_fn

    def attempt(att_key):
        def step(carry, step_key):
            cur, cur_ts, alive = carry
            res, got, ovf = _route_step(
                g, cur, alive, [uid, cur_ts], owner_fn_for(step_key),
                axis=axis, num_parts=num_parts, capacity=cap,
                num_rounds=num_rounds, ret_cols=3)
            ok = alive & got & (res[:, 2] != 0)
            nxt, nxt_ts = res[:, 0], res[:, 1]
            new_cur = jnp.where(ok, nxt, cur)
            new_ts = jnp.where(ok & (nxt_ts != NAN_TIMESTAMP), nxt_ts, cur_ts)
            return ((new_cur, new_ts, ok),
                    (jnp.where(ok, nxt, -1), jnp.where(ok, nxt_ts, -1), ovf))

        step_keys = jax.random.split(att_key, L - 1)
        (_, _, alive), (steps, steps_ts, ovfs) = jax.lax.scan(
            step, (start, start_ts, _vary(jnp.ones((B,), jnp.bool_), axis)),
            step_keys)
        walks = jnp.concatenate([start[:, None], steps.T], axis=1)
        ts_buf = jnp.concatenate([start_ts[:, None], steps_ts.T], axis=1)
        return walks, ts_buf, alive, ovfs.sum()

    if L <= 1:
        return (start[:, None], start_ts[:, None], jnp.zeros((), jnp.int32))

    # whole-walk retry: the predicate is a GLOBAL remaining count (psum) so
    # every device executes the same number of retry iterations and the
    # all_to_alls inside stay matched across the mesh
    def retry_cond(carry):
        i, _w, _t, _done, remaining, _o = carry
        return jnp.logical_and(i < max(retry_count, 1), remaining > 0)

    def retry_body(carry):
        i, walks, ts_buf, done, _rem, ovf = carry
        w, t, ok, o = attempt(jax.random.fold_in(key, i))
        take = jnp.logical_not(done)[:, None]
        done = jnp.logical_or(done, ok)
        remaining = jax.lax.psum(jnp.sum(~done), axis)
        return (i + 1, jnp.where(take, w, walks), jnp.where(take, t, ts_buf),
                done, remaining, ovf + o)

    walks = _vary(jnp.full((B, L), -1, jnp.int32), axis)
    ts_buf = _vary(jnp.full((B, L), -1, jnp.int32), axis)
    done = _vary(jnp.zeros((B,), jnp.bool_), axis)
    remaining = jax.lax.psum(jnp.sum(~done), axis)
    _, walks, ts_buf, _, _, ovf = jax.lax.while_loop(
        retry_cond, retry_body,
        (jnp.int32(0), walks, ts_buf, done, remaining,
         _vary(jnp.zeros((), jnp.int32), axis)))
    return walks, ts_buf, ovf


def dist_biased_tempo_random_walk(key, graph: PartitionedGraph, start,
                                  start_ts, walk_length: int, walk_bias: str,
                                  mesh: Mesh, *, forward: bool = True,
                                  retry_count: int = 10, axis: str = "data",
                                  capacity_factor: float = 1.3,
                                  num_rounds: int | None = None,
                                  window: int = 256):
    """Distributed CTDNE walk (random_walk.rs:185-288 semantics).

    BASELINE config 5's walk over the edge-partitioned graph.  ``graph``
    must be built with effective edge timestamps.  Returns
    ``(walks, walk_ts, overflow)``; the linear bias needs the ELL table
    (rank computation is whole-row).

    ``num_rounds`` defaults to auto (1 at P==1 via the identity routing
    plan — byte-identical HLO to 2 rounds, which also makes the round-3
    ~70x-slow ``num_rounds=1`` compile pathology structurally unreachable —
    and 2 at P>1 so overflowed requests are retried, not dropped).  Outputs
    are invariant to ``num_rounds`` for every request that wins a slot
    (draws are keyed by request uid, not round; see ``exchange_rounds``),
    so the auto default is law-preserving."""
    assert walk_bias in (WALK_BIAS_UNIFORM, WALK_BIAS_LINEAR,
                         WALK_BIAS_EXPONENTIAL)
    if walk_bias == WALK_BIAS_LINEAR:
        assert graph.ell is not None, \
            "linear bias needs whole-row ranks: build with ell_table=True"
    Pn = int(mesh.shape[axis])
    assert graph.num_parts == Pn
    assert graph.lts is not None, "build with edge_timestamps"
    start = jnp.asarray(start)
    assert start.shape[0] % Pn == 0
    run = _dist_walk_fn(mesh, axis, Pn, "ctdne:" + walk_bias,
                        int(walk_length), int(retry_count), None,
                        bool(forward), float(capacity_factor),
                        resolve_num_rounds(num_rounds, Pn), int(window))
    from .multihost import put_partitioned
    with mesh:
        return run(key, put_partitioned(graph, mesh, P(axis)),
                   put_partitioned(start, mesh, P(axis)),
                   put_partitioned(jnp.asarray(start_ts, jnp.int32), mesh,
                                   P(axis)),
                   jnp.float32(0), jnp.float32(0))


# ---------------------------------------------------------------------------
# jit-cached shard_map programs
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _dist_walk_fn(mesh, axis, Pn, kind, walk_length, trials_or_retry, win,
                  forward, capacity_factor, num_rounds, window):
    repl, shard = P(), P(axis)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(repl, shard, shard, shard, repl, repl),
                       out_specs=(shard, shard, shard))
    def run(key, gshard, start_local, ts_local, p, q):
        dev = jax.lax.axis_index(axis)
        if kind == "node2vec":
            walks, ovf = _dist_node2vec_device(
                key, gshard, start_local, dev=dev, walk_length=walk_length,
                p=p, q=q, num_trials=trials_or_retry, axis=axis,
                num_parts=Pn, capacity_factor=capacity_factor,
                num_rounds=num_rounds, window=window)
            ts = jnp.zeros_like(walks)
        elif kind == "tempo":
            walks, ts, ovf = _dist_tempo_device(
                key, gshard, start_local, ts_local, dev=dev,
                walk_length=walk_length, win_lo=jnp.int32(win[0]),
                win_hi=jnp.int32(win[1]), axis=axis, num_parts=Pn,
                capacity_factor=capacity_factor, num_rounds=num_rounds,
                window=window)
        else:
            bias = kind.split(":", 1)[1]
            walks, ts, ovf = _dist_ctdne_device(
                key, gshard, start_local, ts_local, dev=dev,
                walk_length=walk_length, walk_bias=bias, forward=forward,
                retry_count=trials_or_retry, axis=axis, num_parts=Pn,
                capacity_factor=capacity_factor, num_rounds=num_rounds,
                window=window)
        return walks[None], ts[None], ovf[None]

    return run
