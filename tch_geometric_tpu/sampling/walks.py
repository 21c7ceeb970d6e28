"""Random walks: node2vec, temporal, and CTDNE-biased temporal walks.

TPU-native re-design of /root/reference/src/algo/random_walk.rs.  The
reference walks each start node sequentially with per-step rejection loops
and even torch tensor ops inside the inner loop (rs:250-260).  Here all
walks advance in lockstep under one ``lax.scan`` over steps (SURVEY §7.1(4)):

* **node2vec** (rs:10-75): the unbounded rejection loop (rs:52-66) becomes a
  bounded ``NUM_TRIALS`` masked trial sweep — each trial draws a uniform
  neighbor for every active walk and applies the Knightking accept rule
  (1/p back-edge, 1 for distance-1 via batched binary-search ``has_edge``,
  1/q for distance-2).  Walks that accept keep their first accepted
  candidate; walks where all trials reject fall back to the final trial's
  candidate (uniform) — a bounded-bias approximation documented per SURVEY
  §7.3; with p,q in [0.25, 4] and 16 trials the residual probability of
  hitting the fallback is < (1 - min-accept)^16 ~ 1e-2 worst-case.
* **tempo_random_walk** (rs:80-158): per-step single uniform draw from the
  root-window-admissible neighbor set (1-slot reservoir == uniform choice)
  via the chunked Gumbel engine; dead ends restart from a uniformly chosen
  earlier position of the same walk (rs:144-148), reading the carried walk
  buffer.
* **biased_tempo_random_walk** (rs:185-288): forward-in-time admissibility
  (``cur_ts <= t``), per-step weighted draw via Gumbel-max with log-weights
  computed *unnormalised* (softmax never materialised): Exponential bias
  ``logw = +-(t_cur - t)`` (rs:175-179); Linear bias uses true
  closeness-ranks — the reference's ``argsort`` output used directly as
  ranks (rs:170-174) is a rank/argsort confusion we do not replicate
  (SURVEY §7.4).  Whole-walk retry up to ``retry_count`` on dead end.

Timestamp conventions follow the reference: ``-1`` is the NaN timestamp
(rs:77); edge timestamp falls back to the dst node's timestamp when NaN
(rs:121-127); windows here are half-open ``[t0+w0, t0+w1)`` (Range,
rs:111) unlike the inclusive neighbor-sampling filter.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import CsrGraph, make_graph
from ..utils.types import NAN_TIMESTAMP
from . import primitives, rng
from .neighbor import _aligned_window_values, _select_lanes

NUM_TRIALS = 16  # bounded replacement for the reference's unbounded loop


# ---------------------------------------------------------------------------
# node2vec
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("walk_length", "num_trials"))
def _random_walk_impl(key, graph: CsrGraph, start, walk_length: int,
                      p: jax.Array, q: jax.Array, num_trials: int):
    B = start.shape[0]
    start = start.astype(jnp.int32)

    # Rejection probabilities (rs:29-36), traced so p/q changes don't recompile.
    inv_p, inv_q = 1.0 / p, 1.0 / q
    max_prob = jnp.maximum(jnp.maximum(inv_p, 1.0), inv_q)
    prob0 = inv_p / max_prob   # back to previous node
    prob1 = 1.0 / max_prob     # distance-1 (triangle) node
    prob2 = inv_q / max_prob   # distance-2 node

    use_ell = graph.ell is not None

    def step(carry, step_key):
        if use_ell:
            # ELL path: the walker carries its CURRENT node's neighbor row,
            # so each trial costs ONE row access (the candidate's row, also
            # needed as next step's carry) and the distance-1 probe
            # ``has_edge(cand, prev)`` becomes a VPU compare of ``prev``
            # against the candidate's fetched lanes — replacing the
            # log(max_degree) binary-search gathers per trial.
            prev, cur, active, cur_lanes, cur_deg = carry
            deg = cur_deg
        else:
            prev, cur, active = carry
            starts, ends = graph.neighbors_range(
                jnp.clip(cur, 0, graph.num_ptr_nodes - 1))
            deg = ends - starts
        active = jnp.logical_and(active, deg > 0)  # dead end breaks the walk

        chosen = jnp.full((B,), -1, jnp.int32)
        accepted = jnp.zeros((B,), jnp.bool_)
        if use_ell:
            W = cur_lanes.shape[-1]
            lane_iota = jnp.arange(W, dtype=jnp.int32)
            chosen_lanes = cur_lanes
            chosen_deg = cur_deg
        for t in range(num_trials):
            tkey = jax.random.fold_in(step_key, t)
            pos = jax.random.randint(tkey, (B,), 0, jnp.maximum(deg, 1))
            if use_ell:
                cand = jnp.sum(jnp.where(pos[:, None] == lane_iota,
                                         cur_lanes, 0), axis=-1)
                cand_lanes, cand_deg, _ = graph.ell_rows(
                    jnp.clip(cand, 0, graph.num_ptr_nodes - 1))
                lane_valid = lane_iota < cand_deg[:, None]
                is_tri = jnp.any(jnp.logical_and(
                    cand_lanes == prev[:, None], lane_valid), axis=-1)
            else:
                cand = graph.gather_neighbors(starts + pos)
                is_tri = graph.has_edge(cand, prev)  # binary search (rs:59)
            r = jax.random.uniform(jax.random.fold_in(tkey, 1), (B,))
            is_back = cand == prev
            acc = jnp.where(is_back, r < prob0,
                            jnp.where(is_tri, r < prob1, r < prob2))
            take = jnp.logical_and(jnp.logical_not(accepted), acc)
            if t == num_trials - 1:  # bounded-bias fallback: accept last draw
                take = jnp.logical_or(take, jnp.logical_not(accepted))
            chosen = jnp.where(take, cand, chosen)
            if use_ell:
                chosen_lanes = jnp.where(take[:, None], cand_lanes, chosen_lanes)
                chosen_deg = jnp.where(take, cand_deg, chosen_deg)
            accepted = jnp.logical_or(accepted, acc)

        nxt = jnp.where(active, chosen, -1)
        new_prev = jnp.where(active, cur, prev)
        new_cur = jnp.where(active, nxt, cur)
        if use_ell:
            new_lanes = jnp.where(active[:, None], chosen_lanes, cur_lanes)
            new_deg = jnp.where(active, chosen_deg, cur_deg)
            return (new_prev, new_cur, active, new_lanes, new_deg), nxt
        return (new_prev, new_cur, active), nxt

    step_keys = jax.random.split(key, walk_length)
    if use_ell:
        lanes0, deg0, _ = graph.ell_rows(
            jnp.clip(start, 0, graph.num_ptr_nodes - 1))
        init = (jnp.full((B,), -1, jnp.int32), start,
                jnp.ones((B,), jnp.bool_), lanes0, deg0)
    else:
        init = (jnp.full((B,), -1, jnp.int32), start, jnp.ones((B,), jnp.bool_))
    _, steps = jax.lax.scan(step, init, step_keys)
    return jnp.concatenate([start[:, None], steps.T.astype(jnp.int32)], axis=1)


def random_walk(row_ptrs, col_indices, start, walk_length: int,
                p: float = 1.0, q: float = 1.0, *,
                key: Optional[jax.Array] = None,
                num_trials: int = NUM_TRIALS) -> np.ndarray:
    """Reference-parity node2vec walk (tch_geometric.pyi:83-91).

    Returns [num_starts, walk_length + 1]; broken walks padded with -1
    (rs:19-23)."""
    if key is None:
        key = rng.next_key()
    graph = _csr_from_parts(row_ptrs, col_indices)
    if p == 1.0 and q == 1.0:
        num_trials = 1       # accept probability is 1: first draw always wins
    walks = _random_walk_impl(key, graph, jnp.asarray(start), int(walk_length),
                              jnp.float32(p), jnp.float32(q), int(num_trials))
    return np.asarray(walks).astype(np.int64)


def _csr_from_parts(row_ptrs, col_indices) -> CsrGraph:
    row_ptrs = np.asarray(row_ptrs)
    col_indices = np.asarray(col_indices)
    return make_graph(row_ptrs, col_indices,
                      num_src=row_ptrs.shape[0] - 1,
                      num_dst=int(col_indices.max(initial=-1)) + 1)


# ---------------------------------------------------------------------------
# temporal walk helpers
# ---------------------------------------------------------------------------

def _neighbor_ts(graph, edge_ts, node_ts, eptr):
    """Edge ts with node-ts fallback when NaN (rs:121-127)."""
    ets = edge_ts[eptr]
    nts = node_ts[graph.gather_neighbors(eptr)]
    return jnp.where(ets != NAN_TIMESTAMP, ets, nts)


# ---------------------------------------------------------------------------
# tempo_random_walk
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("walk_length", "window_chunk"))
def _tempo_walk_impl(key, graph: CsrGraph, node_ts, edge_ts, start, start_ts,
                     walk_length: int, win_lo: jax.Array, win_hi: jax.Array,
                     window_chunk: int):
    B = start.shape[0]
    L = walk_length
    start = start.astype(jnp.int32)
    start_ts = start_ts.astype(jnp.int32)
    # Root-anchored half-open window [start_ts + w0, start_ts + w1) (rs:111).
    lo = start_ts + win_lo
    hi = start_ts + win_hi
    root_nan = start_ts == NAN_TIMESTAMP

    use_ell = graph.ell is not None
    if use_ell:
        # Effective per-edge ts (NaN falls back to dst-node ts, rs:121-127)
        # precomputed ONCE as an (E,) array so the per-step window reads are
        # ~2 aligned row accesses per walk (windowed-values engine,
        # sampling/neighbor.py) instead of 2 gathers per window lane.
        ts_eff = jnp.where(edge_ts != NAN_TIMESTAMP, edge_ts,
                           node_ts[graph.indices])
        P = max(graph.max_degree, 1)
        lane_iota = jnp.arange(P, dtype=jnp.int32)

    def step(carry, inp):
        l, step_key = inp
        r_node, r_ts, cur = carry
        if use_ell:
            lanes, deg, starts = graph.ell_rows(
                jnp.clip(cur, 0, graph.num_ptr_nodes - 1))
            t = _aligned_window_values(ts_eff, starts, P)
            in_win = jnp.logical_and(t >= lo[:, None], t < hi[:, None])
            adm = jnp.logical_and(
                lane_iota[None, :] < deg[:, None],
                jnp.logical_or(jnp.logical_or(t == NAN_TIMESTAMP,
                                              root_nan[:, None]), in_win))
            noise = jax.random.gumbel(step_key, (B, P), jnp.float32)
            keysv = jnp.where(adm, noise, -jnp.inf)
            pos1 = jnp.argmax(keysv, axis=-1).astype(jnp.int32)
            ok = jnp.isfinite(jnp.max(keysv, axis=-1))
            nxt = _select_lanes(lanes, pos1[:, None])[:, 0]
            nxt_ts = _select_lanes(t, pos1[:, None])[:, 0]
        else:
            starts, ends = graph.neighbors_range(
                jnp.clip(cur, 0, graph.num_ptr_nodes - 1))
            deg = ends - starts

            def mask_at(eptr):
                t = _neighbor_ts(graph, edge_ts, node_ts, eptr)
                in_win = jnp.logical_and(t >= lo[:, None], t < hi[:, None])
                return jnp.logical_or(
                    jnp.logical_or(t == NAN_TIMESTAMP, root_nan[:, None]),
                    in_win)

            pos, valid = primitives.window_choice_sample(
                step_key, starts, deg, 1,
                max_degree=graph.max_degree, num_edges=graph.num_edges,
                mask_at=mask_at, window=window_chunk)
            eptr = jnp.clip(starts + pos[:, 0], 0, max(graph.num_edges - 1, 0))
            nxt = graph.gather_neighbors(eptr)
            nxt_ts = _neighbor_ts(graph, edge_ts, node_ts, eptr)
            ok = valid[:, 0]

        # Dead end: restart from a uniformly chosen earlier position of the
        # SAME walk (rs:144-148).  The uniform prefix position is held as a
        # per-walk reservoir candidate (replace with prob 1/(l+1)) so the
        # scan carries O(B) state instead of the (B, L) walk buffers —
        # exactly Algorithm R over positions 0..l.
        nxt = jnp.where(ok, nxt, r_node)
        nxt_ts = jnp.where(ok, nxt_ts, r_ts)

        take = jax.random.uniform(jax.random.fold_in(step_key, 7), (B,)) \
            < 1.0 / (l + 2).astype(jnp.float32)
        new_r_node = jnp.where(take, nxt, r_node)
        new_r_ts = jnp.where(take, nxt_ts, r_ts)
        return (new_r_node, new_r_ts, nxt), (nxt, nxt_ts)

    if L <= 1:
        return start[:, None], start_ts[:, None]
    ls = jnp.arange(L - 1)
    step_keys = jax.random.split(key, L - 1)
    _, (steps, steps_ts) = jax.lax.scan(
        step, (start, start_ts, start), (ls, step_keys))
    walks = jnp.concatenate([start[:, None], steps.T], axis=1)
    ts_buf = jnp.concatenate([start_ts[:, None], steps_ts.T], axis=1)
    return walks, ts_buf


def tempo_random_walk(row_ptrs, col_indices, node_timestamps, edge_timestamps,
                      start, start_timestamps, walk_length: int,
                      window: Tuple[int, int], *,
                      key: Optional[jax.Array] = None,
                      window_chunk: int = 256):
    """Reference-parity temporal walk (tch_geometric.pyi:94-103).

    Returns (walks, walk_timestamps), both [num_starts, walk_length]."""
    if key is None:
        key = rng.next_key()
    graph = _csr_from_parts(row_ptrs, col_indices)
    walks, ts = _tempo_walk_impl(
        key, graph,
        jnp.asarray(node_timestamps, jnp.int32),
        jnp.asarray(edge_timestamps, jnp.int32),
        jnp.asarray(start), jnp.asarray(start_timestamps),
        int(walk_length), jnp.int32(window[0]), jnp.int32(window[1]),
        int(window_chunk))
    return np.asarray(walks).astype(np.int64), np.asarray(ts).astype(np.int64)


# ---------------------------------------------------------------------------
# CTDNE biased temporal walk
# ---------------------------------------------------------------------------

WALK_BIAS_UNIFORM = "uniform"
WALK_BIAS_LINEAR = "linear"
WALK_BIAS_EXPONENTIAL = "exponential"


@functools.partial(jax.jit, static_argnames=(
    "walk_length", "walk_bias", "forward", "retry_count"))
def _biased_tempo_walk_impl(key, graph: CsrGraph, node_ts, edge_ts, start,
                            start_ts, walk_length: int, walk_bias: str,
                            forward: bool, retry_count: int):
    B = start.shape[0]
    L = walk_length
    start = start.astype(jnp.int32)
    start_ts = start_ts.astype(jnp.int32)
    D = max(graph.max_degree, 1)
    use_ell = graph.ell is not None
    if use_ell:
        # See _tempo_walk_impl: one (E,) effective-ts precompute turns the
        # per-step (B, D) eptr/ts/neighbor gathers into ~3 aligned row
        # accesses per walk.
        ts_eff = jnp.where(edge_ts != NAN_TIMESTAMP, edge_ts,
                           node_ts[graph.indices])

    def attempt(att_key):
        def step(carry, inp):
            l, step_key = inp
            cur, cur_ts, alive = carry
            pos = jnp.arange(D, dtype=jnp.int32)[None, :]
            if use_ell:
                lanes, deg, starts = graph.ell_rows(
                    jnp.clip(cur, 0, graph.num_ptr_nodes - 1))
                t = _aligned_window_values(ts_eff, starts, D)
            else:
                starts, ends = graph.neighbors_range(
                    jnp.clip(cur, 0, graph.num_ptr_nodes - 1))
                deg = ends - starts
                eptr = jnp.clip(starts[:, None] + pos,
                                0, max(graph.num_edges - 1, 0))
                t = _neighbor_ts(graph, edge_ts, node_ts, eptr)
            in_deg = pos < deg[:, None]
            # Forward-in-time admissibility (rs:238-248): NaN ts always pass.
            adm = jnp.logical_or(
                jnp.logical_or(t == NAN_TIMESTAMP, cur_ts[:, None] == NAN_TIMESTAMP),
                cur_ts[:, None] <= t)
            adm = jnp.logical_and(adm, in_deg)

            # Weight times: NaN -> cur_ts (rs:252).
            wt = jnp.where(t == NAN_TIMESTAMP, cur_ts[:, None], t)
            if walk_bias == WALK_BIAS_EXPONENTIAL:
                delta = jnp.where(forward, cur_ts[:, None] - wt, wt - cur_ts[:, None])
                logw = delta.astype(jnp.float32)
            elif walk_bias == WALK_BIAS_LINEAR:
                # True closeness-rank: closest admissible time -> highest
                # weight (fixes the argsort/rank confusion, rs:170-174).
                key_t = jnp.where(adm, wt, jnp.iinfo(jnp.int32).max)
                order = jnp.argsort(key_t, axis=1)              # ascending time
                rank = jnp.zeros_like(order).at[
                    jnp.arange(B)[:, None], order].set(pos)
                n_adm = adm.sum(axis=1, keepdims=True)
                logw = jnp.log(jnp.maximum(n_adm - rank, 1).astype(jnp.float32))
            else:
                logw = jnp.zeros((B, D), jnp.float32)
            # cur_ts NaN -> uniform regardless of bias (rs:255-258).
            logw = jnp.where(cur_ts[:, None] == NAN_TIMESTAMP, 0.0, logw)
            logw = jnp.where(adm, logw, primitives.NEG_INF)

            g = jax.random.gumbel(step_key, (B, D), jnp.float32)
            score = jnp.where(adm, logw + g, primitives.NEG_INF)
            best = jnp.argmax(score, axis=1)
            ok = jnp.logical_and(jnp.any(adm, axis=1), alive)

            if use_ell:
                nxt = _select_lanes(lanes, best[:, None].astype(jnp.int32))[:, 0]
                nxt_ts = _select_lanes(t, best[:, None].astype(jnp.int32))[:, 0]
            else:
                nxt = graph.gather_neighbors(
                    jnp.clip(starts + best, 0, max(graph.num_edges - 1, 0)))
                nxt_ts = t[jnp.arange(B), best]

            new_cur = jnp.where(ok, nxt, cur)
            # cur_ts only advances on non-NaN draw (rs:277-279).
            new_cur_ts = jnp.where(
                jnp.logical_and(ok, nxt_ts != NAN_TIMESTAMP), nxt_ts, cur_ts)
            return ((new_cur, new_cur_ts, ok),
                    (jnp.where(ok, nxt, -1), jnp.where(ok, nxt_ts, -1)))

        if L <= 1:
            return (start[:, None], start_ts[:, None],
                    jnp.ones((B,), jnp.bool_))
        ls = jnp.arange(L - 1)
        step_keys = jax.random.split(att_key, L - 1)
        (_, _, alive), (steps, steps_ts) = jax.lax.scan(
            step, (start, start_ts, jnp.ones((B,), jnp.bool_)),
            (ls, step_keys))
        walks = jnp.concatenate([start[:, None], steps.T], axis=1)
        ts_buf = jnp.concatenate([start_ts[:, None], steps_ts.T], axis=1)
        return walks, ts_buf, alive  # alive == completed all steps

    # Whole-walk retry (rs:216,270-273) as a data-dependent while loop:
    # most batches finish in one attempt, so the loop usually runs once
    # instead of retry_count times (a fori_loop re-ran the full L-step scan
    # per retry even with every walk already complete).
    def retry_cond(carry):
        i, _w, _t, done = carry
        return jnp.logical_and(i < max(retry_count, 1),
                               jnp.logical_not(jnp.all(done)))

    def retry_body(carry):
        i, walks, ts_buf, done = carry
        w, t, ok = attempt(jax.random.fold_in(key, i))
        take = jnp.logical_not(done)[:, None]
        return (i + 1, jnp.where(take, w, walks), jnp.where(take, t, ts_buf),
                jnp.logical_or(done, ok))

    walks = jnp.full((B, L), -1, jnp.int32)
    ts_buf = jnp.full((B, L), -1, jnp.int32)
    done = jnp.zeros((B,), jnp.bool_)
    _, walks, ts_buf, done = jax.lax.while_loop(
        retry_cond, retry_body, (jnp.int32(0), walks, ts_buf, done))
    return walks, ts_buf


def biased_tempo_random_walk(row_ptrs, col_indices, node_timestamps,
                             edge_timestamps, start, start_timestamps,
                             walk_length: int, walk_bias: str,
                             forward: bool = True, retry_count: int = 10, *,
                             key: Optional[jax.Array] = None):
    """Reference-parity CTDNE walk (tch_geometric.pyi:107-119)."""
    if key is None:
        key = rng.next_key()
    assert walk_bias in (WALK_BIAS_UNIFORM, WALK_BIAS_LINEAR,
                         WALK_BIAS_EXPONENTIAL), walk_bias
    graph = _csr_from_parts(row_ptrs, col_indices)
    walks, ts = _biased_tempo_walk_impl(
        key, graph,
        jnp.asarray(node_timestamps, jnp.int32),
        jnp.asarray(edge_timestamps, jnp.int32),
        jnp.asarray(start), jnp.asarray(start_timestamps),
        int(walk_length), walk_bias, bool(forward), int(retry_count))
    return np.asarray(walks).astype(np.int64), np.asarray(ts).astype(np.int64)
