"""Batched sampling primitives — the TPU replacements for the reference's
sequential reservoir loops (/root/reference/src/utils/sampling.rs:6-82).

Design (SURVEY §7.1): sampling is re-expressed as fixed-shape batched XLA
programs.  Three engines cover the reference's sampler family:

* :func:`floyd_sample` — exact uniform k-subset of ``[0, deg)`` per node via
  Floyd's algorithm; replaces Algorithm-R reservoir sampling
  (sampling.rs:6-26) for the unweighted/unfiltered case with **no** window
  materialisation, so it is degree-independent: O(k^2) vectorised compares.
* :func:`replacement_positions` — ``randint`` into degree ranges; replaces
  ``replacement_sampling`` (sampling.rs:57-82).
* :func:`window_topk_sample` / :func:`window_choice_sample` — chunked
  Gumbel-top-k over (masked) neighbor windows; replaces the weighted
  reservoir (A-Chao-like, sampling.rs:28-55) and any filtered sampling.
  Gumbel-top-k draws a weighted sample *without replacement* under
  Efraimidis–Spirakis/Plackett-Luce semantics — distributionally the
  sequential weighted draw the reservoir approximates (SURVEY §7.3 notes the
  equivalence is distributional, not bit-exact).  The window is scanned in
  chunks of ``W`` with a running top-k carry, so arbitrary degrees are exact
  with fixed shapes; chunk count is ``ceil(max_degree / W)`` (static).

All functions take an explicit key and are jit/vmap-friendly.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")  # python literal: package import must not
#   create device arrays (jax.distributed.initialize needs an
#   uninitialised backend; see parallel/multihost.py)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Uniform k-subset: Floyd's algorithm
# ---------------------------------------------------------------------------

def floyd_sample(key: jax.Array, deg: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact uniform sample of ``min(k, deg)`` distinct positions in
    ``[0, deg)`` for each element of ``deg``.

    Returns ``(positions, valid)`` of shape ``deg.shape + (k,)``.  Invalid
    slots hold position 0 with ``valid=False``.

    Floyd's algorithm: for j in deg-k..deg-1 draw t ~ U[0, j]; insert j if t
    already chosen else t.  Exactly uniform over k-subsets; the membership
    check is a k-wide vector compare, so total cost is O(k^2) VPU compares
    independent of degree — unlike the reference's reservoir which streams
    all ``deg`` edges (sampling.rs:6-26).
    """
    deg = jnp.asarray(deg)
    batch_shape = deg.shape
    degc = deg.astype(jnp.int32)

    def body(i, chosen):
        j = degc - (k - i)  # insertion candidate; may be < 0 when deg < k
        hi = jnp.maximum(j + 1, 1)
        t = jax.random.randint(jax.random.fold_in(key, i), batch_shape, 0, hi,
                               dtype=jnp.int32)
        hit = jnp.any(chosen == t[..., None], axis=-1)
        new = jnp.where(hit, j, t)
        return chosen.at[..., i].set(new)

    # init derived from degc (not a fresh constant) so it inherits degc's
    # shard_map varying-manual-axes type — a constant init fails vma typing
    # when floyd runs per-device inside shard_map
    init = (degc * 0 - 1)[..., None] * jnp.ones((k,), jnp.int32)
    chosen = jax.lax.fori_loop(0, k, body, init)

    # deg <= k: take every position [0, deg)
    iota = jnp.arange(k, dtype=jnp.int32)
    take_all = (degc <= k)[..., None]
    positions = jnp.where(take_all, jnp.broadcast_to(iota, chosen.shape), chosen)
    valid = jnp.where(take_all, iota < degc[..., None], degc[..., None] > 0)
    positions = jnp.where(valid, positions, 0)
    return positions, valid


def uniform_lane_topk(key: jax.Array, deg: jax.Array, num_lanes: int,
                      k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact uniform k-subset of ``[0, deg)`` when ``deg <= num_lanes``.

    Loop-free alternative to :func:`floyd_sample` for ELL-resident rows:
    rank every lane by one uniform draw and take the top ``k`` among lanes
    ``< deg`` — a uniformly random k-subset (random-ranking argument, same
    distribution as the reference's reservoir, sampling.rs:6-26).  One fused
    ``(B, L)`` draw + ``top_k`` replaces Floyd's k-iteration carried loop,
    which at the HGT/budget samplers' MAX_NEIGHBORS=50 cap costs 50
    sequential XLA while-loop steps per call.

    Returns ``(positions, valid)`` of shape ``deg.shape + (k,)``; invalid
    slots hold position 0.  Valid slots are the first ``min(deg, k)`` along
    the last axis (-inf lanes sort last), matching floyd_sample's layout.
    """
    deg = jnp.asarray(deg).astype(jnp.int32)
    lane = jnp.arange(num_lanes, dtype=jnp.int32)
    r = jax.random.uniform(key, deg.shape + (num_lanes,), jnp.float32)
    vals = jnp.where(lane < deg[..., None], r, NEG_INF)
    kk = min(k, num_lanes)
    top_vals, pos = jax.lax.top_k(vals, kk)
    valid = jnp.isfinite(top_vals)
    if kk < k:
        pad = [(0, 0)] * deg.ndim + [(0, k - kk)]
        pos = jnp.pad(pos, pad)
        valid = jnp.pad(valid, pad)
    return jnp.where(valid, pos, 0), valid


# ---------------------------------------------------------------------------
# With replacement: randint positions
# ---------------------------------------------------------------------------

def replacement_positions(key: jax.Array, deg: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """``k`` independent uniform positions in ``[0, deg)`` per node
    (replacement_sampling, sampling.rs:57-82).  Empty rows -> invalid."""
    deg = jnp.asarray(deg).astype(jnp.int32)
    hi = jnp.maximum(deg, 1)[..., None]
    positions = jax.random.randint(key, deg.shape + (k,), 0, hi, dtype=jnp.int32)
    valid = jnp.broadcast_to((deg > 0)[..., None], positions.shape)
    return jnp.where(valid, positions, 0), valid


# ---------------------------------------------------------------------------
# Chunked Gumbel top-k over neighbor windows
# ---------------------------------------------------------------------------

def _window_chunk_logits(
    chunk: jax.Array,
    starts: jax.Array,
    degs: jax.Array,
    window: int,
    num_edges: int,
    logw_at: Optional[Callable[[jax.Array], jax.Array]],
    mask_at: Optional[Callable[[jax.Array], jax.Array]],
):
    """Per-chunk (B, W) log-weights with invalid/filtered lanes at -inf.

    Returns (positions (B, W), logits (B, W))."""
    offs = chunk * window + jnp.arange(window, dtype=jnp.int32)  # (W,)
    pos = jnp.broadcast_to(offs, degs.shape + (window,))
    valid = pos < degs[..., None]
    eptr = jnp.clip(starts[..., None] + pos, 0, max(num_edges - 1, 0))
    logits = jnp.zeros(pos.shape, jnp.float32)
    if logw_at is not None:
        logits = logw_at(eptr).astype(jnp.float32)
    if mask_at is not None:
        valid = jnp.logical_and(valid, mask_at(eptr))
    logits = jnp.where(valid, logits, NEG_INF)
    return pos, logits


def window_topk_sample(
    key: jax.Array,
    starts: jax.Array,
    degs: jax.Array,
    k: int,
    *,
    max_degree: int,
    num_edges: int,
    logw_at: Optional[Callable[[jax.Array], jax.Array]] = None,
    mask_at: Optional[Callable[[jax.Array], jax.Array]] = None,
    window: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """Weighted sample WITHOUT replacement of ``k`` window positions.

    ``starts``/``degs``: (B,) neighbor-window start edge-ptrs and sizes.
    ``logw_at(eptr)``: log-weights by global edge ptr (None = uniform).
    ``mask_at(eptr)``: admissibility by global edge ptr (temporal filters).

    Gumbel-top-k with a running (B, k) carry over ``ceil(max_degree/W)``
    chunks.  Returns (positions (B, k) window-relative, valid (B, k)).
    """
    starts = jnp.asarray(starts).astype(jnp.int32)
    degs = jnp.asarray(degs).astype(jnp.int32)
    B = starts.shape[0]
    n_chunks = max(1, cdiv(max(max_degree, 1), window))

    init_vals = jnp.full((B, k), NEG_INF)
    init_pos = jnp.zeros((B, k), jnp.int32)

    def body(c, carry):
        top_vals, top_pos = carry
        pos, logits = _window_chunk_logits(
            c, starts, degs, window, num_edges, logw_at, mask_at)
        noise = jax.random.gumbel(jax.random.fold_in(key, c), pos.shape, jnp.float32)
        keys_ = jnp.where(jnp.isfinite(logits), logits + noise, NEG_INF)
        all_vals = jnp.concatenate([top_vals, keys_], axis=1)
        all_pos = jnp.concatenate([top_pos, pos], axis=1)
        new_vals, idx = jax.lax.top_k(all_vals, k)
        new_pos = jnp.take_along_axis(all_pos, idx, axis=1)
        return new_vals, new_pos

    top_vals, top_pos = jax.lax.fori_loop(0, n_chunks, body, (init_vals, init_pos))
    valid = jnp.isfinite(top_vals)
    return jnp.where(valid, top_pos, 0), valid


def window_choice_sample(
    key: jax.Array,
    starts: jax.Array,
    degs: jax.Array,
    k: int,
    *,
    max_degree: int,
    num_edges: int,
    logw_at: Optional[Callable[[jax.Array], jax.Array]] = None,
    mask_at: Optional[Callable[[jax.Array], jax.Array]] = None,
    window: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """``k`` INDEPENDENT weighted draws (with replacement) per window.

    Each draw is a Gumbel-argmax over the admissible window; the chunk loop
    carries a per-draw running max.  Matches ``UnweightedSampler<true>`` /
    filtered with-replacement semantics (neighbor_sampling.rs:111-123):
    every draw succeeds iff the admissible set is non-empty.
    """
    starts = jnp.asarray(starts).astype(jnp.int32)
    degs = jnp.asarray(degs).astype(jnp.int32)
    B = starts.shape[0]
    n_chunks = max(1, cdiv(max(max_degree, 1), window))

    init_vals = jnp.full((B, k), NEG_INF)
    init_pos = jnp.zeros((B, k), jnp.int32)

    def body(c, carry):
        best_vals, best_pos = carry
        pos, logits = _window_chunk_logits(
            c, starts, degs, window, num_edges, logw_at, mask_at)
        noise = jax.random.gumbel(
            jax.random.fold_in(key, c), (B, k, pos.shape[-1]), jnp.float32)
        total = jnp.where(jnp.isfinite(logits)[:, None, :],
                          logits[:, None, :] + noise, NEG_INF)  # (B, k, W)
        chunk_best = jnp.max(total, axis=-1)
        chunk_arg = jnp.argmax(total, axis=-1).astype(jnp.int32)
        chunk_pos = jnp.take_along_axis(
            jnp.broadcast_to(pos[:, None, :], total.shape).reshape(B * k, -1),
            chunk_arg.reshape(B * k, 1), axis=1).reshape(B, k)
        better = chunk_best > best_vals
        return (jnp.where(better, chunk_best, best_vals),
                jnp.where(better, chunk_pos, best_pos))

    best_vals, best_pos = jax.lax.fori_loop(0, n_chunks, body, (init_vals, init_pos))
    valid = jnp.isfinite(best_vals)
    return jnp.where(valid, best_pos, 0), valid


# ---------------------------------------------------------------------------
# Segment utilities used by several samplers
# ---------------------------------------------------------------------------

def masked_gumbel_topk(key: jax.Array, logits: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Gumbel-top-k over an explicit (already materialised) logit row set.

    ``logits``: (..., N) with -inf marking invalid entries.  Returns
    (indices (..., k), valid (..., k)).  Used where the candidate set is a
    dense table rather than a CSR window (HGT budget scores, per-node budget
    candidate lists).
    """
    noise = jax.random.gumbel(key, logits.shape, jnp.float32)
    keys_ = jnp.where(jnp.isfinite(logits), logits + noise, NEG_INF)
    vals, idx = jax.lax.top_k(keys_, k)
    valid = jnp.isfinite(vals)
    return jnp.where(valid, idx, 0), valid
