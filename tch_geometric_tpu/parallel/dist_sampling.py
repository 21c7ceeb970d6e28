"""Distributed neighbor sampling over a PARTITIONED graph topology.

The last distributed piece of SURVEY §7.3 ("Multi-host frontier ownership"):
``parallel/sharded_features.py`` shards the feature table but replicates the
adjacency on every device.  Here the TOPOLOGY itself is partitioned — each
device owns only the adjacency rows of nodes ``v % P == dev`` (the same
interleaved owner rule as the feature table, so one ownership function
serves both) — and every sampling hop becomes the two-exchange protocol the
survey prescribes: an ``all_to_all`` routes frontier requests to the owners
of the frontier nodes, each owner samples its local rows, and a second
``all_to_all`` routes the sampled (neighbor, edge-ptr, valid) triples back.
This is what makes billion-edge graphs (ogbn-papers100M-class: topology
alone is tens of GB) trainable: no device ever materialises more than
``E / P`` edges or ``N / P`` feature rows.

Reproducibility is stronger than the reference's (whose global mutex'd
SmallRng makes draws depend on call order, /root/reference/src/utils/
random.rs:8-23): every draw is keyed by ``fold_in(key, hop, slot_uid)``
where ``slot_uid`` is the node's slot in the *global* sample tree over the
whole (device-count-independent) seed batch.  Requesters ship the uid with
the request, owners fold it — so the sampled trees are **bit-identical for
any number of devices** (tests/test_dist_sampling.py pins P=1 == P=2 == P=4).

Static shapes: per-owner request capacity per hop is
``capacity_factor * ceil(L_hop / P)`` (interleaved ownership concentrates
per-owner counts tightly around ``L/P``); overflowing requests produce
invalid subtrees and are counted in the returned diagnostics, mirroring
``sharded_features.halo_gather``.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import ell_width_for
from ..sampling import rng
from ..sampling.neighbor import (NeighborSample, _filter_mask_from_ts,
                                 _layer_layout, _select_lanes)
from ..utils.config import TEMPORAL_SAMPLE_DYNAMIC, TemporalEdgeFilter
from .sharded_features import halo_gather
from .train import TrainState


@struct.dataclass
class PartitionedGraph:
    """Interleave-partitioned CSC adjacency (device pytree).

    Owner of global node ``v`` is ``v % num_parts``; its local row is
    ``v // num_parts``.  Every array has leading length ``P * rows_per_part``
    (or ``P * local_edge_cap``) so a ``PartitionSpec(axis)`` prefix shards it
    one owner block per device inside ``shard_map``.

    ``lindices`` holds neighbor GLOBAL ids (the sampled frontier must be
    re-routable next hop); ``gstart`` keeps the row's *global* CSC edge ptr
    so emitted edge ptrs stay in the reference's global edge space
    (graph.rs:123-146 COO builder semantics).
    """

    ldeg: jax.Array       # (P*Np,) int32 row degree
    lstart: jax.Array     # (P*Np,) int32 row start within the owner's shard
    gstart: jax.Array     # (P*Np,) int32 global CSC edge ptr of the row
    lindices: jax.Array   # (P*Emax,) int32 neighbor global ids
    # Optional ELL fast path: one row fetch per request (lanes [0, W-2) are
    # neighbor ids, W-2 degree, W-1 global start) — data/graph.py layout.
    ell: Optional[jax.Array] = None   # (P*Np, W) int32
    # Optional per-edge attributes, partitioned with the topology (the
    # distributed analogue of WeightedEdgeSampler weights / TemporalEdgeFilter
    # timestamps, which at scale must live with their owner's edges).
    llogw: Optional[jax.Array] = None   # (P*Emax,) f32 LOG edge weights
    lts: Optional[jax.Array] = None     # (P*Emax,) i32 edge timestamps
    ell_logw: Optional[jax.Array] = None  # (P*Np, W-2) f32 ELL-aligned
    ell_ts: Optional[jax.Array] = None    # (P*Np, W-2) i32 ELL-aligned
    num_nodes: int = struct.field(pytree_node=False, default=0)
    num_parts: int = struct.field(pytree_node=False, default=1)
    rows_per_part: int = struct.field(pytree_node=False, default=0)
    local_edge_cap: int = struct.field(pytree_node=False, default=0)
    max_degree: int = struct.field(pytree_node=False, default=0)


def build_partitioned_graph(indptr, indices, num_parts: int, *,
                            edge_weights=None, edge_timestamps=None,
                            ell_table: Optional[bool] = None
                            ) -> PartitionedGraph:
    """Host-side partitioner: global CSC -> interleaved per-owner shards.

    Fully vectorized (one stable O(E) sort + O(N) scans) so billion-edge
    inputs partition at array speed, like the native CSC builder — no
    per-row Python; the CSC's global-row order already equals each owner's
    local-row order (rows p, p+P, p+2P, ... are increasing), so a stable
    sort of edges by owner is the whole reshuffle.
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    N = indptr.shape[0] - 1
    E = indices.shape[0]
    Pn = int(num_parts)
    Np = -(-N // Pn) if N else 1
    deg = np.diff(indptr)
    max_deg = int(deg.max()) if N else 0

    ldeg = np.zeros((Pn * Np,), np.int32)
    lstart = np.zeros((Pn * Np,), np.int32)
    gstart = np.zeros((Pn * Np,), np.int32)
    counts = np.zeros((Pn,), np.int64)
    for p in range(Pn):
        d = deg[p::Pn]
        n_p = d.shape[0]
        ldeg[p * Np: p * Np + n_p] = d
        lstart[p * Np: p * Np + n_p] = np.cumsum(d) - d
        gstart[p * Np: p * Np + n_p] = indptr[:-1][p::Pn]
        counts[p] = d.sum()
    emax = max(1, int(counts.max()) if N else 1)

    logw = None
    if edge_weights is not None:
        logw = np.log(np.asarray(edge_weights, dtype=np.float32))
    ts = None
    if edge_timestamps is not None:
        ts = np.asarray(edge_timestamps, dtype=np.int32)

    lind = np.zeros((Pn * emax,), np.int32)
    llogw = np.zeros((Pn * emax,), np.float32) if logw is not None else None
    lts = np.zeros((Pn * emax,), np.int32) if ts is not None else None
    if E:
        edge_owner = (np.repeat(np.arange(N, dtype=np.int64), deg)
                      % Pn).astype(np.int32)
        order = np.argsort(edge_owner, kind="stable")
        starts_p = np.concatenate([[0], np.cumsum(counts)[:-1]])
        dst = (np.arange(E, dtype=np.int64) - starts_p[edge_owner[order]]
               + np.int64(emax) * edge_owner[order])
        lind[dst] = indices[order]
        if llogw is not None:
            llogw[dst] = logw[order]
        if lts is not None:
            lts[dst] = ts[order]

    W = ell_width_for(max_deg)
    if ell_table is None:
        ell_table = W is not None and N > 0
    ell = ell_logw = ell_ts = None
    if ell_table and W is not None and N > 0:
        ell = np.zeros((Pn * Np, W), np.int32)
        if logw is not None:
            ell_logw = np.zeros((Pn * Np, W - 2), np.float32)
        if ts is not None:
            ell_ts = np.zeros((Pn * Np, W - 2), np.int32)
        lane = np.arange(W - 2, dtype=np.int64)[None, :]
        CH = 1 << 19                    # chunk rows: bounds host temporaries
        for p in range(Pn):
            rows = np.arange(p, N, Pn, dtype=np.int64)
            for lo in range(0, len(rows), CH):
                r = rows[lo: lo + CH]
                offs = np.minimum(indptr[r][:, None] + lane, max(E - 1, 0))
                sl = slice(p * Np + lo, p * Np + lo + len(r))
                ell[sl, : W - 2] = indices[offs]
                if ell_logw is not None:
                    ell_logw[sl] = logw[offs]
                if ell_ts is not None:
                    ell_ts[sl] = ts[offs]
            ell[p * Np: p * Np + len(rows), W - 2] = deg[rows]
            ell[p * Np: p * Np + len(rows), W - 1] = indptr[rows]
        ell = jnp.asarray(ell)
        ell_logw = None if ell_logw is None else jnp.asarray(ell_logw)
        ell_ts = None if ell_ts is None else jnp.asarray(ell_ts)

    return PartitionedGraph(
        ldeg=jnp.asarray(ldeg), lstart=jnp.asarray(lstart),
        gstart=jnp.asarray(gstart), lindices=jnp.asarray(lind), ell=ell,
        llogw=None if llogw is None else jnp.asarray(llogw),
        lts=None if lts is None else jnp.asarray(lts),
        ell_logw=ell_logw, ell_ts=ell_ts,
        num_nodes=N, num_parts=Pn, rows_per_part=Np, local_edge_cap=emax,
        max_degree=max_deg)


# ---------------------------------------------------------------------------
# Request routing (shared shape with sharded_features.halo_gather)
# ---------------------------------------------------------------------------

class _Router(NamedTuple):
    """Routing plan for one owner-routed exchange (see _route_to_owners)."""

    rank: jax.Array        # (L,) int32 position within the owner bucket
    #                        (counting only VALID requests; L for invalid)
    ok: jax.Array          # (L,) bool: wins a round-0 slot
    scatter: "object"      # (payload (L,)|(L,Q), rnd) -> (P, C[, Q])
    pickup: "object"       # (back (P, C, ...), rnd) -> (L, ...) aligned to
    #                        requests (garbage outside in_round(rnd))
    in_round: "object"     # rnd -> (L,) bool: request carried in round rnd
    max_rounds: "object"   # int bound on useful rounds, or None


_SCAN_CHUNK = 512


def _owner_ranks(ow, valid, num_parts: int):
    """Per-owner rank of every valid request (its count of earlier valid
    same-owner requests) — the counting replacement for the argsort routing
    plan (VERDICT r3 item 1).

    The scan rides the MXU: chunk the (L, P) valid-owner one-hot into
    (G, c, P), do the in-chunk inclusive prefix sum as a lower-triangular
    (c, c) matmul, carry chunk totals with one tiny G-length cumsum.  f32
    counts are exact (within-chunk <= c, bases <= L << 2^24).  Measured
    (scripts/micro_scan_variants.py, v5e, L=469k): 1.2 ms vs 5.5-6.3 ms for
    the stable argsort + inverse-scatter plan; jnp.cumsum over the full L
    axis is NOT an alternative (16 ms at L=469k — pathological lowering),
    nor is take_along_axis for the rank pick (7.9 ms; the one-hot
    multiply-reduce below streams on the VPU instead).
    """
    L = ow.shape[0]
    # f32 counts are exact only while every intermediate (<= L) < 2^24;
    # guard statically so a 16.7M+-request frontier fails loudly instead of
    # silently corrupting ranks (ADVICE r4).
    assert L < (1 << 24), (
        f"_owner_ranks: frontier of {L} requests exceeds the f32-exact "
        f"counting range (2^24); chunk the frontier or widen the scan")
    onehot = ((ow[:, None] == jnp.arange(num_parts, dtype=jnp.int32)[None, :])
              & valid[:, None])                          # (L, P)
    c = _SCAN_CHUNK
    G = -(-L // c)
    ohf = jnp.pad(onehot.astype(jnp.float32), ((0, G * c - L), (0, 0)))
    chunks = ohf.reshape(G, c, num_parts)
    tril = jnp.tril(jnp.ones((c, c), jnp.float32))
    within = jax.lax.dot_general(tril, chunks, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    within = jnp.transpose(within, (1, 0, 2))            # (G, c, P) inclusive
    totals = within[:, -1, :]
    base = jnp.cumsum(totals, axis=0) - totals           # (G, P) exclusive
    csum = (within + base[:, None, :]).reshape(G * c, num_parts)[:L]
    rank = (csum * onehot.astype(jnp.float32)).sum(-1) - 1.0
    return rank.astype(jnp.int32)                        # -1 for invalid


def _route_to_owners(owner, valid, num_parts: int, capacity: int) -> _Router:
    """Routing plan: per-request owner/rank with capacity-overflow mask.

    Invalid requests never consume capacity; ``scatter`` packs payloads
    into their (P, C) owner slots, ``pickup`` restores a response buffer to
    request order.  Rank semantics (position among valid requests in index
    order within the owner bucket) are identical to the round-3 stable
    argsort plan, so routed results are bit-identical across the rewrite.

    Two plans:
    * ``num_parts == 1 and capacity >= L`` — the packing permutation IS the
      identity (one owner, every request fits round 0): scatter is a
      reshape/pad and pickup a slice.  This removes BOTH ~3.5 ms
      permutation gathers per exchange at feature-fetch scale (any 469k-row
      gather costs ~3.5 ms on v5e regardless of row width —
      scripts/micro_route_components.py).
    * general — counting ranks via the MXU-blocked scan (no sort), one
      unique-indices slot scatter, one pack gather, one pickup gather.

    No colliding scatter ops anywhere: XLA:TPU lowers a scatter whose
    indices may collide to a SERIAL per-element loop (measured: seconds per
    step at tree sizes).  The slot-table scatter is collision-free by
    construction (out-of-round requests get distinct out-of-bounds slots,
    dropped by ``mode="drop"``).
    """
    L = owner.shape[0]

    if num_parts == 1 and capacity >= L:
        rank = jnp.arange(L, dtype=jnp.int32)

        def scatter(payload, rnd: int = 0):
            # match the general plan's owner-visible contract: invalid /
            # out-of-round slots carry zeros, not stale payloads (ADVICE
            # r4 — an owner_fn reducing over slots without the in-round
            # flag must see the same bytes under both plans)
            v = valid if rnd == 0 else jnp.zeros((L,), jnp.bool_)
            p = jnp.where(v[(...,) + (None,) * (payload.ndim - 1)],
                          payload, jnp.zeros((), payload.dtype))
            if capacity > L:
                pads = ((0, capacity - L),) + ((0, 0),) * (p.ndim - 1)
                p = jnp.pad(p, pads)
            return p[None]

        def pickup(back, rnd: int = 0):
            return back.reshape((capacity,) + back.shape[2:])[:L]

        def in_round(rnd: int):
            return valid if rnd == 0 else jnp.zeros((L,), jnp.bool_)

        return _Router(rank, valid, scatter, pickup, in_round, 1)

    ow = jnp.clip(owner, 0, num_parts - 1).astype(jnp.int32)
    rank = _owner_ranks(ow, valid, num_parts)
    rank = jnp.where(valid, rank, L)
    ok = (rank < capacity) & valid

    def in_round(rnd: int):
        return (rank >= rnd * capacity) & (rank < (rnd + 1) * capacity) \
            & valid

    def scatter(payload, rnd: int = 0):
        """Pack round-``rnd`` payloads into their (P, C[, Q]) slots; the 2-D
        form permutes ALL columns in one gather."""
        ir = in_round(rnd)
        slot = jnp.where(ir, ow * capacity + rank - rnd * capacity,
                         num_parts * capacity
                         + jnp.arange(L, dtype=jnp.int32))
        src = jnp.full((num_parts * capacity,), L, jnp.int32).at[slot].set(
            jnp.arange(L, dtype=jnp.int32), mode="drop",
            unique_indices=True)
        got = src < L
        ps = payload[jnp.clip(src, 0, L - 1)]
        if payload.ndim == 2:
            got = got[:, None]
        req = jnp.where(got, ps, jnp.zeros((), payload.dtype))
        return req.reshape((num_parts, capacity) + payload.shape[1:])

    def pickup(back, rnd: int = 0):
        r = jnp.where(in_round(rnd), rank - rnd * capacity, 0)
        return back[ow, r]

    return _Router(rank, ok, scatter, pickup, in_round, None)


def resolve_num_rounds(num_rounds, num_parts: int) -> int:
    """Auto ``num_rounds`` default for distributed entry points.

    ``None`` resolves to 1 at P==1 (the identity routing plan caps the
    exchange at one round, so rounds 1 and 2 trace to byte-identical HLO)
    and 2 at P>1, so an overflowing frontier is retried rather than
    silently dropped under the default configuration.  Draws are keyed by
    request uid, so outputs are invariant to which round carried a request.
    """
    if num_rounds is None:
        return 1 if int(num_parts) == 1 else 2
    return int(num_rounds)


def exchange_rounds(payload, owner, valid, owner_fn, *, axis: str,
                    num_parts: int, capacity: int, num_rounds: int = 1,
                    ret_cols: int = 1):
    """Generic owner-routed request/response exchange with overflow retries.

    ``payload (L, Q) int32``: per-request columns shipped to the owner.
    ``owner_fn(recv (P, C, Q)) -> (P, C, ret_cols) int32`` runs owner-side.
    Requests whose per-owner rank exceeds ``capacity`` are retried in later
    rounds (each round is one request+response ``all_to_all`` pair) — round
    ``r`` carries ranks ``[r*C, (r+1)*C)``.  Because every consumer keys its
    draws by the request's *uid* (not its slot), results are independent of
    which round carried the request, so multi-round routing preserves the
    device-count-invariance of the sampled trees.

    Returns ``(result (L, ret_cols) int32, got (L,) bool, overflow scalar)``
    where ``overflow`` counts valid requests no round could carry.
    """
    L, Q = payload.shape
    router = _route_to_owners(owner, valid, num_parts, capacity)
    rounds = (num_rounds if router.max_rounds is None
              else min(num_rounds, router.max_rounds))
    out = jnp.zeros((L, ret_cols), jnp.int32)
    got = jnp.zeros((L,), jnp.bool_)
    for rnd in range(rounds):
        in_round = router.in_round(rnd)
        req = router.scatter(payload, rnd)                    # (P, C, Q)
        recv = jax.lax.all_to_all(req, axis, 0, 0)
        res = owner_fn(recv)                                  # (P, C, R)
        back = jax.lax.all_to_all(res, axis, 0, 0)
        mine = router.pickup(back, rnd)
        out = jnp.where(in_round[:, None], mine, out)
        got = jnp.logical_or(got, in_round)
    overflow = (valid & ~got).sum()
    return out, got, overflow


def _uid_keys(key_hop, uids):
    """Per-request counter-based keys: fold the global tree-slot uid."""
    return jax.vmap(lambda u: jax.random.fold_in(key_hop, u))(uids)


def _uid_uniform_lane_topk(keys, deg, num_lanes: int, k: int):
    """uniform_lane_topk with one independent key per row (same law)."""
    r = jax.vmap(lambda kk: jax.random.uniform(kk, (num_lanes,)))(keys)
    lane = jnp.arange(num_lanes, dtype=jnp.int32)
    vals = jnp.where(lane < deg[..., None], r, -jnp.inf)
    kk_ = min(k, num_lanes)
    top_vals, pos = jax.lax.top_k(vals, kk_)
    valid = jnp.isfinite(top_vals)
    if kk_ < k:
        pos = jnp.pad(pos, ((0, 0), (0, k - kk_)))
        valid = jnp.pad(valid, ((0, 0), (0, k - kk_)))
    return jnp.where(valid, pos, 0), valid


def _uid_floyd(keys, deg, k: int):
    """floyd_sample with per-row keys (rows beyond ELL width)."""
    from ..sampling.primitives import floyd_sample
    return jax.vmap(lambda kk, d: floyd_sample(kk, d[None], k))(
        keys, deg)  # -> ((B,1,k), (B,1,k))


def _uid_replacement(keys, deg, k: int):
    hi = jnp.maximum(deg, 1)
    pos = jax.vmap(
        lambda kk, h: jax.random.randint(kk, (k,), 0, h, dtype=jnp.int32)
    )(keys, hi)
    valid = jnp.broadcast_to((deg > 0)[:, None], pos.shape)
    return jnp.where(valid, pos, 0), valid


NEG_INF = float("-inf")  # python literal: package import must not
#   create device arrays (jax.distributed.initialize needs an
#   uninitialised backend; see parallel/multihost.py)


def _uid_gumbel_topk(keys, logits, k: int):
    """Gumbel-top-k over explicit (B, L) logits with one key per row:
    weighted sampling without replacement (Efraimidis–Spirakis, the
    distributed twin of primitives.window_topk_sample)."""
    L = logits.shape[-1]
    r = jax.vmap(lambda kk: jax.random.uniform(kk, (L,), jnp.float32,
                                               minval=1e-12))(keys)
    total = jnp.where(jnp.isfinite(logits),
                      logits - jnp.log(-jnp.log(r)), NEG_INF)
    kk_ = min(k, L)
    vals, pos = jax.lax.top_k(total, kk_)
    valid = jnp.isfinite(vals)
    if kk_ < k:
        pos = jnp.pad(pos, ((0, 0), (0, k - kk_)))
        valid = jnp.pad(valid, ((0, 0), (0, k - kk_)))
    return jnp.where(valid, pos, 0).astype(jnp.int32), valid


def _uid_gumbel_choice(keys, logits, k: int):
    """k INDEPENDENT weighted draws per row (with replacement): per-draw
    Gumbel-argmax, one key per row."""
    L = logits.shape[-1]
    r = jax.vmap(lambda kk: jax.random.uniform(kk, (k, L), jnp.float32,
                                               minval=1e-12))(keys)
    total = jnp.where(jnp.isfinite(logits)[:, None, :],
                      logits[:, None, :] - jnp.log(-jnp.log(r)), NEG_INF)
    pos = jnp.argmax(total, axis=-1).astype(jnp.int32)
    valid = jnp.isfinite(jnp.max(total, axis=-1))
    return jnp.where(valid, pos, 0), valid


def _uid_window_sample(keys, deg, lstart_rows, llogw, lts, state, k: int,
                       *, max_degree: int, window: int, weighted: bool,
                       filter_cfg, with_replacement: bool):
    """Chunked weighted/filtered sampling for rows beyond the ELL width:
    scan the neighbor window in chunks with a running top-k (or per-draw
    max) carry — primitives.window_{topk,choice}_sample with per-uid keys.
    Returns (pos (B,k), valid (B,k))."""
    B = deg.shape[0]
    n_chunks = max(1, -(-max(max_degree, 1) // window))
    Ecap = llogw.shape[0] if llogw is not None else (
        lts.shape[0] if lts is not None else 1)

    def chunk_logits(c):
        pos = c * window + jnp.arange(window, dtype=jnp.int32)
        pos = jnp.broadcast_to(pos, (B, window))
        ok = pos < deg[:, None]
        lptr = jnp.clip(lstart_rows[:, None] + pos, 0, Ecap - 1)
        logits = jnp.zeros((B, window), jnp.float32)
        if weighted:
            logits = llogw[lptr]
        if filter_cfg is not None:
            ok = jnp.logical_and(
                ok, _filter_mask_from_ts(filter_cfg, lts[lptr], state))
        return pos, jnp.where(ok, logits, NEG_INF)

    def noise(c, shape_tail):
        return jax.vmap(
            lambda kk: jax.random.uniform(jax.random.fold_in(kk, c),
                                          shape_tail, jnp.float32,
                                          minval=1e-12))(keys)

    if not with_replacement:
        def body(c, carry):
            top_vals, top_pos = carry
            pos, logits = chunk_logits(c)
            g = logits - jnp.log(-jnp.log(noise(c, (window,))))
            g = jnp.where(jnp.isfinite(logits), g, NEG_INF)
            all_vals = jnp.concatenate([top_vals, g], axis=1)
            all_pos = jnp.concatenate([top_pos, pos], axis=1)
            new_vals, idx = jax.lax.top_k(all_vals, k)
            return new_vals, jnp.take_along_axis(all_pos, idx, axis=1)

        init = (jnp.full((B, k), NEG_INF) + deg[:, None] * 0.0,
                jnp.zeros((B, k), jnp.int32) + deg[:, None] * 0)
        top_vals, top_pos = jax.lax.fori_loop(0, n_chunks, body, init)
        valid = jnp.isfinite(top_vals)
        return jnp.where(valid, top_pos, 0), valid

    def body(c, carry):
        best_vals, best_pos = carry
        pos, logits = chunk_logits(c)
        g = logits[:, None, :] - jnp.log(-jnp.log(noise(c, (k, window))))
        g = jnp.where(jnp.isfinite(logits)[:, None, :], g, NEG_INF)
        chunk_best = jnp.max(g, axis=-1)
        arg = jnp.argmax(g, axis=-1).astype(jnp.int32)
        chunk_pos = c * window + arg
        better = chunk_best > best_vals
        return (jnp.where(better, chunk_best, best_vals),
                jnp.where(better, chunk_pos, best_pos))

    init = (jnp.full((B, k), NEG_INF) + deg[:, None] * 0.0,
            jnp.zeros((B, k), jnp.int32) + deg[:, None] * 0)
    best_vals, best_pos = jax.lax.fori_loop(0, n_chunks, body, init)
    valid = jnp.isfinite(best_vals)
    return jnp.where(valid, best_pos, 0), valid


def _owner_sample(g: PartitionedGraph, key_hop, recv, k: int,
                  with_replacement: bool, weighted: bool, filter_cfg,
                  window: int):
    """Sample k in-edges for each received request (OWNER side, in shard_map).

    ``recv (P, C, 3)``: [local_row, slot_uid, filter_state] per request.
    Returns ``(neighbor, eptr, valid, new_state)`` each (P, C, k) int32, in
    the requester's global id / global edge-ptr space.
    """
    ldeg, lstart, gstart, lindices, ell = (
        g.ldeg, g.lstart, g.gstart, g.lindices, g.ell)
    Pn, C, _ = recv.shape
    rows = jnp.clip(recv[..., 0].reshape(-1), 0, ldeg.shape[0] - 1)
    uids = recv[..., 1].reshape(-1).astype(jnp.uint32)
    state = recv[..., 2].reshape(-1)
    keys = _uid_keys(key_hop, uids)
    plain = not weighted and filter_cfg is None

    ts_sel = None  # (B, k) sampled-edge timestamps (for DYNAMIC state)
    if ell is not None:
        row = ell[rows]
        lanes, deg, starts = row[:, :-2], row[:, -2], row[:, -1]
        if plain:
            if with_replacement:
                pos, pvalid = _uid_replacement(keys, deg, k)
            else:
                pos, pvalid = _uid_uniform_lane_topk(keys, deg,
                                                     lanes.shape[-1], k)
        else:
            L = lanes.shape[-1]
            ok = jnp.arange(L, dtype=jnp.int32)[None, :] < deg[:, None]
            logits = (g.ell_logw[rows] if weighted
                      else jnp.zeros((rows.shape[0], L), jnp.float32))
            tsl = None
            if filter_cfg is not None:
                tsl = g.ell_ts[rows]
                ok = jnp.logical_and(
                    ok, _filter_mask_from_ts(filter_cfg, tsl, state))
            logits = jnp.where(ok, logits, NEG_INF)
            engine = (_uid_gumbel_choice if with_replacement
                      else _uid_gumbel_topk)
            pos, pvalid = engine(keys, logits, k)
            if tsl is not None:
                ts_sel = _select_lanes(tsl, jnp.clip(pos, 0, L - 1))
        neighbor = _select_lanes(lanes, jnp.clip(pos, 0, lanes.shape[-1] - 1))
        eptr = starts[:, None] + pos
    else:
        deg = ldeg[rows]
        lstart_rows = lstart[rows]
        if plain:
            if with_replacement:
                pos, pvalid = _uid_replacement(keys, deg, k)
            else:
                pos, pvalid = _uid_floyd(keys, deg, k)
                pos, pvalid = pos.reshape(-1, k), pvalid.reshape(-1, k)
        else:
            pos, pvalid = _uid_window_sample(
                keys, deg, lstart_rows, g.llogw, g.lts, state, k,
                max_degree=g.max_degree, window=window, weighted=weighted,
                filter_cfg=filter_cfg, with_replacement=with_replacement)
        lptr = jnp.clip(lstart_rows[:, None] + pos, 0,
                        lindices.shape[0] - 1)
        neighbor = lindices[lptr]
        eptr = gstart[rows][:, None] + pos
        if filter_cfg is not None:
            ts_sel = g.lts[lptr]

    # TemporalFilter::mutate (neighbor_sampling.rs:69-76): DYNAMIC mode
    # carries the sampled edge's timestamp; STATIC/RELATIVE keep the state.
    if filter_cfg is not None and filter_cfg.mode == TEMPORAL_SAMPLE_DYNAMIC:
        new_state = ts_sel
    else:
        new_state = jnp.broadcast_to(state[:, None], (state.shape[0], k))

    shape = (Pn, C, k)
    return (neighbor.reshape(shape).astype(jnp.int32),
            eptr.reshape(shape).astype(jnp.int32),
            pvalid.reshape(shape),
            new_state.reshape(shape).astype(jnp.int32))


def _exchange_hop(key_hop, graph_shard, frontier, fvalid, fuid, fstate,
                  k: int, *, axis: str, num_parts: int, capacity: int,
                  with_replacement: bool, weighted: bool, filter_cfg,
                  window: int, num_rounds: int = 1):
    """One distributed hop: route -> owner-sample -> route back.

    All inputs/outputs are per-device (INSIDE shard_map).  Returns
    ``(neighbor (L,k), eptr (L,k), valid (L,k), new_state (L,k),
    overflow scalar)``.  ``num_rounds > 1`` retries capacity-overflowed
    requests in further all_to_all rounds (draws stay bit-identical — the
    uid keying is round-independent), so skewed frontiers lose samples only
    past ``num_rounds * capacity`` per owner, and that loss is counted.
    """
    g = graph_shard
    gid = jnp.clip(frontier, 0, max(g.num_nodes - 1, 0))
    owner = (gid % num_parts).astype(jnp.int32)
    local = (gid // num_parts).astype(jnp.int32)

    def owner_fn(recv):
        with jax.named_scope("dist_sample.owner_sample"):
            neighbor, eptr, pvalid, new_state = _owner_sample(
                g, key_hop, recv, k, with_replacement, weighted, filter_cfg,
                window)
        return jnp.concatenate([neighbor, eptr, pvalid.astype(jnp.int32),
                                new_state], axis=-1)          # (P, C, 4k)

    payload = jnp.stack([local, fuid.astype(jnp.int32),
                         fstate.astype(jnp.int32)], axis=-1)  # (L, 3)
    with jax.named_scope("dist_sample.exchange"):
        mine, got, overflow = exchange_rounds(
            payload, owner, fvalid, owner_fn, axis=axis, num_parts=num_parts,
            capacity=capacity, num_rounds=num_rounds, ret_cols=4 * k)
    neighbor = mine[:, :k]
    eptr = mine[:, k: 2 * k]
    valid = (mine[:, 2 * k: 3 * k] != 0) & got[:, None]
    new_state = mine[:, 3 * k:]
    return neighbor, eptr, valid, new_state, overflow


def _dist_sample_device(key, graph_shard, seeds_local, *, dev,
                        fanouts: Tuple[int, ...], axis: str, num_parts: int,
                        total_seeds: int, capacity_factor: float,
                        with_replacement: bool, weighted: bool = False,
                        filter_static=None, seed_state=None,
                        window: int = 256, num_rounds: int = 1,
                        seed_gidx=None):
    """Multi-hop distributed sampling for one device's seed shard.

    Mirrors ``_sample_neighbors_impl``'s slot arithmetic; draws are keyed by
    the GLOBAL tree slot uid so the result is device-count independent.
    Returns (NeighborSample, overflow scalar).

    ``seed_gidx`` (optional, (B0,) int32): each local seed's index within
    the GLOBAL seed batch.  Defaults to the contiguous split
    ``dev*B0 + arange`` (the single-batch trainers); the multibatch
    trainer passes the interleaved layout's true indices so its draws
    stay device-count invariant too.  Child global indices follow the
    tree recurrence ``g_child = g_parent*k + j``, which reproduces the
    contiguous case bit-exactly.
    """
    B0 = seeds_local.shape[0]
    node_base, edge_base = _layer_layout(B0, fanouts)
    gnode_base, _ = _layer_layout(total_seeds, fanouts)

    filter_cfg = None
    if filter_static is not None:
        w, fwd, mode = filter_static
        filter_cfg = TemporalEdgeFilter(window=w, forward=fwd, mode=mode)

    nodes = [seeds_local.astype(jnp.int32)]
    valids = [jnp.ones((B0,), jnp.bool_)]
    states = [jnp.zeros((B0,), jnp.int32) if seed_state is None
              else seed_state.astype(jnp.int32)]
    rows, cols, eptrs, evalids = [], [], [], []
    overflow = jnp.zeros((), jnp.int32)

    L = B0          # per-device frontier size at the current hop
    gidx = (dev * B0 + jnp.arange(B0, dtype=jnp.int32)
            if seed_gidx is None else seed_gidx.astype(jnp.int32))
    for ell, k in enumerate(fanouts):
        frontier, fvalid, fstate = nodes[ell], valids[ell], states[ell]
        # global slot uid of each frontier occurrence (device-count
        # independent: gidx is the node's index within the global layer)
        fuid = gnode_base[ell] + gidx
        # per-(requester, owner) request capacity; expected load is L / P
        capacity = max(1, min(int(np.ceil(capacity_factor * L / num_parts)),
                              L))
        hop_key = rng.fold(key, ell)
        neighbor, eptr, valid, new_state, ovf = _exchange_hop(
            hop_key, graph_shard, frontier, fvalid, fuid, fstate, k,
            axis=axis, num_parts=num_parts, capacity=capacity,
            with_replacement=with_replacement, weighted=weighted,
            filter_cfg=filter_cfg, window=window, num_rounds=num_rounds)
        overflow = overflow + ovf

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
        gidx = (gidx[:, None] * k
                + jnp.arange(k, dtype=jnp.int32)[None, :]).reshape(-1)
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


def dist_sample_neighbors(key, graph: PartitionedGraph, seeds, fanouts,
                          mesh: Mesh, *, axis: str = "data",
                          with_replacement: bool = False,
                          weighted: bool = False,
                          filter: Optional[tuple] = None,
                          capacity_factor: float = 1.3,
                          window: int = 256,
                          num_rounds: Optional[int] = None):
    """Distributed multi-hop neighbor sampling (public / test entry point).

    ``seeds (B,)`` is the GLOBAL seed batch (B divisible by mesh size); the
    result's arrays carry a leading device axis: ``nodes (P, L)`` etc., where
    device d's block is the sample tree of seeds ``[d*B/P, (d+1)*B/P)``.
    Concatenating blocks per layer reproduces the P=1 layout bit-exactly.

    ``weighted=True`` samples proportional to the edge weights given to
    :func:`build_partitioned_graph` (Gumbel-top-k, the same law as the
    single-device WeightedEdgeSampler path).  ``filter`` is
    ``((lo, hi), forward, mode)`` + optional per-seed initial state as
    ``(filter_static, seed_state (B,))`` — the 3-mode TemporalEdgeFilter of
    the reference, evaluated by the OWNER against its local timestamps with
    the per-path state carried inside the request payload.
    """
    Pn = int(mesh.shape[axis])
    assert graph.num_parts == Pn, (
        f"graph was partitioned for {graph.num_parts} devices but the mesh "
        f"axis {axis!r} has {Pn} — rebuild with build_partitioned_graph(..., "
        f"num_parts={Pn})")
    fanouts = tuple(int(k) for k in fanouts)
    seeds = jnp.asarray(seeds)
    B = seeds.shape[0]
    assert B % Pn == 0, "global seed batch must divide the mesh axis"
    if weighted:
        assert graph.llogw is not None, \
            "weighted sampling needs edge_weights at build_partitioned_graph"
    filter_static = None
    seed_state = None
    if filter is not None:
        filter_static, seed_state = filter
        filter_static = (tuple(int(v) for v in filter_static[0]),
                         bool(filter_static[1]), int(filter_static[2]))
        assert graph.lts is not None, \
            "temporal filter needs edge_timestamps at build_partitioned_graph"
        seed_state = (jnp.zeros((B,), jnp.int32) if seed_state is None
                      else jnp.asarray(seed_state, dtype=jnp.int32))
    if seed_state is None:
        seed_state = jnp.zeros((B,), jnp.int32)

    run = _dist_sampler_fn(mesh, axis, Pn, B, fanouts,
                           bool(with_replacement), bool(weighted),
                           filter_static, float(capacity_factor),
                           int(window), resolve_num_rounds(num_rounds, Pn))
    from .multihost import put_partitioned
    with mesh:
        gput = put_partitioned(graph, mesh, P(axis))
        sput = put_partitioned(seeds, mesh, P(axis))
        st = put_partitioned(seed_state, mesh, P(axis))
        return run(key, gput, sput, st)


@functools.lru_cache(maxsize=64)
def _dist_sampler_fn(mesh, axis, Pn, B, fanouts, with_replacement, weighted,
                     filter_static, capacity_factor, window, num_rounds=1):
    """Jitted + cached sampler program (one compile per static config).

    Without the jit wrapper the shard_map body executes op-by-op, which over
    a remote-device tunnel costs a round trip per primitive."""

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)))
    def run(key, gshard, seeds_local, state_local):
        dev = jax.lax.axis_index(axis)
        sample, ovf = _dist_sample_device(
            key, gshard, seeds_local, dev=dev, fanouts=fanouts, axis=axis,
            num_parts=Pn, total_seeds=B, capacity_factor=capacity_factor,
            with_replacement=with_replacement, weighted=weighted,
            filter_static=filter_static, seed_state=state_local,
            window=window, num_rounds=num_rounds)
        add_dev = lambda a: a[None]
        return jax.tree_util.tree_map(add_dev, sample), ovf[None]

    return run


# ---------------------------------------------------------------------------
# Fully partitioned training: topology + features both sharded
# ---------------------------------------------------------------------------

def _hier_feature_gather(x_shard, ids, *, ax_slice: str, ax_chip: str,
                         num_slices: int, chips_per_slice: int,
                         capacity: int, valid=None, num_rounds: int = 1):
    """Hierarchical (multislice) feature fetch: slice-axis all_gather +
    intra-slice routed exchange (VERDICT r4 item 1).

    The flat per-request halo ships ``(S-1)/S * cf * L_tree`` feature rows
    over DCN per device per step (~122 MB at products scale — the 31-46%
    multislice efficiency collapse).  Here DCN instead carries ONE static
    ``all_gather`` of the device's own feature shard over the slice axis —
    ``(S-1) * N/P`` rows (~3.8 MB f32 at products/P=512, a ~30x byte
    reduction) — after which every request is served intra-slice: the
    gathered ``(S, N/P, F)`` table holds every row whose owner has this
    device's chip index (owner chip of id = id % C since C | P), so the
    per-request exchange routes over the ICI ``ax_chip`` axis only.  As a
    static collective with no data dependence on sampling, XLA can also
    schedule the all_gather concurrently with the sampling hops (the
    per-request dynamic-gather path is measured NOT to overlap,
    BASELINE.md round-1 negative).

    ``x_shard (Np, F)``: this device's 1/P interleaved shard (owner of row
    ``i`` is ``i % P``, P = S*C, device linear index s*C + c).  Returns
    ``((L, F) rows, overflow)`` — bit-identical to the flat
    :func:`~.sharded_features.halo_gather` of the same ids (pure gathers
    of the same rows; pinned by tests/test_hier_partitioned.py).
    """
    from .sharded_features import routed_row_fetch
    S, C = num_slices, chips_per_slice
    P_total = S * C
    Np = x_shard.shape[0]
    L = ids.shape[0]
    if valid is None:
        valid = jnp.ones((L,), bool)
    with jax.named_scope("hier.slice_all_gather"):
        x_aug = jax.lax.all_gather(x_shard, ax_slice, axis=0, tiled=False)
        x_aug = x_aug.reshape(S * Np, x_shard.shape[-1])
    owner_chip = (ids % C).astype(jnp.int32)
    owner_slice = ((ids % P_total) // C).astype(jnp.int32)
    local = owner_slice * Np + (ids // P_total).astype(jnp.int32)
    return routed_row_fetch(x_aug, owner_chip, local, valid, axis=ax_chip,
                            num_parts=C, capacity=capacity,
                            num_rounds=num_rounds)


def make_partitioned_trainer(
    model,
    fanouts: Sequence[int],
    mesh: Mesh,
    *,
    axis: str = "data",
    learning_rate: float = 1e-2,
    with_replacement: bool = False,
    weighted: bool = False,
    filter: Optional[tuple] = None,
    window: int = 256,
    capacity_factor: float = 1.3,
    num_rounds: Optional[int] = None,
    exchange_dtype=None,
    hier: Optional[Tuple[str, str]] = None,
):
    """Sampled-training closures where NOTHING graph-sized is replicated:
    adjacency shards via :class:`PartitionedGraph`, features interleave-shard
    (``sharded_features.build_interleaved_features``), seeds/labels shard
    over the same axis.  Per step: distributed sampling (two all_to_alls per
    hop) -> distributed feature fetch (two all_to_alls) -> local tree
    forward/backward -> gradient pmean.  Returns (init_fn, train_step,
    eval_step); train_step also returns summed (sampling, feature) overflow
    diagnostics.

    ``weighted=True`` trains on edge-weight-proportional samples (the graph
    must be built with ``edge_weights``); ``filter=((lo, hi), forward,
    mode)`` applies the reference's 3-mode TemporalEdgeFilter during
    sampling (graph built with ``edge_timestamps``) — the same sampler
    configs the reference threads into its sampling entry point
    (python.rs:187-201), here reaching an actual train step.  With a
    filter, ``train_step``/``eval_step`` accept an optional trailing
    ``seed_ts`` array (sharded like seeds) carrying each seed's root
    timestamp for the RELATIVE/DYNAMIC state chain; omitted it defaults
    to zeros.

    ``exchange_dtype`` (e.g. ``jnp.bfloat16``): cast the feature shard to
    this dtype before the routed halo exchange — halves the float traffic
    the routing permutes/all_to_alls when features are f32 and training
    computes in bf16 anyway.  Default None keeps the table dtype.

    ``hier=(slice_axis, chip_axis)`` (multislice): run over a 2-axis mesh
    where ``slice_axis`` spans DCN-connected slices and ``chip_axis`` the
    ICI-connected chips of one slice.  Topology is SLICE-REPLICATED (build
    the graph with ``num_parts = mesh.shape[chip_axis]``; its arrays shard
    ``P(chip_axis)``, so every sampling all_to_all rides ICI only), the
    feature table stays fully partitioned over all S*C devices
    (``P((slice_axis, chip_axis))``) and is fetched via
    :func:`_hier_feature_gather` — DCN carries one static shard
    all_gather per step instead of per-request rows.  Seeds/labels shard
    ``P((slice_axis, chip_axis))``.  Sampled trees and fetched rows are
    bit-identical to the flat plan (uid-keyed draws; same-row gathers),
    pinned by tests/test_hier_partitioned.py.
    """
    tree_forward = type(model).tree_forward
    fanouts = tuple(int(k) for k in fanouts)
    tx = optax.adam(learning_rate)
    if hier is not None:
        ax_slice, ax_chip = hier
        n_slices = int(mesh.shape[ax_slice])
        n_chips = int(mesh.shape[ax_chip])
        num_parts = n_slices * n_chips          # feature-table partitions
        samp_axis, samp_parts = ax_chip, n_chips
        reduce_axes: Any = (ax_slice, ax_chip)
        shard = P((ax_slice, ax_chip))
        graph_spec = P(ax_chip)
    else:
        num_parts = int(mesh.shape[axis])
        samp_axis, samp_parts = axis, num_parts
        reduce_axes = axis
        shard = P(axis)
        graph_spec = shard
    num_rounds = resolve_num_rounds(num_rounds, num_parts)
    filter_static = None
    if filter is not None:
        filter_static = (tuple(int(v) for v in filter[0]), bool(filter[1]),
                         int(filter[2]))

    def _sample_and_gather(key, gshard, x_shard, seeds_local, dev,
                           seed_state=None):
        assert gshard.num_parts == samp_parts, (
            f"graph partitioned for {gshard.num_parts} devices but the "
            f"sampling axis has {samp_parts}")
        if weighted:
            assert gshard.llogw is not None, (
                "weighted=True needs edge_weights at "
                "build_partitioned_graph")
        if filter_static is not None:
            assert gshard.lts is not None, (
                "filter= needs edge_timestamps at build_partitioned_graph")
        total_seeds = seeds_local.shape[0] * num_parts
        sample, s_ovf = _dist_sample_device(
            key, gshard, seeds_local, dev=dev, fanouts=fanouts,
            axis=samp_axis, num_parts=samp_parts, total_seeds=total_seeds,
            capacity_factor=capacity_factor,
            with_replacement=with_replacement, weighted=weighted,
            filter_static=filter_static, seed_state=seed_state,
            window=window, num_rounds=num_rounds)
        n_rows = x_shard.shape[0] * num_parts
        ids = jnp.clip(sample.nodes, 0, n_rows - 1)
        capacity = int(np.ceil(capacity_factor * ids.shape[0] / samp_parts))
        capacity = min(capacity, ids.shape[0])
        if exchange_dtype is not None:
            x_shard = x_shard.astype(exchange_dtype)
        if hier is not None:
            x, f_ovf = _hier_feature_gather(
                x_shard, ids, ax_slice=ax_slice, ax_chip=ax_chip,
                num_slices=n_slices, chips_per_slice=n_chips,
                capacity=capacity, valid=sample.node_valid,
                num_rounds=num_rounds)
        else:
            x, f_ovf = halo_gather(x_shard, ids, axis=axis,
                                   num_parts=num_parts, capacity=capacity,
                                   valid=sample.node_valid,
                                   num_rounds=num_rounds)
        return sample, x, (s_ovf, f_ovf)

    def _loss(params, key, gshard, x_shard, seeds_local, labels_local,
              ts_local, dev, deterministic):
        sample, x, ovf = _sample_and_gather(key, gshard, x_shard,
                                            seeds_local, dev,
                                            seed_state=ts_local)
        logits = model.apply(params, sample, x, deterministic=deterministic,
                             rngs={"dropout": rng.fold(key,
                                                       rng.DROPOUT_STREAM)},
                             method=tree_forward)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels_local).mean()
        return loss, (logits, ovf)

    repl = P()

    def _dev():
        if hier is not None:
            return (jax.lax.axis_index(ax_slice) * n_chips
                    + jax.lax.axis_index(ax_chip))
        return jax.lax.axis_index(axis)

    def _ts_or_zeros(seed_ts, seeds):
        if seed_ts is None:
            return jnp.zeros(jnp.shape(seeds), jnp.int32)
        return jnp.asarray(seed_ts, jnp.int32)

    def init_fn(key, graph, x_sharded, seeds, seed_ts=None):
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(repl, graph_spec, shard, shard, shard),
                           out_specs=repl)
        def _init(key, gshard, x_shard, seeds_local, ts_local):
            sample, x, _ = _sample_and_gather(key, gshard, x_shard,
                                              seeds_local, _dev(),
                                              seed_state=ts_local)
            params = model.init(key, sample, x, method=tree_forward)
            return jax.lax.pmean(params, reduce_axes)

        params = _init(key, graph, x_sharded, seeds,
                       _ts_or_zeros(seed_ts, seeds))
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, static_argnames=())
    def _train_step_impl(state, key, graph, x_sharded, seeds, labels,
                         seed_ts):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(repl, repl, repl, repl, graph_spec, shard, shard,
                      shard, shard),
            out_specs=(repl, repl, repl, repl, repl))
        def _step(params, opt_state, step, key, gshard, x_shard,
                  seeds_local, labels_local, ts_local):
            k = rng.fold(key, step)
            (loss, (logits, ovf)), grads = jax.value_and_grad(
                _loss, has_aux=True)(params, k, gshard, x_shard, seeds_local,
                                     labels_local, ts_local, _dev(), False)
            grads = jax.lax.pmean(grads, reduce_axes)
            loss = jax.lax.pmean(loss, reduce_axes)
            acc = jax.lax.pmean(
                (logits.argmax(-1) == labels_local).mean(), reduce_axes)
            overflow = jax.lax.psum(ovf[0] + ovf[1], reduce_axes)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, loss, acc, overflow

        params, opt_state, loss, acc, overflow = _step(
            state.params, state.opt_state, state.step, key, graph, x_sharded,
            seeds, labels, seed_ts)
        return (TrainState(params, opt_state, state.step + 1),
                loss, acc, overflow)

    def train_step(state, key, graph, x_sharded, seeds, labels,
                   seed_ts=None):
        return _train_step_impl(state, key, graph, x_sharded, seeds, labels,
                                _ts_or_zeros(seed_ts, seeds))

    @jax.jit
    def _eval_step_impl(state, key, graph, x_sharded, seeds, labels,
                        seed_ts):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(repl, repl, graph_spec, shard, shard, shard, shard),
            out_specs=(repl, repl))
        def _eval(params, key, gshard, x_shard, seeds_local, labels_local,
                  ts_local):
            k = rng.fold(key, jnp.asarray(1 << 20, jnp.uint32))
            loss, (logits, _) = _loss(params, k, gshard, x_shard,
                                      seeds_local, labels_local, ts_local,
                                      _dev(), True)
            acc = (logits.argmax(-1) == labels_local).mean()
            return (jax.lax.pmean(loss, reduce_axes),
                    jax.lax.pmean(acc, reduce_axes))

        return _eval(state.params, key, graph, x_sharded, seeds, labels,
                     seed_ts)

    def eval_step(state, key, graph, x_sharded, seeds, labels, seed_ts=None):
        return _eval_step_impl(state, key, graph, x_sharded, seeds, labels,
                               _ts_or_zeros(seed_ts, seeds))

    return init_fn, train_step, eval_step


def make_partitioned_multibatch_trainer(
    model,
    fanouts: Sequence[int],
    mesh: Mesh,
    *,
    axis: str = "data",
    learning_rate: float = 1e-2,
    with_replacement: bool = False,
    window: int = 256,
    capacity_factor: float = 1.3,
    num_rounds: Optional[int] = None,
    exchange_dtype=None,
    hier: Optional[Tuple[str, str]] = None,
):
    """Fully partitioned trainer that fuses M minibatches per jitted step.

    The partitioned analogue of ``train.make_multibatch_sage_trainer``:
    one step samples ALL M minibatches as a single M*B-seed distributed
    tree (every routed exchange and the halo feature fetch amortize over
    M — minibatch-scale gathers and all_to_alls are latency-bound, the
    measured reason the replicated multibatch runs 20.9 -> 10.3
    ms/minibatch at products scale), splits it into M per-batch trees
    with :func:`~..sampling.neighbor.split_sample_batches` (pure
    reshapes), and scans M sequential forward/backward/adam updates with
    per-update gradient pmean.  Draws follow the same law as M
    independent steps but slot uids (hence exact draws) differ — the
    trade documented on split_sample_batches.

    ``train_step(state, key, graph, x_sharded, seeds (M, B), labels
    (M, B)) -> (state, losses (M,), accs (M,), overflow)``; seeds/labels
    shard their B axis over the mesh.
    """
    from ..sampling.neighbor import split_sample_batches

    tree_forward = type(model).tree_forward
    fanouts = tuple(int(k) for k in fanouts)
    tx = optax.adam(learning_rate)
    if hier is not None:
        ax_slice, ax_chip = hier
        n_slices = int(mesh.shape[ax_slice])
        n_chips = int(mesh.shape[ax_chip])
        num_parts = n_slices * n_chips
        samp_axis, samp_parts = ax_chip, n_chips
        reduce_axes: Any = (ax_slice, ax_chip)
        shard = P((ax_slice, ax_chip))
        graph_spec = P(ax_chip)
    else:
        num_parts = int(mesh.shape[axis])
        samp_axis, samp_parts = axis, num_parts
        reduce_axes = axis
        shard = P(axis)
        graph_spec = shard
    num_rounds = resolve_num_rounds(num_rounds, num_parts)

    def _dev():
        if hier is not None:
            return (jax.lax.axis_index(ax_slice) * n_chips
                    + jax.lax.axis_index(ax_chip))
        return jax.lax.axis_index(axis)

    def _sample_gather_split(key, gshard, x_shard, seeds_local, dev):
        M, Bp = seeds_local.shape
        flat = seeds_local.reshape(-1)
        total_seeds = flat.shape[0] * num_parts
        # each local seed's index in the GLOBAL (M, B) batch: batch m's
        # device-d stripe sits at m*B + d*Bp — passing the true indices
        # keeps draws device-count invariant despite the interleaving
        B_global = Bp * num_parts
        gidx = (jnp.arange(M, dtype=jnp.int32)[:, None] * B_global
                + dev * Bp
                + jnp.arange(Bp, dtype=jnp.int32)[None, :]).reshape(-1)
        sample, s_ovf = _dist_sample_device(
            key, gshard, flat, dev=dev, fanouts=fanouts, axis=samp_axis,
            num_parts=samp_parts, total_seeds=total_seeds,
            capacity_factor=capacity_factor,
            with_replacement=with_replacement, seed_state=None,
            window=window, num_rounds=num_rounds, seed_gidx=gidx)
        n_rows = x_shard.shape[0] * num_parts
        ids = jnp.clip(sample.nodes, 0, n_rows - 1)
        capacity = int(np.ceil(capacity_factor * ids.shape[0] / samp_parts))
        capacity = min(capacity, ids.shape[0])
        if exchange_dtype is not None:
            x_shard = x_shard.astype(exchange_dtype)
        if hier is not None:
            x, f_ovf = _hier_feature_gather(
                x_shard, ids, ax_slice=ax_slice, ax_chip=ax_chip,
                num_slices=n_slices, chips_per_slice=n_chips,
                capacity=capacity, valid=sample.node_valid,
                num_rounds=num_rounds)
        else:
            x, f_ovf = halo_gather(x_shard, ids, axis=axis,
                                   num_parts=num_parts, capacity=capacity,
                                   valid=sample.node_valid,
                                   num_rounds=num_rounds)
        split, xs = split_sample_batches(sample, M, x)
        return split, xs, s_ovf + f_ovf

    repl = P()
    shard2 = (P(None, (ax_slice, ax_chip)) if hier is not None
              else P(None, axis))

    def init_fn(key, graph, x_sharded, seeds):
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(repl, graph_spec, shard, shard2),
                           out_specs=repl)
        def _init(key, gshard, x_shard, seeds_local):
            split, xs, _ = _sample_gather_split(key, gshard, x_shard,
                                                seeds_local, _dev())
            one = jax.tree_util.tree_map(
                lambda a: a[0] if hasattr(a, "ndim") else a, split)
            params = model.init(key, one, xs[0], method=tree_forward)
            return jax.lax.pmean(params, reduce_axes)

        params = _init(key, graph, x_sharded, seeds)
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state, key, graph, x_sharded, seeds, labels):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(repl, repl, repl, repl, graph_spec, shard, shard2,
                      shard2),
            out_specs=(repl, repl, repl, repl, repl))
        def _step(params, opt_state, step, key, gshard, x_shard,
                  seeds_local, labels_local):
            k = rng.fold(key, step)
            split, xs, ovf = _sample_gather_split(k, gshard, x_shard,
                                                  seeds_local, _dev())

            def one_update(carry, inp):
                p, opt = carry
                m, sample_m, x_m, labels_m = inp

                def loss_fn(p):
                    logits = model.apply(
                        p, sample_m, x_m, deterministic=False,
                        rngs={"dropout": rng.fold(k, m,
                                                  rng.DROPOUT_STREAM)},
                        method=tree_forward)
                    loss = optax.softmax_cross_entropy_with_integer_labels(
                        logits, labels_m).mean()
                    return loss, logits

                (loss, logits), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p)
                grads = jax.lax.pmean(grads, reduce_axes)
                loss = jax.lax.pmean(loss, reduce_axes)
                acc = jax.lax.pmean(
                    (logits.argmax(-1) == labels_m).mean(), reduce_axes)
                updates, opt = tx.update(grads, opt, p)
                p = optax.apply_updates(p, updates)
                return (p, opt), (loss, acc)

            M = seeds_local.shape[0]
            (params, opt_state), (losses, accs) = jax.lax.scan(
                one_update, (params, opt_state),
                (jnp.arange(M, dtype=jnp.uint32), split, xs, labels_local))
            overflow = jax.lax.psum(ovf, reduce_axes)
            return params, opt_state, losses, accs, overflow

        params, opt_state, losses, accs, overflow = _step(
            state.params, state.opt_state, state.step, key, graph,
            x_sharded, seeds, labels)
        return (TrainState(params, opt_state, state.step + 1),
                losses, accs, overflow)

    return init_fn, train_step
