"""Layer-wise neighbor sampling (GraphSAGE-style), homogeneous.

TPU-native re-design of ``neighbor_sampling_homogenous``
(/root/reference/src/algo/neighbor_sampling.rs:162-230).  The reference walks
the frontier node-by-node, filtering and reservoir-sampling each in-edge list
and growing Vec outputs; every accepted edge appends a NEW node (sampled
tree, no dedup — rs:210-218).

Here the whole multi-hop expansion is one fixed-shape jitted program:

* Layer capacities are static: ``cap[0] = num_seeds``,
  ``cap[l+1] = cap[l] * fanout[l]``.  Hop ``l`` writes exactly
  ``cap[l] * fanout[l]`` node/edge slots, each carrying a validity bit —
  the padded-to-fanout masks of SURVEY §7.1(2).
* Because every edge slot's appended-node position is statically known
  (``slot = layer_base + i * k + s``), the local-index COO (rows, cols) is
  produced directly — the reference's incremental ``CooGraphBuilder``
  disappears entirely.
* Per-path filter state (``SamplingFilter::mutate`` chains, rs:14-20) is a
  carried array aligned with the node slots.
* The per-node choose-k is one of the three batched engines in
  ``primitives.py`` picked statically from the sampler/filter config —
  mirroring the reference's const-generic monomorphisation
  (src/python.rs:170-185) as jit specialisation.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..data.graph import CscGraph
from ..utils.config import (
    TEMPORAL_SAMPLE_DYNAMIC,
    TEMPORAL_SAMPLE_STATIC,
    EdgeSampler,
    TemporalEdgeFilter,
    UniformEdgeSampler,
    WeightedEdgeSampler,
)
from . import primitives, rng


@struct.dataclass
class NeighborSample:
    """Padded multi-hop sample (device pytree).

    ``nodes[:num_seeds]`` are the seeds; hop ``l`` occupies the static slot
    range ``[node_base[l+1], node_base[l+2])``.  ``rows``/``cols`` are LOCAL
    slot indices (tree-local ids), ``eptr`` the global sorted-CSC edge ptr —
    the same triple the reference's COO builder emits (graph.rs:142-146).
    """

    nodes: jax.Array        # (N_total,) node ids (garbage where ~node_valid)
    node_valid: jax.Array   # (N_total,) bool
    node_state: jax.Array   # (N_total,) int64 filter state (timestamps)
    rows: jax.Array         # (E_total,) int32 local src slot
    cols: jax.Array         # (E_total,) int32 local dst slot
    eptr: jax.Array         # (E_total,) int32 global edge ptr
    edge_valid: jax.Array   # (E_total,) bool
    node_base: Tuple[int, ...] = struct.field(pytree_node=False)
    edge_base: Tuple[int, ...] = struct.field(pytree_node=False)
    fanouts: Tuple[int, ...] = struct.field(pytree_node=False)

    @property
    def num_hops(self) -> int:
        return len(self.fanouts)


def _layer_layout(num_seeds: int, fanouts: Sequence[int]):
    node_base = [0, num_seeds]
    edge_base = [0]
    for k in fanouts:
        cap = node_base[-1] - node_base[-2]
        edge_base.append(edge_base[-1] + cap * k)
        node_base.append(node_base[-1] + cap * k)
    return tuple(node_base), tuple(edge_base)


def _filter_mask_from_ts(filter_cfg, t, state):
    """TemporalFilter::filter (neighbor_sampling.rs:55-67) on raw edge-ts
    values: STATIC: window contains ts; RELATIVE/DYNAMIC: window contains
    +-(ts - state).  Window inclusive on both ends."""
    lo, hi = filter_cfg.window
    if filter_cfg.mode == TEMPORAL_SAMPLE_STATIC:
        d = t
    else:
        d = t - state[..., None]
        if not filter_cfg.forward:
            d = -d
    return jnp.logical_and(d >= lo, d <= hi)


def _filter_mask_fn(filter_cfg, timestamps, state):
    """Build mask_at(eptr)->bool closure for the current frontier."""

    def mask_at(eptr):
        return _filter_mask_from_ts(filter_cfg, timestamps[eptr], state)

    return mask_at


def _aligned_window_values(arr: jax.Array, starts: jax.Array,
                           num_pos: int, lanes: int = 64) -> jax.Array:
    """Per-node windows of a per-edge attribute array, gather-light.

    Returns ``vals (B, num_pos)`` with ``vals[i, p] == arr[starts[i] + p]``
    (lanes past the array end are arbitrary — mask with the degree).  Cost:
    the aligned 64-lane row reshape (one sequential copy of ``arr``) plus
    ``ceil((63 + num_pos)/64)`` row accesses per node and a one-hot VPU
    shift — instead of ``B * num_pos`` random scalar gathers (the measured
    issue-rate bound makes those ~20 ns EACH; see BASELINE.md).
    """
    E = arr.shape[0]
    pad = (-E) % lanes
    a2 = jnp.pad(arr, (0, pad)).reshape(-1, lanes)
    R = -(-(lanes - 1 + num_pos) // lanes)
    starts = starts.astype(jnp.int32)
    r0 = starts // lanes
    rows = jnp.clip(r0[:, None] + jnp.arange(R, dtype=jnp.int32)[None, :],
                    0, a2.shape[0] - 1)
    vals = a2[rows].reshape(starts.shape[0], R * lanes)
    pos = (starts % lanes)[:, None] + jnp.arange(num_pos, dtype=jnp.int32)
    oh = pos[..., None] == jnp.arange(R * lanes, dtype=jnp.int32)
    return jnp.sum(jnp.where(oh, vals[:, None, :], 0), axis=-1)


def _select_lanes(lanes: jax.Array, pos: jax.Array) -> jax.Array:
    """Select ``lanes[i, pos[i, s]]`` without a gather.

    ``take_along_axis`` lowers to an HBM gather of the materialised lane
    tensor (measured: it gives back the entire ELL win, 20.7 vs 18.6 ms
    step); an explicit one-hot compare + masked sum stays a fused VPU
    reduction over the already-fetched rows.
    """
    W = lanes.shape[-1]
    lane_iota = jnp.arange(W, dtype=jnp.int32)
    oh = pos[..., None] == lane_iota                    # (B, k, W) bool
    return jnp.sum(jnp.where(oh, lanes[..., None, :], 0), axis=-1)


def sample_edges_uniform(key, graph: CscGraph, frontier, frontier_valid,
                         k: int):
    """Uniform k-subset of each frontier node's edges, ELL-accelerated.

    The shared hot pattern of the HGT/budget samplers (reference
    rs budget/hgt update loops): per node, choose ``min(k, deg)`` distinct
    in-edges.  Returns ``(deg (B,), pos (B,k), pvalid (B,k), eptr (B,k),
    v (B,k))`` where ``v`` are the neighbor ids.  Uses one ELL row access
    per node when the table exists, else indptr pair + per-edge gathers.
    """
    if graph.ell is not None:
        lanes, deg_l, starts = graph.ell_rows(
            jnp.clip(frontier, 0, graph.num_ptr_nodes - 1))
        deg = jnp.where(frontier_valid, deg_l, 0)
        # Loop-free uniform k-subset: lane ranking + top_k beats Floyd's
        # k-step carried loop (k=50 here) whenever the row fits the ELL.
        pos, pvalid = primitives.uniform_lane_topk(
            key, deg, lanes.shape[-1], k)
    else:
        starts, ends = graph.neighbors_range(
            jnp.clip(frontier, 0, graph.num_ptr_nodes - 1))
        deg = jnp.where(frontier_valid, ends - starts, 0)
        pos, pvalid = primitives.floyd_sample(key, deg, k)
    eptr = jnp.clip(starts[:, None] + pos, 0, max(graph.num_edges - 1, 0))
    if graph.ell is not None:
        v = _select_lanes(lanes, jnp.clip(pos, 0, lanes.shape[-1] - 1))
        v = v.astype(graph.indices.dtype)
    else:
        v = graph.gather_neighbors(eptr)
    return deg, pos, pvalid, eptr, v


def _sample_one_hop(
    key,
    graph: CscGraph,
    frontier,
    frontier_valid,
    frontier_state,
    k: int,
    *,
    with_replacement: bool,
    log_weights,       # (E,) or None
    filter_cfg,        # TemporalEdgeFilter or None (static python value)
    timestamps,        # (E,) or None
    window: int,
):
    """Sample <=k in-edges for each frontier node. Returns
    (eptr (B,k), neighbor (B,k), valid (B,k), new_state (B,k))."""
    ell_lanes = None
    if graph.ell is not None:
        # One gather access per frontier node fetches padded neighbor ids,
        # degree AND window start (data/graph.py ELL layout) — replacing the
        # indptr pair + per-edge id gathers that dominate sampling time.
        ell_lanes, deg_l, starts = graph.ell_rows(
            jnp.clip(frontier, 0, graph.num_ptr_nodes - 1))
        degs = jnp.where(frontier_valid, deg_l, 0)
    else:
        starts, ends = graph.neighbors_range(
            jnp.clip(frontier, 0, graph.num_ptr_nodes - 1))
        degs = jnp.where(frontier_valid, ends - starts, 0)

    mask_at = None
    if filter_cfg is not None:
        mask_at = _filter_mask_fn(filter_cfg, timestamps, frontier_state)
    logw_at = None
    if log_weights is not None:
        logw_at = lambda eptr: log_weights[eptr]

    tvals = None
    if mask_at is None and logw_at is None:
        if with_replacement:
            pos, valid = primitives.replacement_positions(key, degs, k)
        elif ell_lanes is not None:
            pos, valid = primitives.uniform_lane_topk(
                key, degs, ell_lanes.shape[-1], k)
        else:
            pos, valid = primitives.floyd_sample(key, degs, k)
    elif ell_lanes is not None:
        # Windowed-values engine: weights/timestamps for the WHOLE window
        # come from ~2 aligned row accesses per node (vs per-edge gathers
        # over a padded 256-lane window — measured 40x slower); the Gumbel
        # draw then runs on (B, max_degree) registers.
        P = max(graph.max_degree, 1)
        lane_ok = jnp.arange(P, dtype=jnp.int32)[None, :] < degs[..., None]
        logits = jnp.zeros(degs.shape + (P,), jnp.float32)
        if log_weights is not None:
            logits = _aligned_window_values(
                log_weights.astype(jnp.float32), starts, P)
        if filter_cfg is not None:
            tvals = _aligned_window_values(timestamps, starts, P)
            lane_ok = jnp.logical_and(
                lane_ok,
                _filter_mask_from_ts(filter_cfg, tvals, frontier_state))
        logits = jnp.where(lane_ok, logits, primitives.NEG_INF)
        if with_replacement:
            noise = jax.random.gumbel(key, degs.shape + (k, P), jnp.float32)
            total = jnp.where(jnp.isfinite(logits)[..., None, :],
                              logits[..., None, :] + noise, primitives.NEG_INF)
            pos = jnp.argmax(total, axis=-1).astype(jnp.int32)
            valid = jnp.isfinite(jnp.max(total, axis=-1))
        else:
            noise = jax.random.gumbel(key, logits.shape, jnp.float32)
            keys_ = jnp.where(jnp.isfinite(logits), logits + noise,
                              primitives.NEG_INF)
            vals, pos = jax.lax.top_k(keys_, k)
            pos = pos.astype(jnp.int32)
            valid = jnp.isfinite(vals)
        pos = jnp.where(valid, pos, 0)
    else:
        engine = (primitives.window_choice_sample if with_replacement
                  else primitives.window_topk_sample)
        pos, valid = engine(
            key, starts, degs, k,
            max_degree=graph.max_degree, num_edges=graph.num_edges,
            logw_at=logw_at, mask_at=mask_at, window=window)

    eptr = jnp.clip(starts[..., None] + pos, 0, max(graph.num_edges - 1, 0))
    if ell_lanes is not None:
        # Every engine emits window-relative positions < max_degree <= W-2,
        # so sampled ids select locally from the already-fetched ELL lanes.
        sel = jnp.clip(pos, 0, ell_lanes.shape[-1] - 1)
        neighbor = _select_lanes(ell_lanes, sel).astype(graph.indices.dtype)
    elif graph.indices_win is not None:
        # Aligned-window fast path: one (B, R) gather of 256 B rows covers
        # every node's whole neighbor window, then the k sampled lanes are
        # selected locally — replacing B*k per-edge scalar gathers (the
        # sampler's dominant cost at scale; scripts/micro_window_select.py).
        win, off = graph.gather_neighbor_windows_rows(starts)
        neighbor = _select_lanes(win, off[..., None] + pos)
        neighbor = neighbor.astype(graph.indices.dtype)
    else:
        neighbor = graph.gather_neighbors(eptr)

    # State propagation (TemporalFilter::mutate, rs:69-76).
    if filter_cfg is not None and filter_cfg.mode == TEMPORAL_SAMPLE_DYNAMIC:
        if tvals is not None:
            new_state = _select_lanes(tvals, jnp.clip(pos, 0, tvals.shape[-1] - 1))
        else:
            new_state = timestamps[eptr]
    else:
        new_state = jnp.broadcast_to(frontier_state[..., None], eptr.shape)
    return eptr, neighbor, valid, new_state


@functools.partial(
    jax.jit,
    static_argnames=("fanouts", "with_replacement", "filter_static", "window"),
)
def _sample_neighbors_impl(
    key,
    graph: CscGraph,
    inputs,            # (n0,) node ids
    input_state,       # (n0,) int64
    log_weights,       # (E,) f32 or None
    timestamps,        # (E,) i64 or None
    fanouts: Tuple[int, ...],
    with_replacement: bool,
    filter_static,     # hashable (window, forward, mode) or None
    window: int,
) -> NeighborSample:
    num_seeds = inputs.shape[0]
    node_base, edge_base = _layer_layout(num_seeds, fanouts)

    filter_cfg = None
    if filter_static is not None:
        w, fwd, mode = filter_static
        filter_cfg = TemporalEdgeFilter(window=w, forward=fwd, mode=mode)

    nodes = [inputs.astype(jnp.int32)]
    valids = [jnp.ones((num_seeds,), jnp.bool_)]
    states = [input_state.astype(jnp.int32)]
    rows, cols, eptrs, evalids = [], [], [], []

    for ell, k in enumerate(fanouts):
        frontier, fvalid, fstate = nodes[ell], valids[ell], states[ell]
        B = frontier.shape[0]
        hop_key = rng.fold(key, ell)
        with jax.named_scope(f"sample.hop{ell}"):
            eptr, neighbor, valid, new_state = _sample_one_hop(
                hop_key, graph, frontier, fvalid, fstate, k,
            with_replacement=with_replacement,
            log_weights=log_weights,
            filter_cfg=filter_cfg,
            timestamps=timestamps,
            window=window,
        )
        # Slot arithmetic: edge (i, s) appends node at layer-local i*k+s.
        slot = node_base[ell + 1] + (
            jnp.arange(B, dtype=jnp.int32)[:, None] * k
            + jnp.arange(k, dtype=jnp.int32)[None, :]
        )
        col = node_base[ell] + jnp.arange(B, dtype=jnp.int32)[:, None]

        nodes.append(neighbor.reshape(-1))
        valids.append(valid.reshape(-1))
        states.append(new_state.reshape(-1))
        rows.append(slot.reshape(-1))
        cols.append(jnp.broadcast_to(col, (B, k)).reshape(-1))
        eptrs.append(eptr.astype(jnp.int32).reshape(-1))
        evalids.append(valid.reshape(-1))

    return NeighborSample(
        nodes=jnp.concatenate(nodes),
        node_valid=jnp.concatenate(valids),
        node_state=jnp.concatenate(states),
        rows=jnp.concatenate(rows) if rows else jnp.zeros((0,), jnp.int32),
        cols=jnp.concatenate(cols) if cols else jnp.zeros((0,), jnp.int32),
        eptr=jnp.concatenate(eptrs) if eptrs else jnp.zeros((0,), jnp.int32),
        edge_valid=jnp.concatenate(evalids) if evalids else jnp.zeros((0,), jnp.bool_),
        node_base=node_base,
        edge_base=edge_base,
        fanouts=tuple(fanouts),
    )


def sample_neighbors(
    graph: CscGraph,
    inputs,
    fanouts: Sequence[int],
    *,
    key: Optional[jax.Array] = None,
    sampler: Optional[EdgeSampler] = None,
    filter: Optional[Tuple[TemporalEdgeFilter, jax.Array]] = None,
    window: int = 256,
) -> NeighborSample:
    """Device-native multi-hop neighbor sampling.

    Args mirror the reference entry point (src/python.rs:187-201): ``graph``
    is the CSC adjacency, ``inputs`` the seed nodes, ``fanouts`` the per-hop
    neighbor counts, ``sampler`` a Uniform/Weighted EdgeSampler and
    ``filter`` an optional ``(TemporalEdgeFilter, initial_states)`` pair.
    """
    if key is None:
        key = rng.next_key()
    inputs = jnp.asarray(inputs)

    with_replacement = False
    log_weights = None
    if isinstance(sampler, UniformEdgeSampler):
        with_replacement = sampler.with_replacement
    elif isinstance(sampler, WeightedEdgeSampler):
        w = jnp.asarray(sampler.weights, dtype=jnp.float32)
        log_weights = jnp.log(w)

    filter_static = None
    timestamps = None
    if filter is not None:
        # reference parity: filter is (TemporalEdgeFilter, inputs_state)
        # (python.rs:218-248); a bare TemporalEdgeFilter is accepted as a
        # convenience with zero initial state.
        if isinstance(filter, TemporalEdgeFilter):
            fcfg, input_state = filter, jnp.zeros(inputs.shape, jnp.int32)
        else:
            fcfg, input_state = filter
        filter_static = (tuple(int(x) for x in fcfg.window), bool(fcfg.forward), int(fcfg.mode))
        timestamps = jnp.asarray(fcfg.timestamps, dtype=jnp.int32)
        input_state = jnp.asarray(input_state, dtype=jnp.int32)
    else:
        input_state = jnp.zeros(inputs.shape, jnp.int32)

    return _sample_neighbors_impl(
        key, graph, inputs, input_state, log_weights, timestamps,
        tuple(int(k) for k in fanouts), with_replacement, filter_static, window)


# ---------------------------------------------------------------------------
# Host compaction: reference-parity output format
# ---------------------------------------------------------------------------

def split_sample_batches(sample: NeighborSample, M: int,
                         x: Optional[jax.Array] = None):
    """Split a ``B0 = M*B``-seed sampled tree into M independent per-batch
    trees — pure reshapes + static rebasing, ZERO gathers.

    The tree layout makes this free: layer ``l`` is contiguous and ordered
    by seed, and hop ``l``'s edges are ordered by parent slot, so batch
    ``m``'s share of every layer/edge block is the contiguous ``m``-th
    stripe; ``rows``/``cols`` rebase by a per-layer constant shift.

    The point (measured, BASELINE.md): minibatch-scale random gathers are
    access-LATENCY-bound — sampling + feature-fetching M batches as one
    fused program amortizes them (the replicated multibatch trainer's
    20.9 -> 10.3 ms/minibatch), and for the partitioned trainer it also
    amortizes every all_to_all exchange round trip.  Draws differ from M
    independent B-seed calls (slot uids differ) but follow the same law.

    Returns a ``NeighborSample`` whose arrays carry a leading ``(M, ...)``
    axis (scan/vmap-ready) with the B-seed ``node_base``/``edge_base``;
    with ``x`` (N_total, F), also returns it split as (M, n_m, F).
    """
    nb, eb = sample.node_base, sample.edge_base
    fanouts = sample.fanouts
    B0 = nb[1]
    assert B0 % M == 0, (B0, M)
    nb_m, eb_m = _layer_layout(B0 // M, fanouts)

    def split_n(a, extra=()):
        parts = []
        for ell in range(len(nb) - 1):
            span = nb[ell + 1] - nb[ell]
            parts.append(a[nb[ell]: nb[ell + 1]].reshape(
                (M, span // M) + extra))
        return jnp.concatenate(parts, axis=1)

    def split_e(a):
        parts = []
        for ell in range(len(eb) - 1):
            span = eb[ell + 1] - eb[ell]
            parts.append(a[eb[ell]: eb[ell + 1]].reshape(M, span // M))
        return jnp.concatenate(parts, axis=1)

    m_ix = jnp.arange(M, dtype=jnp.int32)[:, None]
    rows_p, cols_p = [], []
    for ell, k in enumerate(fanouts):
        ps = (nb[ell + 1] - nb[ell]) // M       # parents per batch
        blk = slice(eb[ell], eb[ell + 1])
        r = sample.rows[blk].reshape(M, ps * k)
        rows_p.append(r - nb[ell + 1] - m_ix * (ps * k) + nb_m[ell + 1])
        c = sample.cols[blk].reshape(M, ps * k)
        cols_p.append(c - nb[ell] - m_ix * ps + nb_m[ell])
    out = NeighborSample(
        nodes=split_n(sample.nodes),
        node_valid=split_n(sample.node_valid),
        node_state=split_n(sample.node_state),
        rows=jnp.concatenate(rows_p, axis=1),
        cols=jnp.concatenate(cols_p, axis=1),
        eptr=split_e(sample.eptr),
        edge_valid=split_e(sample.edge_valid),
        node_base=nb_m, edge_base=eb_m, fanouts=fanouts)
    if x is None:
        return out
    return out, split_n(x, extra=x.shape[1:])


def compact_sample(sample: NeighborSample):
    """Padded device sample -> compact reference-format arrays.

    Returns ``(samples, rows, cols, edge_index, layer_offsets)`` exactly as
    the reference entry point does (src/python.rs:259-270): local-id COO over
    a dense node list, with per-hop ``(node_begin, edge_begin, node_begin)``
    offsets recorded at hop starts (neighbor_sampling.rs:193)."""
    node_valid = np.asarray(sample.node_valid)
    edge_valid = np.asarray(sample.edge_valid)
    nodes = np.asarray(sample.nodes)
    rows, cols, eptr = (np.asarray(sample.rows), np.asarray(sample.cols),
                        np.asarray(sample.eptr))

    new_idx = np.cumsum(node_valid) - 1  # old slot -> compact index
    samples_out = nodes[node_valid]

    rows_c = new_idx[rows[edge_valid]]
    cols_c = new_idx[cols[edge_valid]]
    eptr_c = eptr[edge_valid].astype(np.int64)

    node_counts = np.cumsum(np.concatenate([[0], node_valid.astype(np.int64)]))
    edge_counts = np.cumsum(np.concatenate([[0], edge_valid.astype(np.int64)]))
    layer_offsets = []
    for ell in range(sample.num_hops):
        nb = int(node_counts[sample.node_base[ell + 1]])
        eb = int(edge_counts[sample.edge_base[ell]])
        layer_offsets.append((nb, eb, nb))

    return (samples_out.astype(np.int64), rows_c.astype(np.int64),
            cols_c.astype(np.int64), eptr_c, layer_offsets)


def neighbor_sampling_homogenous(
    col_ptrs,
    row_indices,
    inputs,
    num_neighbors: List[int],
    sampler: Optional[EdgeSampler] = None,
    filter: Optional[tuple] = None,
    *,
    key: Optional[jax.Array] = None,
):
    """Reference-parity API (tch_geometric.pyi:20-27 / src/python.rs:187-271).

    Accepts host arrays, runs the jitted sampler, compacts to the exact
    reference output tuple.
    """
    col_ptrs = np.asarray(col_ptrs)
    row_indices = np.asarray(row_indices)
    from ..data.graph import make_graph
    graph = make_graph(col_ptrs, row_indices,
                       num_src=int(row_indices.max(initial=-1)) + 1,
                       num_dst=col_ptrs.shape[0] - 1)
    out = sample_neighbors(graph, np.asarray(inputs), num_neighbors,
                           key=key, sampler=sampler, filter=filter)
    return compact_sample(out)
