"""Heterogeneous layer-wise neighbor sampling.

TPU-native re-design of ``neighbor_sampling_heterogenous``
(/root/reference/src/algo/neighbor_sampling.rs:233-356).  The reference keeps
per-node-type sample Vecs with (begin, end) frontier slices and, per hop,
walks every relation type sequentially, reservoir-sampling each dst-frontier
node's in-edges and appending new nodes to the src-type Vec (with an unsafe
alias cast for self-relations, rs:307-308).

Here the per-(relation, hop) work is the same batched choose-k engine as the
homogeneous sampler, and all bookkeeping is static layout arithmetic:

* Per-type node pools have static per-hop segment capacities:
  ``cap[src][l+1] = sum over rels r with src(r)=src of cap[dst(r)][l] * k_r[l]``.
  Within a hop segment, relations occupy statically-known sub-ranges in a
  fixed (sorted) relation order — replacing the reference's nondeterministic
  HashMap iteration order with a deterministic one.
* Self-relations need no aliasing tricks: hop l reads the dst pool segment
  written at hop l-1 and writes the src pool segment of hop l+1; XLA sees
  pure functional arrays.
* Strings never enter the compute path: relations/types are dense integer
  ids (``TypeIndex``), per SURVEY §7.3 (vs rs:255-258 string keys in the
  hot loop).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..data.graph import CscGraph, make_graph
from ..utils.config import (
    EdgeSampler,
    TemporalEdgeFilter,
    UniformEdgeSampler,
    WeightedEdgeSampler,
)
from ..utils.types import EdgeType, NodeType, RelType, rel_key
from . import primitives, rng
from .neighbor import _sample_one_hop, _select_lanes


def _stack_ells(gs: Sequence[CscGraph]) -> jax.Array:
    """Stack the ELL tables of relations sharing a dst type into one
    ``(m, |V_dst|, Wmax)`` array (lanes zero-padded to the widest table;
    the trailing two columns stay degree / window start)."""
    Wm = max(g.ell.shape[1] for g in gs)
    parts = []
    for g in gs:
        e = g.ell
        if e.shape[1] < Wm:
            lanes = jnp.pad(e[:, :-2], ((0, 0), (0, Wm - e.shape[1])))
            e = jnp.concatenate([lanes, e[:, -2:]], axis=1)
        parts.append(e)
    return jnp.stack(parts)


def _fused_uniform_group(key, gs, ks, frontier, fvalid, with_replacement):
    """One fused uniform sampling hop for ``m`` relations that share the
    same dst-type frontier.

    The reference walks relations sequentially (neighbor_sampling.rs:294);
    per-relation XLA ops at minibatch scale are latency-bound, so all m
    relations' ELL rows are fetched in ONE gather over a stacked table and
    sampled in one fused draw.  Per-(relation, node) draws stay independent
    — each stacked row ranks its own lanes.  Returns per-rel lists of
    ``(eptr (B, k_r), neighbor (B, k_r), valid (B, k_r))``.
    """
    m = len(gs)
    stacked = _stack_ells(gs)                        # (m, V, W)
    V, W = stacked.shape[1], stacked.shape[2]
    f = jnp.clip(frontier, 0, V - 1)
    rows = stacked.reshape(m * V, W)[
        jnp.arange(m, dtype=jnp.int32)[:, None] * V + f[None, :]]  # (m, B, W)
    lanes, deg, starts = rows[..., :-2], rows[..., -2], rows[..., -1]
    deg = jnp.where(fvalid[None, :], deg, 0)
    kmax = max(ks)
    if with_replacement:
        pos, valid = primitives.replacement_positions(key, deg, kmax)
    else:
        # First k_r entries of a uniform kmax-subset in random order form a
        # uniform k_r-subset, so one top-k serves every relation's fanout.
        pos, valid = primitives.uniform_lane_topk(key, deg, W - 2, kmax)
    eptr = starts[..., None] + pos
    neighbor = _select_lanes(lanes, jnp.clip(pos, 0, W - 3))
    out = []
    for i, (g, k) in enumerate(zip(gs, ks)):
        out.append((
            jnp.clip(eptr[i, :, :k], 0, max(g.num_edges - 1, 0)),
            neighbor[i, :, :k].astype(g.indices.dtype),
            valid[i, :, :k],
        ))
    return out


class HeteroLayout:
    """Static per-type/per-rel slot layout for one sampling configuration.

    node_base[t][l] = first slot of hop-l's segment in type t's pool
    rel_node_off[(r, l)] = slot in src(r)'s pool where rel r's hop-l
        contribution begins
    rel_edge_base[r][l] = first edge slot of hop l in rel r's edge arrays
    """

    def __init__(
        self,
        node_types: Sequence[str],
        rel_specs: Sequence[Tuple[str, str, str]],  # (rel, src, dst) by rel order
        fanouts: Dict[str, Sequence[int]],
        num_seeds: Dict[str, int],
        num_hops: int,
    ):
        self.node_types = list(node_types)
        self.rel_specs = list(rel_specs)
        self.num_hops = num_hops
        self.fanouts = {r: list(f) for r, f in fanouts.items()}

        cap = {t: [num_seeds.get(t, 0)] for t in node_types}
        self.rel_node_off: Dict[Tuple[str, int], int] = {}
        self.rel_edge_cap: Dict[str, List[int]] = {r: [] for r, _, _ in rel_specs}
        for ell in range(num_hops):
            add = {t: 0 for t in node_types}
            for r, src, dst in rel_specs:
                k = self.fanouts[r][ell]
                contrib = cap[dst][ell] * k
                self.rel_node_off[(r, ell)] = add[src]
                add[src] += contrib
                self.rel_edge_cap[r].append(contrib)
            for t in node_types:
                cap[t].append(add[t])

        self.cap = cap
        self.node_base = {
            t: [int(x) for x in np.cumsum([0] + cap[t])] for t in node_types}
        self.rel_edge_base = {
            r: [int(x) for x in np.cumsum([0] + self.rel_edge_cap[r])]
            for r, _, _ in rel_specs}

    def total_nodes(self, t: str) -> int:
        return self.node_base[t][-1]

    def total_edges(self, r: str) -> int:
        return self.rel_edge_base[r][-1]


@struct.dataclass
class HeteroNeighborSample:
    """Padded hetero sample: per-type node pools + per-rel local-id COO."""

    nodes: Dict[str, jax.Array]
    node_valid: Dict[str, jax.Array]
    node_state: Dict[str, jax.Array]
    rows: Dict[str, jax.Array]       # local src-type slot
    cols: Dict[str, jax.Array]       # local dst-type slot
    eptr: Dict[str, jax.Array]
    edge_valid: Dict[str, jax.Array]
    meta: Tuple = struct.field(pytree_node=False)  # hashable layout spec

    def layout(self) -> HeteroLayout:
        node_types, rel_specs, fanouts, num_seeds, num_hops = self.meta
        return HeteroLayout(list(node_types), [tuple(r) for r in rel_specs],
                            dict(fanouts), dict(num_seeds), num_hops)


@functools.partial(jax.jit, static_argnames=("meta", "with_replacement",
                                             "filter_static", "window"))
def _sample_hetero_impl(
    key,
    graphs: Dict[str, CscGraph],
    inputs: Dict[str, jax.Array],
    input_state: Dict[str, jax.Array],
    log_weights: Optional[Dict[str, jax.Array]],
    timestamps: Optional[Dict[str, jax.Array]],
    meta: Tuple,
    with_replacement: bool,
    filter_static,
    window: int,
) -> HeteroNeighborSample:
    node_types, rel_specs, fanouts_t, num_seeds_t, num_hops = meta
    layout = HeteroLayout(list(node_types), [tuple(r) for r in rel_specs],
                          dict(fanouts_t), dict(num_seeds_t), num_hops)

    filter_cfg = None
    if filter_static is not None:
        w, fwd, mode = filter_static
        filter_cfg = TemporalEdgeFilter(window=w, forward=fwd, mode=mode)

    # Per-type pools as lists of per-segment arrays (concatenated at the end).
    nodes = {t: [] for t in node_types}
    valids = {t: [] for t in node_types}
    states = {t: [] for t in node_types}
    for t in node_types:
        n0 = layout.cap[t][0]
        if t in inputs and inputs[t].shape[0] > 0:
            nodes[t].append(inputs[t].astype(jnp.int32))
            valids[t].append(jnp.ones((n0,), jnp.bool_))
            states[t].append(input_state[t].astype(jnp.int32)
                             if t in input_state else jnp.zeros((n0,), jnp.int32))
        else:
            # Always append the (possibly empty) seed segment so hop-l
            # segments stay at list index l.
            nodes[t].append(jnp.zeros((n0,), jnp.int32))
            valids[t].append(jnp.zeros((n0,), jnp.bool_))
            states[t].append(jnp.zeros((n0,), jnp.int32))

    rows = {r: [] for r, _, _ in rel_specs}
    cols = {r: [] for r, _, _ in rel_specs}
    eptrs = {r: [] for r, _, _ in rel_specs}
    evalids = {r: [] for r, _, _ in rel_specs}

    def segment(t, ell):
        """(nodes, valid, state) of type t's hop-ell segment."""
        if layout.cap[t][ell] == 0:
            z = jnp.zeros((0,), jnp.int32)
            return z, jnp.zeros((0,), jnp.bool_), z
        return nodes[t][ell], valids[t][ell], states[t][ell]

    # Uniform, unfiltered sampling fuses every relation sharing a dst-type
    # frontier into one stacked-ELL gather + draw per hop (latency-bound
    # otherwise: 2 hops x 6 relations of small ops).
    fuse_ok = (log_weights is None and filter_cfg is None
               and all(graphs[r].ell is not None for r, _, _ in rel_specs))

    for ell in range(num_hops):
        hop_new = {t: {} for t in node_types}  # rel -> (nodes, valid, state)
        fused: Dict[str, Tuple[jax.Array, jax.Array, jax.Array]] = {}
        if fuse_ok:
            by_dst: Dict[str, List[int]] = {}
            for ri, (r, src, dst) in enumerate(rel_specs):
                if (layout.fanouts[r][ell] > 0
                        and layout.cap[dst][ell] > 0):
                    by_dst.setdefault(dst, []).append(ri)
            for gi, (dst, ris) in enumerate(sorted(by_dst.items())):
                gs = [graphs[rel_specs[ri][0]] for ri in ris]
                if len(ris) < 2 or len({g.ell.shape[0] for g in gs}) != 1:
                    continue
                ks = [layout.fanouts[rel_specs[ri][0]][ell] for ri in ris]
                frontier, fvalid, _fstate = segment(dst, ell)
                group = _fused_uniform_group(
                    rng.fold(key, ell, 100 + gi), gs, ks, frontier, fvalid,
                    with_replacement)
                for ri, res in zip(ris, group):
                    fused[rel_specs[ri][0]] = res

        for ri, (r, src, dst) in enumerate(rel_specs):
            k = layout.fanouts[r][ell]
            frontier, fvalid, fstate = segment(dst, ell)
            B = frontier.shape[0]
            if B == 0 or k == 0:
                empty = jnp.zeros((0,), jnp.int32)
                hop_new[src][r] = (empty, jnp.zeros((0,), jnp.bool_), empty)
                rows[r].append(empty)
                cols[r].append(empty)
                eptrs[r].append(empty)
                evalids[r].append(jnp.zeros((0,), jnp.bool_))
                continue
            if r in fused:
                eptr, neighbor, valid = fused[r]
                new_state = jnp.broadcast_to(fstate[:, None], eptr.shape)
            else:
                g = graphs[r]
                lw = log_weights[r] if log_weights is not None else None
                ts = timestamps[r] if timestamps is not None else None
                eptr, neighbor, valid, new_state = _sample_one_hop(
                    rng.fold(key, ell, ri), g, frontier, fvalid, fstate, k,
                    with_replacement=with_replacement,
                    log_weights=lw, filter_cfg=filter_cfg, timestamps=ts,
                    window=window)
            # local slot of appended node in src pool
            base = layout.node_base[src][ell + 1] + layout.rel_node_off[(r, ell)]
            slot = base + (jnp.arange(B, dtype=jnp.int32)[:, None] * k
                           + jnp.arange(k, dtype=jnp.int32)[None, :])
            col = layout.node_base[dst][ell] + jnp.arange(B, dtype=jnp.int32)
            hop_new[src][r] = (neighbor.reshape(-1), valid.reshape(-1),
                               new_state.reshape(-1))
            rows[r].append(slot.reshape(-1))
            cols[r].append(jnp.broadcast_to(col[:, None], (B, k)).reshape(-1))
            eptrs[r].append(eptr.astype(jnp.int32).reshape(-1))
            evalids[r].append(valid.reshape(-1))

        # Assemble each type's hop-(ell+1) segment in rel order.
        for t in node_types:
            parts_n, parts_v, parts_s = [], [], []
            for r, src, _dst in rel_specs:
                if src == t and r in hop_new[t]:
                    n_, v_, s_ = hop_new[t][r]
                    parts_n.append(n_)
                    parts_v.append(v_)
                    parts_s.append(s_)
            if parts_n:
                nodes[t].append(jnp.concatenate(parts_n))
                valids[t].append(jnp.concatenate(parts_v))
                states[t].append(jnp.concatenate(parts_s))
            else:
                nodes[t].append(jnp.zeros((0,), jnp.int32))
                valids[t].append(jnp.zeros((0,), jnp.bool_))
                states[t].append(jnp.zeros((0,), jnp.int32))

    def cat(parts, dtype):
        return (jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype))

    return HeteroNeighborSample(
        nodes={t: cat(nodes[t], jnp.int32) for t in node_types},
        node_valid={t: cat(valids[t], jnp.bool_) for t in node_types},
        node_state={t: cat(states[t], jnp.int32) for t in node_types},
        rows={r: cat(rows[r], jnp.int32) for r, _, _ in rel_specs},
        cols={r: cat(cols[r], jnp.int32) for r, _, _ in rel_specs},
        eptr={r: cat(eptrs[r], jnp.int32) for r, _, _ in rel_specs},
        edge_valid={r: cat(evalids[r], jnp.bool_) for r, _, _ in rel_specs},
        meta=meta,
    )


def sample_hetero_neighbors(
    graphs: Dict[RelType, CscGraph],
    edge_types: Sequence[EdgeType],
    inputs: Dict[NodeType, jax.Array],
    num_neighbors: Dict[RelType, Sequence[int]],
    num_hops: int,
    *,
    node_types: Optional[Sequence[NodeType]] = None,
    key: Optional[jax.Array] = None,
    sampler: Optional[EdgeSampler] = None,
    filter: Optional[Tuple[TemporalEdgeFilter, Dict[NodeType, jax.Array]]] = None,
    window: int = 256,
) -> HeteroNeighborSample:
    """Device-native hetero sampling (mirrors src/python.rs:273-395 inputs)."""
    if key is None:
        key = rng.next_key()
    if node_types is None:
        node_types = sorted({t for e in edge_types for t in (e[0], e[2])})
    # Deterministic relation order (reference iterates a HashMap, rs:294).
    rel_specs = tuple(sorted(
        (rel_key(e), e[0], e[2]) for e in edge_types if rel_key(e) in num_neighbors))

    inputs = {t: jnp.asarray(v) for t, v in inputs.items()}
    num_seeds = {t: int(v.shape[0]) for t, v in inputs.items()}

    with_replacement = False
    log_weights = None
    if isinstance(sampler, UniformEdgeSampler):
        with_replacement = sampler.with_replacement
    elif isinstance(sampler, WeightedEdgeSampler):
        log_weights = {r: jnp.log(jnp.asarray(w, dtype=jnp.float32))
                       for r, w in sampler.weights.items()}

    filter_static = None
    timestamps = None
    input_state: Dict[str, jax.Array] = {}
    if filter is not None:
        fcfg, init_state = filter
        filter_static = (tuple(int(x) for x in fcfg.window),
                         bool(fcfg.forward), int(fcfg.mode))
        timestamps = {r: jnp.asarray(v, dtype=jnp.int32)
                      for r, v in fcfg.timestamps.items()}
        input_state = {t: jnp.asarray(v, dtype=jnp.int32)
                       for t, v in init_state.items()}

    meta = (
        tuple(node_types),
        rel_specs,
        tuple((r, tuple(int(k) for k in num_neighbors[r])) for r, _, _ in rel_specs),
        tuple(sorted(num_seeds.items())),
        int(num_hops),
    )
    return _sample_hetero_impl(
        key, graphs, inputs, input_state, log_weights, timestamps,
        meta, with_replacement, filter_static, window)


def compact_hetero_sample(sample: HeteroNeighborSample):
    """Padded device sample -> reference-format dicts
    (src/python.rs:375-394): per-type node lists, per-rel local-id COO +
    per-rel layer offsets ``(src_len, edge_len, dst_len)`` recorded at each
    relation's turn within each hop (neighbor_sampling.rs:313-315)."""
    layout = sample.layout()
    node_types, rel_specs = layout.node_types, layout.rel_specs

    nv = {t: np.asarray(sample.node_valid[t]) for t in node_types}
    new_idx = {t: np.cumsum(nv[t]) - 1 for t in node_types}
    samples_out = {t: np.asarray(sample.nodes[t])[nv[t]].astype(np.int64)
                   for t in node_types}

    rows_out, cols_out, eptr_out, offsets_out = {}, {}, {}, {}
    # cumulative valid-node counts by slot, for offset bookkeeping
    ncum = {t: np.concatenate([[0], np.cumsum(nv[t])]) for t in node_types}

    for r, src, dst in rel_specs:
        ev = np.asarray(sample.edge_valid[r])
        rows = np.asarray(sample.rows[r])[ev]
        cols = np.asarray(sample.cols[r])[ev]
        rows_out[r] = new_idx[src][rows].astype(np.int64)
        cols_out[r] = new_idx[dst][cols].astype(np.int64)
        eptr_out[r] = np.asarray(sample.eptr[r])[ev].astype(np.int64)

        ecum = np.concatenate([[0], np.cumsum(ev)])
        offs = []
        for ell in range(layout.num_hops):
            # src length at this relation's turn: all valid src slots before
            # this rel's hop-ell contribution region.
            src_slot = layout.node_base[src][ell + 1] + layout.rel_node_off[(r, ell)]
            src_len = int(ncum[src][src_slot])
            edge_len = int(ecum[layout.rel_edge_base[r][ell]])
            # dst frontier length at hop start
            dst_len = int(ncum[dst][layout.node_base[dst][ell + 1]])
            offs.append((src_len, edge_len, dst_len))
        offsets_out[r] = offs

    return samples_out, rows_out, cols_out, eptr_out, offsets_out


def neighbor_sampling_heterogenous(
    node_types: List[NodeType],
    edge_types: List[EdgeType],
    col_ptrs: Dict[RelType, np.ndarray],
    row_indices: Dict[RelType, np.ndarray],
    inputs: Dict[NodeType, np.ndarray],
    num_neighbors: Dict[RelType, List[int]],
    num_hops: int,
    sampler: Optional[EdgeSampler] = None,
    filter: Optional[tuple] = None,
    *,
    key: Optional[jax.Array] = None,
    node_counts: Optional[Dict[NodeType, int]] = None,
):
    """Reference-parity API (tch_geometric.pyi:31-44 / src/python.rs:273-395)."""
    edge_types = [tuple(e) for e in edge_types]
    graphs = {}
    for e in edge_types:
        r = rel_key(e)
        cp = np.asarray(col_ptrs[r])
        ri = np.asarray(row_indices[r])
        n_src = (int(node_counts[e[0]]) if node_counts
                 else int(ri.max(initial=-1)) + 1)
        graphs[r] = make_graph(cp, ri, num_src=n_src, num_dst=cp.shape[0] - 1)
    out = sample_hetero_neighbors(
        graphs, edge_types,
        {t: np.asarray(v) for t, v in inputs.items()},
        num_neighbors, num_hops,
        node_types=node_types, key=key, sampler=sampler, filter=filter)
    return compact_hetero_sample(out)
