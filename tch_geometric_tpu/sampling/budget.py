"""Per-node budget sampling (GraphSAGE-budget, temporal, heterogeneous).

TPU-native re-design of /root/reference/src/algo/budget_sampling.rs.  The
reference gives every frontier node its own budget Vec of candidate
``(node, edge, timestamp)`` entries, filled per relation with a 50-capped
reservoir (rs:63-126), then uniformly samples ``num_neighbors[type][layer]``
entries from each node's budget (rs:128-152).

Here the per-node budget is a dense ``(frontier, R_t, 50)`` candidate tensor
(R_t = relations pointing at the node's type) with validity bits:

* Candidate fill = Floyd-sample of ``min(deg, 50)`` in-edge positions per
  (node, relation) + temporal-filter mask — one batched pass per relation.
* ``Budget::sample`` = uniform Gumbel-top-k over each node's flattened
  valid candidates — a single masked top-k per type.
* The chosen candidate's relation decides which per-relation edge region and
  which source-type pool its new node lands in; every (frontier-node,
  relation) pair owns ``k`` statically-placed slots, valid only when the
  selected candidate's relation matches — data-dependent relation routing
  with fully static shapes.

Deliberate divergences from reference quirks (SURVEY §7.4):
* The reference stores the *window position* as the edge ptr
  (``edge: (rel, *i)`` with ``i in [0,50)``, rs:116) — we store the global
  edge ptr, which is what downstream edge-attr gathers need.
* The reference's candidate reservoir draws positions from
  ``0..min(deg, 50)`` (rs:100) — i.e. it silently truncates neighborhoods to
  the *first* 50 edges; Floyd over the full degree samples uniformly from
  ALL edges (cap still 50 candidates).
* ``layer_offsets`` is returned populated (the reference always returns
  empty vecs, rs:199-201, 259-264).

The temporal filter here is the runtime struct variant (rs:13-38): window is
half-open ``[lo, hi)``, NaN timestamps always pass, ``relative`` freezes the
state at the root timestamp while the default propagates the edge timestamp.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..data.graph import CscGraph, make_graph
from ..utils.types import NAN_TIMESTAMP, EdgeType, NodeType, RelType, rel_key
from . import primitives, rng
from .neighbor import sample_edges_uniform

MAX_NEIGHBORS = 50  # rs:10


@struct.dataclass
class BudgetSample:
    """Padded budget sample: per-type pools + per-rel local-id COO."""

    nodes: Dict[str, jax.Array]
    node_ts: Dict[str, jax.Array]
    node_valid: Dict[str, jax.Array]
    rows: Dict[str, jax.Array]
    cols: Dict[str, jax.Array]
    eptr: Dict[str, jax.Array]
    edge_valid: Dict[str, jax.Array]
    meta: Tuple = struct.field(pytree_node=False)


class _Layout:
    """Static slot layout: per-type hop segments subdivided by relation."""

    def __init__(self, node_types, rel_specs, fanouts, num_seeds, num_hops):
        self.node_types = list(node_types)
        self.rel_specs = list(rel_specs)
        self.num_hops = num_hops
        self.fanouts = dict(fanouts)      # per dst node type, per hop
        cap = {t: [num_seeds.get(t, 0)] for t in node_types}
        self.rel_node_off = {}
        self.rel_edge_cap = {r: [] for r, _, _ in rel_specs}
        for ell in range(num_hops):
            add = {t: 0 for t in node_types}
            for r, src, dst in rel_specs:
                k = self.fanouts[dst][ell]
                contrib = cap[dst][ell] * k
                self.rel_node_off[(r, ell)] = add[src]
                add[src] += contrib
                self.rel_edge_cap[r].append(contrib)
            for t in node_types:
                cap[t].append(add[t])
        self.cap = cap
        self.node_base = {t: [int(x) for x in np.cumsum([0] + cap[t])]
                          for t in node_types}
        self.rel_edge_base = {r: [int(x) for x in np.cumsum([0] + self.rel_edge_cap[r])]
                              for r, _, _ in rel_specs}


@functools.partial(jax.jit, static_argnames=("meta",))
def _budget_sampling_impl(
    key,
    graphs: Dict[str, CscGraph],
    edge_ts: Optional[Dict[str, jax.Array]],
    inputs: Dict[str, jax.Array],
    input_ts: Optional[Dict[str, jax.Array]],
    meta: Tuple,
) -> BudgetSample:
    (node_types, rel_specs, fanouts_t, num_seeds_t, num_hops,
     filter_static) = meta
    layout = _Layout(node_types, [tuple(r) for r in rel_specs],
                     dict(fanouts_t), dict(num_seeds_t), num_hops)

    # rels grouped by dst type, in deterministic rel order
    rels_by_dst = {t: [(ri, r, src) for ri, (r, src, dst) in enumerate(rel_specs)
                       if dst == t] for t in node_types}

    nodes = {t: [] for t in node_types}
    valids = {t: [] for t in node_types}
    states = {t: [] for t in node_types}
    for t in node_types:
        n0 = layout.cap[t][0]
        if t in inputs and inputs[t].shape[0] > 0:
            nodes[t].append(inputs[t].astype(jnp.int32))
            valids[t].append(jnp.ones((n0,), jnp.bool_))
            states[t].append(
                input_ts[t].astype(jnp.int32) if input_ts and t in input_ts
                else jnp.full((n0,), NAN_TIMESTAMP, jnp.int32))
        else:
            nodes[t].append(jnp.zeros((n0,), jnp.int32))
            valids[t].append(jnp.zeros((n0,), jnp.bool_))
            states[t].append(jnp.full((n0,), NAN_TIMESTAMP, jnp.int32))

    rows = {r: [] for r, _, _ in rel_specs}
    cols = {r: [] for r, _, _ in rel_specs}
    eptrs = {r: [] for r, _, _ in rel_specs}
    evalids = {r: [] for r, _, _ in rel_specs}

    def filt(w_t, v_t):
        """TemporalFilter::filter (rs:20-29): NaN passes; half-open window."""
        if filter_static is None:
            return jnp.ones_like(v_t, dtype=jnp.bool_)
        (lo, hi), fwd, _rel = filter_static
        d = v_t - w_t
        if not fwd:
            d = -d
        ok = jnp.logical_and(d >= lo, d < hi)
        nan = jnp.logical_or(w_t == NAN_TIMESTAMP, v_t == NAN_TIMESTAMP)
        return jnp.logical_or(nan, ok)

    def mutate(w_t, v_t):
        """TemporalFilter::mutate (rs:31-38)."""
        if filter_static is None:
            return v_t
        _w, _f, relative = filter_static
        return jnp.broadcast_to(w_t, v_t.shape) if relative else v_t

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
                    hop_new[src][r] = (empty, jnp.zeros((0,), jnp.bool_), empty)
                    rows[r].append(empty)
                    cols[r].append(empty)
                    eptrs[r].append(empty)
                    evalids[r].append(jnp.zeros((0,), jnp.bool_))
                continue
            frontier = nodes[t][ell]
            fvalid = valids[t][ell]
            fstate = states[t][ell]

            # ---- Budget::update: (B, R, 50) candidate tensor ----
            cand_v = []
            cand_e = []
            cand_ts = []
            cand_ok = []
            for pos_r, (ri, r, src) in enumerate(t_rels):
                g = graphs[r]
                _deg, _pos, pvalid, eptr, v = sample_edges_uniform(
                    rng.fold(key, ell, ri), g, frontier, fvalid,
                    MAX_NEIGHBORS)
                if edge_ts is not None and r in edge_ts:
                    vts = edge_ts[r][eptr]
                    vts = jnp.where(vts == NAN_TIMESTAMP, fstate[:, None], vts)
                else:
                    vts = jnp.broadcast_to(fstate[:, None], v.shape)
                ok = jnp.logical_and(pvalid, filt(fstate[:, None], vts))
                cand_v.append(v)
                cand_e.append(eptr.astype(jnp.int32))
                cand_ts.append(mutate(fstate[:, None], vts))
                cand_ok.append(ok)
            cand_v = jnp.stack(cand_v, axis=1)      # (B, R, 50)
            cand_e = jnp.stack(cand_e, axis=1)
            cand_ts = jnp.stack(cand_ts, axis=1)
            cand_ok = jnp.stack(cand_ok, axis=1)

            # ---- Budget::sample: uniform top-k over valid candidates ----
            logits = jnp.where(cand_ok.reshape(B, R * MAX_NEIGHBORS),
                               0.0, primitives.NEG_INF)
            sel, sel_valid = primitives.masked_gumbel_topk(
                rng.fold(key, ell, 1000 + node_types.index(t)), logits, k)
            sel_rel = sel // MAX_NEIGHBORS                       # (B, k)
            flat = cand_v.reshape(B, R * MAX_NEIGHBORS)
            sel_v = jnp.take_along_axis(flat, sel, axis=1)
            sel_e = jnp.take_along_axis(
                cand_e.reshape(B, R * MAX_NEIGHBORS), sel, axis=1)
            sel_ts = jnp.take_along_axis(
                cand_ts.reshape(B, R * MAX_NEIGHBORS), sel, axis=1)

            # ---- Route each selection to its relation's static region ----
            col = (layout.node_base[t][ell]
                   + jnp.arange(B, dtype=jnp.int32)[:, None])   # (B, 1)
            for pos_r, (ri, r, src) in enumerate(t_rels):
                match = jnp.logical_and(sel_valid, sel_rel == pos_r)
                base_slot = (layout.node_base[src][ell + 1]
                             + layout.rel_node_off[(r, ell)])
                slot = base_slot + (
                    jnp.arange(B, dtype=jnp.int32)[:, None] * k
                    + jnp.arange(k, dtype=jnp.int32)[None, :])
                hop_new[src][r] = (sel_v.reshape(-1),
                                   match.reshape(-1),
                                   sel_ts.reshape(-1))
                rows[r].append(slot.reshape(-1))
                cols[r].append(jnp.broadcast_to(col, (B, k)).reshape(-1))
                eptrs[r].append(sel_e.reshape(-1))
                evalids[r].append(match.reshape(-1))

        # Assemble hop-(ell+1) segments in rel order.
        for t in node_types:
            parts = [hop_new[t][r] for r, src_t, _d in rel_specs
                     if src_t == t and r in hop_new[t]]
            if parts:
                nodes[t].append(jnp.concatenate([p[0] for p in parts]))
                valids[t].append(jnp.concatenate([p[1] for p in parts]))
                states[t].append(jnp.concatenate([p[2] for p in parts]))
            else:
                nodes[t].append(jnp.zeros((0,), jnp.int32))
                valids[t].append(jnp.zeros((0,), jnp.bool_))
                states[t].append(jnp.zeros((0,), jnp.int32))

    def cat(parts, dtype):
        parts = [p for p in parts if p.shape[0] >= 0]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype)

    return BudgetSample(
        nodes={t: cat(nodes[t], jnp.int32) for t in node_types},
        node_ts={t: cat(states[t], jnp.int32) for t in node_types},
        node_valid={t: cat(valids[t], jnp.bool_) for t in node_types},
        rows={r: cat(rows[r], jnp.int32) for r, _, _ in rel_specs},
        cols={r: cat(cols[r], jnp.int32) for r, _, _ in rel_specs},
        eptr={r: cat(eptrs[r], jnp.int32) for r, _, _ in rel_specs},
        edge_valid={r: cat(evalids[r], jnp.bool_) for r, _, _ in rel_specs},
        meta=meta,
    )


def sample_budget(
    graphs: Dict[RelType, CscGraph],
    edge_types: Sequence[EdgeType],
    inputs: Dict[NodeType, jax.Array],
    num_neighbors: Dict[NodeType, Sequence[int]],
    num_hops: int,
    *,
    edge_timestamps: Optional[Dict[RelType, jax.Array]] = None,
    input_timestamps: Optional[Dict[NodeType, jax.Array]] = None,
    window: Optional[Tuple[int, int]] = None,
    forward: bool = False,
    relative: bool = False,
    node_types: Optional[Sequence[NodeType]] = None,
    key: Optional[jax.Array] = None,
) -> BudgetSample:
    """Device-native budget sampling (mirrors src/python.rs:484-581)."""
    if key is None:
        key = rng.next_key()
    if node_types is None:
        node_types = sorted({t for e in edge_types for t in (e[0], e[2])})
    rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in edge_types))
    inputs = {t: jnp.asarray(v) for t, v in inputs.items()}
    num_seeds = {t: int(v.shape[0]) for t, v in inputs.items()}
    if edge_timestamps is not None:
        edge_timestamps = {r: jnp.asarray(v, jnp.int32)
                           for r, v in edge_timestamps.items()}
    if input_timestamps is not None:
        input_timestamps = {t: jnp.asarray(v, jnp.int32)
                            for t, v in input_timestamps.items()}
    filter_static = None
    if window is not None:
        filter_static = ((int(window[0]), int(window[1])),
                         bool(forward), bool(relative))
    meta = (
        tuple(node_types),
        rel_specs,
        tuple((t, tuple(int(x) for x in num_neighbors[t])) for t in node_types),
        tuple(sorted(num_seeds.items())),
        int(num_hops),
        filter_static,
    )
    return _budget_sampling_impl(key, graphs, edge_timestamps, inputs,
                                 input_timestamps, meta)


def compact_budget_sample(sample: BudgetSample):
    """Padded -> reference format (src/python.rs:551-580): per-type nodes +
    timestamps, per-rel local-id COO, per-rel REAL layer offsets."""
    (node_types, rel_specs, fanouts_t, num_seeds_t, num_hops,
     _f) = sample.meta
    layout = _Layout(node_types, [tuple(r) for r in rel_specs],
                     dict(fanouts_t), dict(num_seeds_t), num_hops)
    nv = {t: np.asarray(sample.node_valid[t]) for t in node_types}
    new_idx = {t: np.cumsum(nv[t]) - 1 for t in node_types}
    ncum = {t: np.concatenate([[0], np.cumsum(nv[t])]) for t in node_types}
    nodes_out = {t: np.asarray(sample.nodes[t])[nv[t]].astype(np.int64)
                 for t in node_types}
    ts_out = {t: np.asarray(sample.node_ts[t])[nv[t]].astype(np.int64)
              for t in node_types}
    rows_out, cols_out, eptr_out, offs_out = {}, {}, {}, {}
    for (r, src, dst) in rel_specs:
        ev = np.asarray(sample.edge_valid[r])
        rows_out[r] = new_idx[src][np.asarray(sample.rows[r])[ev]].astype(np.int64)
        cols_out[r] = new_idx[dst][np.asarray(sample.cols[r])[ev]].astype(np.int64)
        eptr_out[r] = np.asarray(sample.eptr[r])[ev].astype(np.int64)
        ecum = np.concatenate([[0], np.cumsum(ev)])
        offs = []
        for ell in range(num_hops):
            src_slot = layout.node_base[src][ell + 1] + layout.rel_node_off[(r, ell)]
            offs.append((int(ncum[src][src_slot]),
                         int(ecum[layout.rel_edge_base[r][ell]]),
                         int(ncum[dst][layout.node_base[dst][ell + 1]])))
        offs_out[r] = offs
    return nodes_out, ts_out, rows_out, cols_out, eptr_out, offs_out


def budget_sampling(
    node_types: List[NodeType],
    edge_types: List[EdgeType],
    col_ptrs: Dict[RelType, np.ndarray],
    row_indices: Dict[RelType, np.ndarray],
    row_timestamps: Optional[Dict[RelType, np.ndarray]],
    inputs: Dict[NodeType, np.ndarray],
    input_timestamps: Optional[Dict[NodeType, np.ndarray]],
    num_neighbors: Dict[NodeType, List[int]],
    num_hops: int,
    window: Optional[Tuple[int, int]] = None,
    forward: bool = False,
    relative: bool = False,
    *,
    key: Optional[jax.Array] = None,
    node_counts: Optional[Dict[NodeType, int]] = None,
):
    """Reference-parity API (tch_geometric.pyi:64-80 / src/python.rs:484-581)."""
    edge_types = [tuple(e) for e in edge_types]
    graphs = {}
    for e in edge_types:
        r = rel_key(e)
        cp = np.asarray(col_ptrs[r])
        ri = np.asarray(row_indices[r])
        n_src = (int(node_counts[e[0]]) if node_counts
                 else int(ri.max(initial=-1)) + 1)
        graphs[r] = make_graph(cp, ri, num_src=n_src, num_dst=cp.shape[0] - 1)
    out = sample_budget(
        graphs, edge_types,
        {t: np.asarray(v) for t, v in inputs.items()},
        num_neighbors, num_hops,
        edge_timestamps=row_timestamps,
        input_timestamps=input_timestamps,
        window=window, forward=forward, relative=relative,
        node_types=node_types, key=key)
    return compact_budget_sample(out)
