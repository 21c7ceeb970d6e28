"""Temporal heterogeneous HGT sampling.

TPU-native re-design of /root/reference/src/algo/hgt_sampling.rs (budget-based
importance sampling per the HGT paper).  The reference keeps a global
per-node-type budget as ``HashMap<NodeIdx, {score, timestamp}>`` with per-edge
upserts (rs:27-102), samples ``num_samples[type][layer]`` nodes with
probability proportional to score^2 by weighted reservoir over the whole
hashmap — with O(n) ``keys().nth(i)`` lookups (rs:104-135) — and finally
reconstructs the induced adjacency with a 50-cap reservoir per node
(rs:244-268).

Here the budget is a **dense per-type score table** (SURVEY §7.3): arrays of
shape ``(|V_type|,)`` for score / timestamp / in-sample flag / local id.

* ``update_budget`` becomes: Floyd-sample ``min(deg, 50)`` in-edge positions
  per new target (the reference's MAX_NEIGHBORS=50 reservoir cap, rs:72),
  mask out already-sampled sources and out-of-timerange timestamps, then one
  ``segment_sum`` scatter-add of ``1/deg_capped`` into the score table.
* ``sample_from`` (prob ~ score^2) becomes Gumbel-top-k over
  ``2*log(score)`` — weighted sampling without replacement over the dense
  table, no hashmap iteration.
* Sampled nodes are "moved out of the budget" by zeroing their score and
  setting the in-sample flag; slots in the per-type output node list are
  statically laid out per layer (capacity ``num_samples[type][layer]``) with
  validity bits.
* Timestamp semantics follow rs:82-92: edge ts, NaN inherits the target's
  ts, optional absolute timerange gate.

Everything is one jitted fixed-shape program per (type/rel spec, fanout,
hop-count) configuration.
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
class HGTSample:
    """Padded HGT sample: per-type node lists + per-rel induced COO."""

    nodes: Dict[str, jax.Array]       # (C_t,) node ids
    node_ts: Dict[str, jax.Array]     # (C_t,) timestamps
    node_valid: Dict[str, jax.Array]  # (C_t,) bool
    rows: Dict[str, jax.Array]        # local src slot
    cols: Dict[str, jax.Array]        # local dst slot
    eptr: Dict[str, jax.Array]
    edge_valid: Dict[str, jax.Array]
    meta: Tuple = struct.field(pytree_node=False)


def _update_budget(
    key,
    rel_specs,
    graphs,
    edge_ts,
    node_counts,
    score,        # dict t -> (|V_t|,) f32
    btime,        # dict t -> (|V_t|,) i32
    in_sample,    # dict t -> (|V_t|,) bool
    new_nodes,    # dict t -> (m_t,) newly added targets (padded)
    new_ts,       # dict t -> (m_t,)
    new_valid,    # dict t -> (m_t,) bool
    timerange,    # None | (lo, hi) static
):
    """Scatter 1/deg_capped into source-type score tables for the in-edges of
    each newly sampled target node (rs:27-102)."""
    for ri, (r, src, dst) in enumerate(rel_specs):
        w = new_nodes[dst]
        if w.shape[0] == 0:
            continue
        wv = new_valid[dst]
        wts = new_ts[dst]
        g = graphs[r]
        deg, _pos, pvalid, eptr, v = sample_edges_uniform(
            rng.fold(key, ri), g, w, wv, MAX_NEIGHBORS)   # (m, 50) src ids
        # Line 2: inverse of the capped neighbor count (rs:72-73).
        ncount = jnp.minimum(deg, MAX_NEIGHBORS)
        inv_deg = jnp.where(ncount > 0, 1.0 / jnp.maximum(ncount, 1), 0.0)
        # Line 5: edge ts, NaN inherits target ts (rs:82-85).
        if edge_ts is not None and r in edge_ts:
            vts = edge_ts[r][eptr]
            vts = jnp.where(vts == NAN_TIMESTAMP, wts[:, None], vts)
        else:
            vts = jnp.broadcast_to(wts[:, None], v.shape)
        ok = jnp.logical_and(pvalid, jnp.logical_not(in_sample[src][v]))
        if timerange is not None:
            lo, hi = timerange
            in_range = jnp.logical_and(vts >= lo, vts < hi)
            ok = jnp.logical_and(
                ok, jnp.logical_or(vts == NAN_TIMESTAMP, in_range))
        contrib = jnp.where(ok, inv_deg[:, None], 0.0)
        # Line 8: score += inv_deg (segment scatter-add).
        score[src] = score[src].at[v].add(
            contrib, mode="drop", indices_are_sorted=False)
        # Timestamp: last-write-wins scatter (reference overwrites per touch).
        # Conditional scatter: masked lanes get an out-of-range index and are
        # dropped, so they can never clobber a valid lane's write.
        v_masked = jnp.where(ok, v, node_counts[src])
        btime[src] = btime[src].at[v_masked].set(vts, mode="drop")
    return score, btime


@functools.partial(jax.jit, static_argnames=("meta",))
def _hgt_sampling_impl(
    key,
    graphs: Dict[str, CscGraph],
    edge_ts: Optional[Dict[str, jax.Array]],
    inputs: Dict[str, jax.Array],
    input_ts: Optional[Dict[str, jax.Array]],
    meta: Tuple,
) -> HGTSample:
    (node_types, rel_specs, num_samples_t, num_hops, timerange,
     node_counts_t) = meta
    num_samples = dict(num_samples_t)
    node_counts = dict(node_counts_t)

    # Dense budget tables.
    score = {t: jnp.zeros((node_counts[t],), jnp.float32) for t in node_types}
    btime = {t: jnp.full((node_counts[t],), NAN_TIMESTAMP, jnp.int32)
             for t in node_types}
    in_sample = {t: jnp.zeros((node_counts[t],), jnp.bool_) for t in node_types}
    local_id = {t: jnp.zeros((node_counts[t],), jnp.int32) for t in node_types}

    # Output node lists: seeds segment + one segment per layer.
    caps = {t: [len(inputs[t]) if t in inputs else 0] +
               [num_samples[t][l] for l in range(num_hops)]
            for t in node_types}
    base = {t: np.cumsum([0] + caps[t]).tolist() for t in node_types}

    nodes = {}
    node_ts = {}
    node_valid = {}
    for t in node_types:
        C = base[t][-1]
        n = jnp.zeros((C,), jnp.int32)
        ts_ = jnp.full((C,), NAN_TIMESTAMP, jnp.int32)
        val = jnp.zeros((C,), jnp.bool_)
        if t in inputs and inputs[t].shape[0] > 0:
            seeds = inputs[t].astype(jnp.int32)
            n = n.at[: seeds.shape[0]].set(seeds)
            if input_ts is not None and t in input_ts:
                ts_ = ts_.at[: seeds.shape[0]].set(input_ts[t].astype(jnp.int32))
            val = val.at[: seeds.shape[0]].set(True)
            in_sample[t] = in_sample[t].at[seeds].set(True, mode="drop")
            local_id[t] = local_id[t].at[seeds].set(
                jnp.arange(seeds.shape[0], dtype=jnp.int32), mode="drop")
        nodes[t] = n
        node_ts[t] = ts_
        node_valid[t] = val

    # Budget init from seeds (rs:183-196).
    score, btime = _update_budget(
        rng.fold(key, 0), rel_specs, graphs, edge_ts, node_counts,
        score, btime, in_sample,
        {t: nodes[t][: base[t][1]] for t in node_types},
        {t: node_ts[t][: base[t][1]] for t in node_types},
        {t: node_valid[t][: base[t][1]] for t in node_types},
        timerange)

    for layer in range(num_hops):
        new_nodes, new_ts_d, new_valid = {}, {}, {}
        for t in node_types:
            n = num_samples[t][layer]
            if n == 0 or node_counts[t] == 0:
                new_nodes[t] = jnp.zeros((n,), jnp.int32)
                new_ts_d[t] = jnp.full((n,), NAN_TIMESTAMP, jnp.int32)
                new_valid[t] = jnp.zeros((n,), jnp.bool_)
                continue
            # Sample n nodes with prob ~ score^2 (rs:104-135) by Gumbel
            # top-k over 2*log(score); zero-score rows are out of budget.
            logits = jnp.where(score[t] > 0.0,
                               2.0 * jnp.log(jnp.maximum(score[t], 1e-30)),
                               primitives.NEG_INF)
            idx, valid = primitives.masked_gumbel_topk(
                rng.fold(key, 1, layer, node_types.index(t)), logits, n)
            chosen = idx.astype(jnp.int32)
            new_nodes[t] = jnp.where(valid, chosen, 0)
            new_ts_d[t] = jnp.where(valid, btime[t][chosen], NAN_TIMESTAMP)
            new_valid[t] = valid
            # Move out of budget; record output slot (rs:213-221).
            slot = base[t][layer + 1] + jnp.arange(n, dtype=jnp.int32)
            nodes[t] = nodes[t].at[slot].set(new_nodes[t])
            node_ts[t] = node_ts[t].at[slot].set(new_ts_d[t])
            node_valid[t] = node_valid[t].at[slot].set(valid)
            chosen_masked = jnp.where(valid, chosen, node_counts[t])
            score[t] = score[t].at[chosen_masked].set(0.0, mode="drop")
            in_sample[t] = in_sample[t].at[chosen_masked].set(True, mode="drop")
            local_id[t] = local_id[t].at[chosen_masked].set(slot, mode="drop")

        if layer < num_hops - 1:
            score, btime = _update_budget(
                rng.fold(key, 2, layer), rel_specs, graphs, edge_ts,
                node_counts, score, btime, in_sample,
                new_nodes, new_ts_d, new_valid, timerange)

    # Induced adjacency reconstruction, <=50 in-edges per dst (rs:244-268).
    rows, cols, eptrs, evalids = {}, {}, {}, {}
    for ri, (r, src, dst) in enumerate(rel_specs):
        w = nodes[dst]
        C = w.shape[0]
        if C == 0 or node_counts[dst] == 0:
            z = jnp.zeros((0,), jnp.int32)
            rows[r], cols[r], eptrs[r] = z, z, z
            evalids[r] = jnp.zeros((0,), jnp.bool_)
            continue
        g = graphs[r]
        _deg, _pos, pvalid, eptr, v = sample_edges_uniform(
            rng.fold(key, 3, ri), g, w, node_valid[dst], MAX_NEIGHBORS)
        keep = jnp.logical_and(pvalid, in_sample[src][v])
        rows[r] = jnp.where(keep, local_id[src][v], 0).reshape(-1)
        cols[r] = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[:, None], (C, MAX_NEIGHBORS)
        ).reshape(-1)
        eptrs[r] = eptr.astype(jnp.int32).reshape(-1)
        evalids[r] = keep.reshape(-1)

    return HGTSample(nodes=nodes, node_ts=node_ts, node_valid=node_valid,
                     rows=rows, cols=cols, eptr=eptrs, edge_valid=evalids,
                     meta=meta)


def sample_hgt(
    graphs: Dict[RelType, CscGraph],
    edge_types: Sequence[EdgeType],
    inputs: Dict[NodeType, jax.Array],
    num_samples: Dict[NodeType, Sequence[int]],
    num_hops: int,
    *,
    node_counts: Dict[NodeType, int],
    edge_timestamps: Optional[Dict[RelType, jax.Array]] = None,
    input_timestamps: Optional[Dict[NodeType, jax.Array]] = None,
    timerange: Optional[Tuple[int, int]] = None,
    node_types: Optional[Sequence[NodeType]] = None,
    key: Optional[jax.Array] = None,
) -> HGTSample:
    """Device-native HGT sampling (mirrors src/python.rs:397-482 inputs)."""
    if key is None:
        key = rng.next_key()
    if node_types is None:
        node_types = sorted({t for e in edge_types for t in (e[0], e[2])})
    rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in edge_types))
    inputs = {t: jnp.asarray(v) for t, v in inputs.items()}
    if edge_timestamps is not None:
        edge_timestamps = {r: jnp.asarray(v, jnp.int32)
                           for r, v in edge_timestamps.items()}
    if input_timestamps is not None:
        input_timestamps = {t: jnp.asarray(v, jnp.int32)
                            for t, v in input_timestamps.items()}
    meta = (
        tuple(node_types),
        rel_specs,
        tuple((t, tuple(int(x) for x in num_samples[t])) for t in node_types),
        int(num_hops),
        None if timerange is None else (int(timerange[0]), int(timerange[1])),
        tuple((t, int(node_counts[t])) for t in node_types),
    )
    return _hgt_sampling_impl(key, graphs, edge_timestamps, inputs,
                              input_timestamps, meta)


def compact_hgt_sample(sample: HGTSample):
    """Padded -> reference output format (src/python.rs:457-481):
    (nodes, node_timestamps, rows, cols, edge_ptrs) dicts."""
    (node_types, rel_specs, *_rest) = sample.meta
    nv = {t: np.asarray(sample.node_valid[t]) for t in node_types}
    new_idx = {t: np.cumsum(nv[t]) - 1 for t in node_types}
    nodes_out = {t: np.asarray(sample.nodes[t])[nv[t]].astype(np.int64)
                 for t in node_types}
    ts_out = {t: np.asarray(sample.node_ts[t])[nv[t]].astype(np.int64)
              for t in node_types}
    rows_out, cols_out, eptr_out = {}, {}, {}
    for (r, src, dst) in rel_specs:
        ev = np.asarray(sample.edge_valid[r])
        rows_out[r] = new_idx[src][np.asarray(sample.rows[r])[ev]].astype(np.int64)
        cols_out[r] = new_idx[dst][np.asarray(sample.cols[r])[ev]].astype(np.int64)
        eptr_out[r] = np.asarray(sample.eptr[r])[ev].astype(np.int64)
    return nodes_out, ts_out, rows_out, cols_out, eptr_out


def hgt_sampling(
    node_types: List[NodeType],
    edge_types: List[EdgeType],
    col_ptrs: Dict[RelType, np.ndarray],
    row_indices: Dict[RelType, np.ndarray],
    row_timestamps: Optional[Dict[RelType, np.ndarray]],
    inputs: Dict[NodeType, np.ndarray],
    input_timestamps: Optional[Dict[NodeType, np.ndarray]],
    num_samples: Dict[NodeType, List[int]],
    num_hops: int,
    timerange: Optional[Tuple[int, int]] = None,
    *,
    key: Optional[jax.Array] = None,
    node_counts: Optional[Dict[NodeType, int]] = None,
):
    """Reference-parity API (tch_geometric.pyi:47-61 / src/python.rs:397-482)."""
    edge_types = [tuple(e) for e in edge_types]
    graphs = {}
    counts: Dict[str, int] = dict(node_counts or {})
    for e in edge_types:
        r = rel_key(e)
        cp = np.asarray(col_ptrs[r])
        ri = np.asarray(row_indices[r])
        n_src = counts.get(e[0], int(ri.max(initial=-1)) + 1)
        counts.setdefault(e[0], n_src)
        counts.setdefault(e[2], cp.shape[0] - 1)
        graphs[r] = make_graph(cp, ri, num_src=counts[e[0]],
                               num_dst=cp.shape[0] - 1)
    out = sample_hgt(
        graphs, edge_types,
        {t: np.asarray(v) for t, v in inputs.items()},
        num_samples, num_hops,
        node_counts=counts,
        edge_timestamps=row_timestamps,
        input_timestamps=input_timestamps,
        timerange=timerange, node_types=node_types, key=key)
    return compact_hgt_sample(out)
