"""Neighbor-aware negative sampling.

TPU-native re-design of /root/reference/src/algo/negative_sampling.rs.
The reference runs, per input node, ``num_neg`` sequential rejection loops of
up to ``try_count`` uniform candidates, probing edge existence by binary
search (rs:31-45, rs:99-128).

Here ALL candidates are drawn at once — a ``(B, num_neg, try_count)``
``randint`` tensor — edge existence is one batched binary-search
(``has_edge``) over the whole tensor, and the per-(input, neg) winner is the
first accepting trial via masked argmax (SURVEY §7.1(5)).  The hashmap-based
dedup of accepted negatives into the sample list (rs:36-40) is host-side
compaction: first-occurrence-ordered unique, seeded with the input list
exactly like ``samples_mapping`` (rs:26).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import CsrGraph, make_graph
from ..utils.types import EdgeType, NodeType, RelType, rel_key
from . import rng


@functools.partial(jax.jit, static_argnames=("num_neg", "try_count"))
def _negative_candidates(key, graph: CsrGraph, inputs, node_count: int,
                         num_neg: int, try_count: int, inbound: bool = False):
    """Returns (w (B, num_neg), accepted (B, num_neg)) — the first candidate
    per (input, neg) slot that is a non-edge and not a self-loop."""
    B = inputs.shape[0]
    v = inputs.astype(jnp.int32)
    cand = jax.random.randint(key, (B, num_neg, try_count), 0, node_count,
                              dtype=jnp.int32)
    vv = v[:, None, None]
    probe_u = jnp.where(inbound, cand, jnp.broadcast_to(vv, cand.shape))
    probe_w = jnp.where(inbound, jnp.broadcast_to(vv, cand.shape), cand)
    exists = graph.has_edge(probe_u, probe_w)
    ok = jnp.logical_and(jnp.logical_not(exists), cand != vv)
    first = jnp.argmax(ok, axis=-1)                      # first accepting trial
    accepted = jnp.any(ok, axis=-1)
    w = jnp.take_along_axis(cand, first[..., None], axis=-1)[..., 0]
    return w, accepted


def negative_sample_neighbors_homogenous(
    row_ptrs,
    col_indices,
    graph_size: Tuple[int, int],
    inputs,
    num_neg: int,
    try_count: int,
    *,
    key: Optional[jax.Array] = None,
):
    """Reference-parity API (tch_geometric.pyi:122-129 / rs:6-48).

    Returns (samples, rows, cols/edge cols... ) exactly as the reference:
    ``(samples, rows, cols, sample_count)`` where rows[i] indexes the input
    list, cols[j] indexes ``samples`` (inputs first, then negatives in
    discovery order), and ``sample_count = len(inputs)``."""
    if key is None:
        key = rng.next_key()
    row_ptrs = np.asarray(row_ptrs)
    col_indices = np.asarray(col_indices)
    inputs = np.asarray(inputs)
    graph = make_graph(row_ptrs, col_indices,
                       num_src=row_ptrs.shape[0] - 1,
                       num_dst=int(graph_size[1]))
    w, accepted = _negative_candidates(
        key, graph, jnp.asarray(inputs), int(graph_size[1]),
        int(num_neg), int(try_count))
    w = np.asarray(w)
    accepted = np.asarray(accepted)

    samples = list(inputs.astype(np.int64))
    mapping = {int(s): i for i, s in enumerate(inputs)}
    sample_count = len(samples)
    rows, cols = [], []
    for i in range(inputs.shape[0]):
        for n in range(num_neg):
            if not accepted[i, n]:
                continue
            ww = int(w[i, n])
            j = mapping.get(ww)
            if j is None:
                j = len(samples)
                mapping[ww] = j
                samples.append(ww)
            rows.append(i)
            cols.append(j)
    return (np.asarray(samples, dtype=np.int64),
            np.asarray(rows, dtype=np.int64),
            np.asarray(cols, dtype=np.int64),
            sample_count)


def negative_sample_neighbors_heterogenous(
    node_types: List[NodeType],
    edge_types: List[EdgeType],
    row_ptrs: Dict[RelType, np.ndarray],
    col_indices: Dict[RelType, np.ndarray],
    sizes: Dict[RelType, Tuple[int, int]],
    inputs: Dict[NodeType, np.ndarray],
    num_neg: int,
    try_count: int,
    inbound: bool = False,
    *,
    key: Optional[jax.Array] = None,
):
    """Reference-parity API (tch_geometric.pyi:133-145 / rs:50-131).

    Per input node: a uniformly random outgoing relation of its type
    (rs:104), then rejection sampling in that relation's dst space; the
    ``inbound`` flag flips the edge-existence probe direction (rs:112-115).
    Returns (samples, rows, cols, sample_count) dicts."""
    if key is None:
        key = rng.next_key()
    edge_types = [tuple(e) for e in edge_types]
    # node type -> ordered list of (rel_key, dst_type), matching rs:64-71.
    node_rels: Dict[str, List[Tuple[str, str]]] = {}
    for (src, rel, dst) in edge_types:
        node_rels.setdefault(src, []).append((rel_key((src, rel, dst)), dst))

    graphs = {}
    for e in edge_types:
        r = rel_key(e)
        rp = np.asarray(row_ptrs[r])
        ci = np.asarray(col_indices[r])
        graphs[r] = make_graph(rp, ci, num_src=rp.shape[0] - 1,
                               num_dst=int(sizes[r][1]))

    samples = {t: list(np.asarray(inputs[t]).astype(np.int64))
               if t in inputs else [] for t in node_types}
    mapping = {t: {int(s): i for i, s in enumerate(samples[t])}
               for t in node_types}
    sample_count = {t: len(samples[t]) for t in node_types}
    rows_out = {rel_key(e): [] for e in edge_types}
    cols_out = {rel_key(e): [] for e in edge_types}

    for ti, (t, t_inputs) in enumerate(sorted(inputs.items())):
        rels = node_rels.get(t, [])
        if not rels:
            continue
        t_inputs = np.asarray(t_inputs)
        B = t_inputs.shape[0]
        tkey = rng.fold(key, ti)
        # uniform relation choice per (input, neg) (rs:104)
        rel_choice = np.asarray(jax.random.randint(
            rng.fold(tkey, 0), (B, num_neg), 0, len(rels)))
        # per relation: batched candidates + first-accept
        per_rel = []
        for ri, (r, dst_t) in enumerate(rels):
            w, acc = _negative_candidates(
                rng.fold(tkey, 1 + ri), graphs[r], jnp.asarray(t_inputs),
                int(sizes[r][1]), int(num_neg), int(try_count),
                inbound=bool(inbound))
            per_rel.append((np.asarray(w), np.asarray(acc)))
        for i in range(B):
            for n in range(num_neg):
                ri = int(rel_choice[i, n])
                r, dst_t = rels[ri]
                w, acc = per_rel[ri]
                if not acc[i, n]:
                    continue
                ww = int(w[i, n])
                j = mapping[dst_t].get(ww)
                if j is None:
                    j = len(samples[dst_t])
                    mapping[dst_t][ww] = j
                    samples[dst_t].append(ww)
                rows_out[r].append(i)
                cols_out[r].append(j)

    return ({t: np.asarray(v, dtype=np.int64) for t, v in samples.items()},
            {r: np.asarray(v, dtype=np.int64) for r, v in rows_out.items()},
            {r: np.asarray(v, dtype=np.int64) for r, v in cols_out.items()},
            sample_count)
