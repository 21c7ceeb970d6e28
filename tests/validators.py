"""Sampler-implementation-agnostic invariant validators.

Ports of the reference's property-style test helpers (SURVEY §4):
``validate_neighbor_samples`` (/root/reference/src/algo/neighbor_sampling.rs:370-401)
and ``samples_to_paths`` (rs:403-435).  They validate *semantics* (every
output edge exists in the graph; per-layer in-degree <= fanout; temporal
windows hold along root-to-leaf paths) so they transfer unchanged to the
differently-randomized TPU samplers.
"""
from __future__ import annotations

import numpy as np


def csc_has_edge(col_ptrs: np.ndarray, row_indices: np.ndarray, dst: int, src: int) -> bool:
    """dst <- src membership via binary search over the sorted in-list."""
    lo, hi = col_ptrs[dst], col_ptrs[dst + 1]
    i = np.searchsorted(row_indices[lo:hi], src)
    return bool(i < hi - lo and row_indices[lo + i] == src)


def validate_neighbor_samples(
    col_ptrs: np.ndarray,
    row_indices: np.ndarray,
    samples_src: np.ndarray,
    samples_dst: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    layer_offsets,
    num_neighbors,
) -> None:
    """Every COO edge must exist in the original graph and no dst node may
    exceed its layer fanout (neighbor_sampling.rs:370-401)."""
    for j, i in zip(rows, cols):
        v = samples_src[j]
        w = samples_dst[i]
        assert csc_has_edge(col_ptrs, row_indices, w, v), (
            f"sampled edge {v}->{w} not in graph")

    counts = np.zeros(len(samples_dst), dtype=np.int64)
    for i in cols:
        counts[i] += 1

    begin = 0
    for ell, (_, _, dst_end) in enumerate(layer_offsets):
        max_neighbors = num_neighbors[ell]
        for i in range(begin, dst_end):
            assert 0 <= counts[i] <= max_neighbors, (
                f"node slot {i} in layer {ell} has {counts[i]} > {max_neighbors}")
        begin = dst_end


def samples_to_paths(rows, cols, edge_index, samples, inputs):
    """Reconstruct root-to-leaf sample paths (neighbor_sampling.rs:403-435).

    Tree semantics: every edge (j, i) appends node j; walking edges in
    emission order while matching each edge's dst to the current path head
    rebuilds all paths.  Returns list of (node path, edge-ptr path).
    """
    import collections
    paths = collections.deque((([i], []) for i in inputs))
    head, head_edges = [-1], []
    for edge_idx, (j, i) in enumerate(zip(rows, cols)):
        v = samples[j]
        w = samples[i]
        while not head or w != head[-1]:
            if paths:
                head, head_edges = paths.popleft()
            else:
                break
        paths.append((head + [v], head_edges + [edge_idx]))
    return list(paths)


def samples_to_heteropaths(nodes, rows, cols, edge_types_map):
    """Hetero path reconstruction (budget_sampling.rs:358-399): linked-list
    across typed COOs; returns paths as [(node_type, local_ptr), ...] with
    every path head being a seed."""
    segments = {}
    for node_type, node_list in nodes.items():
        for i in range(len(node_list)):
            segments[(node_type, i)] = {"next": None, "tail": True}
    for rel, (src, _r, dst) in edge_types_map.items():
        for i, j in zip(rows[rel], cols[rel]):
            source = segments[(src, int(i))]
            target = segments[(dst, int(j))]
            target["tail"] = False
            source["next"] = (dst, int(j))
    results = []
    for key_, seg in segments.items():
        if not seg["tail"]:
            continue
        path = []
        cur = key_
        while cur is not None:
            path.insert(0, cur)
            cur = segments[cur]["next"]
        results.append(path)
    return results
