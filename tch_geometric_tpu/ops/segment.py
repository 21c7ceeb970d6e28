"""Segment reduction primitives over CSR/COO edge structures.

The downstream message-passing path the reference delegates to PyG
(examples/neighbor_sampling.py:21-24 -> SAGEConv) is built on these.  All are
thin, fusion-friendly XLA formulations; the Pallas SpMM in ``ops/spmm.py``
replaces the hot full-graph path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def csr_row_ids(indptr: jax.Array, num_edges: int) -> jax.Array:
    """Per-edge destination row id from a pointer array (static E)."""
    n = indptr.shape[0] - 1
    counts = indptr[1:] - indptr[:-1]
    return jnp.repeat(jnp.arange(n, dtype=jnp.int32), counts,
                      total_repeat_length=num_edges)


def segment_sum(data, segment_ids, num_segments, indices_are_sorted=False):
    return jax.ops.segment_sum(data, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data, segment_ids, num_segments, indices_are_sorted=False):
    s = jax.ops.segment_sum(data, segment_ids, num_segments,
                            indices_are_sorted=indices_are_sorted)
    cnt = jax.ops.segment_sum(jnp.ones(data.shape[:1], data.dtype),
                              segment_ids, num_segments,
                              indices_are_sorted=indices_are_sorted)
    return s / jnp.maximum(cnt, 1)[(...,) + (None,) * (data.ndim - 1)]


def segment_max(data, segment_ids, num_segments, indices_are_sorted=False):
    return jax.ops.segment_max(data, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_softmax(scores, segment_ids, num_segments, mask=None):
    """Per-segment softmax (for relation-typed attention).

    ``scores``: (E, H); masked-out edges get weight 0."""
    if mask is not None:
        scores = jnp.where(mask[:, None] if scores.ndim == 2 else mask,
                           scores, -jnp.inf)
    smax = jax.ops.segment_max(scores, segment_ids, num_segments)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    ex = jnp.exp(scores - smax[segment_ids])
    if mask is not None:
        ex = jnp.where(mask[:, None] if scores.ndim == 2 else mask, ex, 0.0)
    den = jax.ops.segment_sum(ex, segment_ids, num_segments)
    return ex / jnp.maximum(den[segment_ids], 1e-16)


def csc_sort_edges(col_ptrs, perm, row_weights, descending: bool = False):
    """Per-column stable re-sort of the edge perm by weights.

    Parity with /root/reference/src/data/transform.rs:7-34 (the reference's
    only rayon-parallel code): within each CSC column, reorder ``perm`` by
    ``row_weights``.  Vectorised: one segmented argsort via a composite key
    (column-major rank + weight order), no per-column loop.
    """
    import numpy as np
    perm = np.asarray(perm)
    w = np.asarray(row_weights)
    E = perm.shape[0]
    # clamp: the reference's own fixtures carry ptr tails past E
    col_ptrs = np.minimum(np.asarray(col_ptrs), E)
    col_of = np.repeat(np.arange(col_ptrs.shape[0] - 1), np.diff(col_ptrs))
    order = np.lexsort((-w if descending else w, col_of))
    return perm[order]


def csc_edge_cumsum(col_ptrs, row_data):
    """Per-column inclusive cumsum of edge data
    (transform.rs:36-60).  Vectorised: global cumsum minus per-column base."""
    import numpy as np
    x = np.asarray(row_data)
    col_ptrs = np.minimum(np.asarray(col_ptrs), x.shape[0])
    csum = np.cumsum(x)
    base = np.concatenate([[0], csum])[col_ptrs[:-1]]
    col_of = np.repeat(np.arange(col_ptrs.shape[0] - 1), np.diff(col_ptrs))
    return (csum - base[col_of]).astype(x.dtype)
