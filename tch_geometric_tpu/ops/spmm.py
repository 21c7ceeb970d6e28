"""SpMM / SDDMM — the message-passing compute core.

``spmm``: y[i] = reduce_{e in row i} w[e] * x[indices[e]] over a CSR
structure — the aggregation the reference delegates to PyG's ``SAGEConv``
(examples/neighbor_sampling.py:21-24).  ``sddmm``: per-edge dot products
(attention logits).

Two paths:
* ``spmm_xla``: gather + sorted segment-sum.  XLA lowers this to a dynamic
  gather + scatter-add pair; it is the correctness baseline and is already
  memory-bound on TPU for F >= 128.
* ``spmm_blocked_pallas`` (ops/spmm_pallas.py): scatter-free blocked-ELL
  kernel — one-hot local-row contraction on the MXU with in-VMEM per-block
  accumulation — for the roofline benchmark path.  Attention variants
  (SDDMM, online edge softmax, weighted SpMM) in ops/attention_blocked.py.

The sampled-batch path does NOT go through SpMM at all: padded tree samples
aggregate by reshape + masked mean (see models/sage.py), which is pure dense
VPU/MXU work — the payoff of the padded layout (SURVEY §7.1(2)).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..data.graph import SparseGraph
from .segment import csr_row_ids, segment_mean, segment_sum


def spmm(graph: SparseGraph, x: jax.Array, *, agg: str = "sum",
         edge_weight: Optional[jax.Array] = None) -> jax.Array:
    """CSR SpMM: aggregate source features into destination rows.

    ``graph`` rows are destinations, ``indices`` the gathered sources —
    matching CSC in-neighbor aggregation when built with
    ``csc_graph_from_coo``.
    """
    E = graph.num_edges
    n = graph.num_ptr_nodes
    rows = csr_row_ids(graph.indptr, E)
    gathered = x[graph.indices]                       # (E, F) gather
    if edge_weight is not None:
        gathered = gathered * edge_weight[:, None].astype(gathered.dtype)
    if agg == "sum":
        return segment_sum(gathered, rows, n, indices_are_sorted=True)
    if agg == "mean":
        return segment_mean(gathered, rows, n, indices_are_sorted=True)
    if agg == "max":
        out = jax.ops.segment_max(gathered, rows, n, indices_are_sorted=True)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    raise ValueError(f"unknown agg {agg!r}")


def sddmm(graph: SparseGraph, x_dst: jax.Array, x_src: jax.Array) -> jax.Array:
    """Per-edge dot products: s[e] = <x_dst[row(e)], x_src[indices[e]]>.

    Returns (E,) or (E, H) when inputs carry a trailing head dim."""
    E = graph.num_edges
    rows = csr_row_ids(graph.indptr, E)
    d = x_dst[rows]
    s = x_src[graph.indices]
    return (d * s).sum(axis=-1)
