"""Device-resident sparse graph containers.

TPU-native re-design of the reference's zero-copy CSR/CSC views
(/root/reference/src/data/graph.rs:7-101).  Where the reference borrows raw
slices of torch tensor memory and walks them with per-node pointer loops, here
the adjacency lives in device arrays inside a JAX pytree and every lookup
(neighbor window, degree, edge membership) is a batched gather / fixed-trip
binary search that vectorises over whole frontiers.

Semantics preserved from the reference:
  - CSC ``neighbors_range``/``neighbors_slice`` (graph.rs:65-74) become
    ``(indptr[v], indptr[v+1])`` window arithmetic.
  - ``has_edge``/``find_edge`` binary search over the *sorted* per-row
    neighbor list (graph.rs:76-89) becomes :func:`CsrGraph.has_edge` /
    :func:`CsrGraph.find_edge` — a branchless log2(max_degree)-step search
    that vmaps over batches of queries.
  - in/out degree (graph.rs:91-101) become :meth:`degree`.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _bisect_iters(max_degree: int) -> int:
    """Static iteration count for binary search over rows of <= max_degree."""
    return max(1, math.ceil(math.log2(max(int(max_degree), 1) + 1)))


@struct.dataclass
class SparseGraph:
    """CSR- or CSC-shaped adjacency. Orientation is by convention:

    * As **CSR** (``CsrGraph``): ``indptr`` over source rows, ``indices`` are
      destination columns — out-neighbors.
    * As **CSC** (``CscGraph``): ``indptr`` over destination columns,
      ``indices`` are source rows — in-neighbors.

    ``perm`` maps the sorted edge position back to the original COO edge id,
    mirroring the reference's conversion output (storage.rs:103-127) which PyG
    ``filter_data`` uses to gather original edge attributes.
    """

    indptr: jax.Array          # (N+1,) int32/int64
    indices: jax.Array         # (E,) node ids, sorted within each row
    perm: Optional[jax.Array] = None  # (E,) sorted-edge -> original-edge id
    # Static metadata (not traced; changing it retriggers compilation).
    num_src: int = struct.field(pytree_node=False, default=0)
    num_dst: int = struct.field(pytree_node=False, default=0)
    max_degree: int = struct.field(pytree_node=False, default=0)

    # -- basic queries ----------------------------------------------------
    @property
    def num_ptr_nodes(self) -> int:
        return self.indptr.shape[0] - 1

    @property
    def num_edges(self) -> int:
        return self.indices.shape[0]

    def degree(self, nodes: jax.Array) -> jax.Array:
        """Batched row degree (graph.rs:91-101)."""
        nodes = jnp.asarray(nodes)
        return self.indptr[nodes + 1] - self.indptr[nodes]

    def neighbors_range(self, nodes: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Batched (start, end) edge-pointer windows (graph.rs:65-70)."""
        nodes = jnp.asarray(nodes)
        return self.indptr[nodes], self.indptr[nodes + 1]

    def gather_neighbors(self, edge_ptrs: jax.Array) -> jax.Array:
        """Edge pointer -> neighbor node id (graph.rs:72-78 get_by_ptr)."""
        return self.indices[jnp.clip(edge_ptrs, 0, self.num_edges - 1)]

    def gather_neighbor_windows(
        self, starts: jax.Array, width: int
    ) -> Tuple[jax.Array, jax.Array]:
        """Contiguous neighbor windows as one sliced gather.

        Returns ``(win (B, width), delta (B,))`` with
        ``win[i, delta[i] + j] == indices[starts[i] + j]``.  Starts near the
        array end are shifted left (never out of bounds) and the shift is
        returned as ``delta`` (``delta + deg <= width`` always holds since
        ``starts + deg <= E``).  Requires ``num_edges >= width``.

        NEGATIVE RESULT (measured, v5e): vmapped ``dynamic_slice`` lowers to
        ~1.2 us PER SLICE (94 ms for 76800x64) — 12x slower than even the
        per-edge scalar gather it was meant to replace.  Use the aligned
        row-gather tables (``make_gather_table`` / sampling fast paths)
        instead; kept for CPU-side use and as documentation.
        """
        E = self.num_edges
        starts = starts.astype(jnp.int32)
        s2 = jnp.clip(starts, 0, max(E - width, 0))
        delta = starts - s2
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(self.indices, (s,), (width,))
        )(s2)
        return win, delta

    # -- edge membership --------------------------------------------------
    def find_edge(self, u: jax.Array, v: jax.Array) -> jax.Array:
        """Batched ``find_edge`` (graph.rs:85-89): global edge ptr of (u, v)
        or -1.  u indexes the pointer axis; v is searched in u's sorted row.

        Branchless binary search with a static trip count so it jits to a
        fixed unrolled/fori program — no data-dependent control flow.
        """
        u = jnp.asarray(u)
        v = jnp.asarray(v)
        lo, hi = self.indptr[u], self.indptr[u + 1]
        n_iter = _bisect_iters(self.max_degree)

        def body(_, carry):
            lo, hi = carry
            mid = (lo + hi) // 2
            mid_val = self.indices[jnp.clip(mid, 0, self.num_edges - 1)]
            go_right = jnp.logical_and(lo < hi, mid_val < v)
            new_lo = jnp.where(go_right, mid + 1, lo)
            new_hi = jnp.where(jnp.logical_or(go_right, lo >= hi), hi, mid)
            return new_lo, new_hi

        lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
        found_val = self.indices[jnp.clip(lo, 0, self.num_edges - 1)]
        hit = jnp.logical_and(lo < self.indptr[u + 1], found_val == v)
        return jnp.where(hit, lo, -1)

    def has_edge(self, u: jax.Array, v: jax.Array) -> jax.Array:
        """Batched ``has_edge`` (graph.rs:80-83)."""
        return self.find_edge(u, v) >= 0


# Orientation is purely by convention; both are the same pytree so jitted
# functions accept either without retracing on class identity.
CsrGraph = SparseGraph
CscGraph = SparseGraph


def make_graph(
    indptr,
    indices,
    perm=None,
    *,
    num_src: int,
    num_dst: int,
) -> SparseGraph:
    """Build a graph container, computing static max_degree on host."""
    indptr_np = np.asarray(indptr)
    max_deg = int(np.max(np.diff(indptr_np))) if indptr_np.shape[0] > 1 else 0
    return SparseGraph(
        indptr=jnp.asarray(indptr),
        indices=jnp.asarray(indices),
        perm=None if perm is None else jnp.asarray(perm),
        num_src=int(num_src),
        num_dst=int(num_dst),
        max_degree=max_deg,
    )
