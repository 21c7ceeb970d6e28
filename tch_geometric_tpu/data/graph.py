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


# Aligned-window gather table: `indices` reshaped to 64-lane rows.  A
# neighbor window starting anywhere and spanning <= max_degree elements is
# covered by `window_row_count` consecutive rows (start%64 <= 63 lanes of
# lead-in plus the window itself).
WINDOW_LANES = 64
# Only build/use the row table when a window fits in this many rows: the
# per-node fetch is R*256 B, so large-max-degree graphs (hubs) fall back to
# per-edge scalar gathers instead of dragging huge windows per node.
MAX_WINDOW_ROWS = 8


def window_row_count(max_degree: int) -> int:
    """Rows of WINDOW_LANES covering any window of <= max_degree lanes."""
    return -(-(WINDOW_LANES - 1 + max(int(max_degree), 1)) // WINDOW_LANES)


# ELL neighbor-row layout: one aligned row per node packing everything the
# uniform sampler needs, so a whole hop costs exactly ONE gather access per
# frontier node (measured: minibatch-scale gathers are issue-rate-bound at
# ~17-30 ns per access regardless of 4 B vs 256 B — scripts/micro_rowgather).
# Row layout (width W, int32): lanes [0, W-2) neighbor ids (padded), lane
# W-2 = row degree, lane W-1 = CSR/CSC window start (the global edge ptr of
# lane 0), so sampled-edge eptrs come from arithmetic, not an indptr gather.
ELL_WIDTHS = (64, 128)          # 256 B / 512 B rows


def ell_width_for(max_degree: int) -> Optional[int]:
    for w in ELL_WIDTHS:
        if max_degree <= w - 2:
            return w
    return None


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
    # Optional aligned-window gather table: indices padded to a multiple of
    # WINDOW_LANES and reshaped (rows, WINDOW_LANES).  Costs one extra copy
    # of `indices` in HBM; lets the samplers fetch whole neighbor windows as
    # 256 B row gathers instead of per-edge scalar gathers.
    indices_win: Optional[jax.Array] = None
    # Optional ELL neighbor rows (N, W) int32 — see ELL_WIDTHS above.  One
    # gather per frontier node replaces indptr pair + per-edge id gathers in
    # the uniform sampling hot path.  Memory: N*W*4 bytes.
    ell: Optional[jax.Array] = None
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

    def gather_neighbor_windows_rows(
        self, starts: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Whole neighbor windows via the aligned row table.

        Returns ``(win (B, R*64), off (B,))`` with
        ``win[i, off[i] + j] == indices[starts[i] + j]`` for every
        ``j < deg(i)`` (lanes outside that range are arbitrary).  ``R`` is
        the static :func:`window_row_count` of ``max_degree``.  One (B, R)
        row gather of 256 B rows replaces per-edge scalar gathers — the
        winning layout per scripts/micro_window_select.py (the vmapped
        ``dynamic_slice`` variant below was 12x WORSE; see its docstring).
        """
        assert self.indices_win is not None
        R = window_row_count(self.max_degree)
        starts = starts.astype(jnp.int32)
        r0 = starts // WINDOW_LANES
        rows = r0[:, None] + jnp.arange(R, dtype=jnp.int32)[None, :]
        # Trailing rows may run past the table for windows near the end of
        # `indices`; clipping only affects lanes >= off + deg (never valid).
        rows = jnp.clip(rows, 0, self.indices_win.shape[0] - 1)
        win = self.indices_win[rows].reshape(starts.shape[0], R * WINDOW_LANES)
        return win, starts % WINDOW_LANES

    def ell_rows(self, nodes: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One-access-per-node neighbor fetch via the ELL table.

        Returns ``(neigh (B, W-2), deg (B,), start (B,))``: the padded
        neighbor lanes, row degree, and the global edge ptr of lane 0.
        """
        assert self.ell is not None
        row = self.ell[jnp.clip(nodes, 0, self.ell.shape[0] - 1)]
        return row[..., :-2], row[..., -2], row[..., -1]

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
    window_table: Optional[bool] = None,
    ell_table: Optional[bool] = None,
) -> SparseGraph:
    """Build a graph container, computing static max_degree on host.

    ``ell_table=None`` builds the one-access-per-node ELL rows automatically
    when ``max_degree`` fits an ELL width; ``window_table=None`` builds the
    aligned-window gather table when ELL doesn't apply but windows fit in
    ``MAX_WINDOW_ROWS`` rows.  True/False forces either.
    """
    indptr_np = np.asarray(indptr)
    indices_np = np.asarray(indices)
    E = indices_np.shape[0]
    max_deg = int(np.max(np.diff(indptr_np))) if indptr_np.shape[0] > 1 else 0

    # ELL rows: preferred fast path (1 access per node per hop).
    ell = None
    W = ell_width_for(max_deg)
    if ell_table is None:
        ell_table = E > 0 and W is not None
    if ell_table and E > 0 and W is not None:
        N = indptr_np.shape[0] - 1
        starts = indptr_np[:-1].astype(np.int64)
        deg = np.diff(indptr_np).astype(np.int64)
        rows = np.empty((N, W), dtype=np.int32)
        lane = np.arange(W - 2, dtype=np.int64)[None, :]
        CH = 1 << 19                       # chunk rows: bounds host temporaries
        for lo in range(0, N, CH):
            hi = min(lo + CH, N)
            offs = starts[lo:hi, None] + lane
            rows[lo:hi, : W - 2] = indices_np[np.minimum(offs, max(E - 1, 0))]
        rows[:, W - 2] = deg
        rows[:, W - 1] = starts
        ell = jnp.asarray(rows)

    # Aligned-window table: fallback fast path for larger max_degree.
    indices_win = None
    if window_table is None:
        window_table = (ell is None and E > 0
                        and window_row_count(max_deg) <= MAX_WINDOW_ROWS)
    if window_table and E > 0:
        pad = -E % WINDOW_LANES
        flat = np.pad(indices_np.astype(np.int32), (0, pad))
        indices_win = jnp.asarray(flat.reshape(-1, WINDOW_LANES))

    return SparseGraph(
        indptr=jnp.asarray(indptr),
        indices=jnp.asarray(indices),
        perm=None if perm is None else jnp.asarray(perm),
        indices_win=indices_win,
        ell=ell,
        num_src=int(num_src),
        num_dst=int(num_dst),
        max_degree=max_deg,
    )
