"""Blocked-ELL SpMM: scatter-free CSR aggregation on the MXU.

XLA's ``segment_sum`` lowers to generic scatter-add, which measures ~10x off
HBM roofline on TPU (see bench history).  This formulation removes the
scatter entirely:

* Rows are grouped into aligned blocks of ``W`` rows.  Each block's edge
  list (CSR-contiguous) is cut into chunks of ``C`` edges; a block with more
  edges gets several chunks (heavy/skewed blocks are handled by chunk
  duplication, not padding blow-up).
* Per chunk: gather source rows ``(C, F)``, build the local one-hot matrix
  ``(C, W)`` from each edge's block-local destination row, and contract
  ``onehot^T @ gathered`` on the MXU — turning the scatter-add into dense
  matmul FLOPs the MXU does for free relative to the HBM-bound gather.
* Chunks are ordered by block, so per-block partials combine with a
  log-depth cumsum + boundary-difference (again scatter-free), and the
  result reshapes directly into the output — blocks are row-aligned.

Preprocessing (host, one-time per graph): chunk layout + padded edge/local
row tensors.  Exact semantics for arbitrary degree skew.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class BlockedCsr:
    """Chunked blocked-ELL layout of a CSR graph (device arrays + static)."""

    edge_src: jax.Array        # (T, C) int32 padded source ids
    edge_local_row: jax.Array  # (T, C) int32 dest row within block [0, W)
    edge_valid: jax.Array      # (T, C) bool
    chunk_block: jax.Array     # (T,) int32 row-block id, nondecreasing
    block_start: jax.Array     # (B+1,) int32 first chunk of each block
    degree: jax.Array          # (N,) int32 row degrees (for mean)
    edge_ptr: jax.Array = None  # (T, C) int32 CSR edge index of each lane
    num_rows: int = struct.field(pytree_node=False, default=0)
    rows_per_block: int = struct.field(pytree_node=False, default=128)
    chunk_edges: int = struct.field(pytree_node=False, default=2048)

    @property
    def num_blocks(self) -> int:
        return self.block_start.shape[0] - 1

    @property
    def num_chunks(self) -> int:
        return self.edge_src.shape[0]


def build_blocked(indptr, indices, *, rows_per_block: int = 128,
                  chunk_edges: Optional[int] = None,
                  sort_chunk_sources: bool = True) -> BlockedCsr:
    """Host-side one-time layout build (numpy).

    ``chunk_edges=None`` picks the chunk size that MINIMIZES total padded
    edges ``sum(ceil(blk_edges/C)) * C`` over a grid of 128-multiples —
    the gather (82% of kernel time, BASELINE.md) costs exactly one row
    fetch per padded edge lane, so padding ratio is the throughput lever;
    the measured ms/iter tracks it linearly.  ``sort_chunk_sources``
    orders each chunk's edges by source id — a free exactness-preserving
    permutation (the one-hot row follows the edge) that improves gather
    locality on graphs with hubs/community structure.
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    N = indptr.shape[0] - 1
    W = rows_per_block
    B = -(-N // W)
    if chunk_edges is None:
        blk_e = np.diff(indptr[np.minimum(np.arange(B + 1) * W, N)])
        mean_blk = float(blk_e.mean()) if B else 256.0
        # candidates: 128-multiples from ~0.5x mean to the max block size
        # (tiny chunks lose to per-chunk grid/DMA overhead: floor at 256)
        lo = max(256, int(mean_blk * 0.5) // 128 * 128)
        hi = max(lo + 128, int(blk_e.max()) // 128 * 128 + 128) if B else lo + 128
        cands = np.unique(np.linspace(lo, hi, 64, dtype=np.int64) // 128 * 128)
        # total padded edges for each candidate C, one O(B) pass per C
        totals = [(int(np.sum(-(-blk_e // C1))) * int(C1), int(C1))
                  for C1 in cands]
        chunk_edges = min(totals)[1]
    C = chunk_edges

    # per-edge destination row
    deg = np.diff(indptr)
    dst = np.repeat(np.arange(N, dtype=np.int64), deg)
    E = indices.shape[0]

    blk_first_edge = indptr[np.minimum(np.arange(B + 1) * W, N)]
    blk_edges = np.diff(blk_first_edge)
    chunks_per_blk = np.maximum(-(-blk_edges // C), 1)
    T = int(chunks_per_blk.sum())

    chunk_block = np.repeat(np.arange(B, dtype=np.int32), chunks_per_blk)
    block_start = np.concatenate([[0], np.cumsum(chunks_per_blk)]).astype(np.int32)
    # chunk edge offsets within its block
    chunk_rank = np.arange(T, dtype=np.int64) - block_start[chunk_block]
    chunk_edge0 = blk_first_edge[chunk_block] + chunk_rank * C

    # gather per-chunk edge windows (T, C), masked past block end
    offs = chunk_edge0[:, None] + np.arange(C)[None, :]
    blk_edge_end = blk_first_edge[chunk_block + 1]
    valid = offs < blk_edge_end[:, None]
    offs_c = np.minimum(offs, E - 1) if E > 0 else np.zeros_like(offs)
    edge_src = np.where(valid, indices[offs_c], 0).astype(np.int32)
    if sort_chunk_sources and E > 0:
        # stable per-chunk sort by (valid last, src): permutes edge slots
        # only within a chunk — local_row permutes identically, exactness
        # preserved; hub sources land adjacent for better gather locality.
        order = np.lexsort((edge_src, ~valid), axis=-1)
        take = np.take_along_axis
        edge_src = take(edge_src, order, axis=1)
        offs_c = take(offs_c, order, axis=1)
        valid = take(valid, order, axis=1)
    # invalid lanes get local_row == W: the one-hot iota-compare never
    # matches, so no separate mask is needed in the hot path (keeps the
    # compare fusible into the MXU contraction).
    local_row = np.where(valid, dst[offs_c] - chunk_block[:, None].astype(np.int64) * W,
                         W).astype(np.int32)

    return BlockedCsr(
        edge_src=jnp.asarray(edge_src),
        edge_local_row=jnp.asarray(local_row),
        edge_valid=jnp.asarray(valid),
        chunk_block=jnp.asarray(chunk_block),
        block_start=jnp.asarray(block_start),
        degree=jnp.asarray(deg.astype(np.int32)),
        edge_ptr=jnp.asarray(np.where(valid, offs_c, -1).astype(np.int32)),
        num_rows=int(N),
        rows_per_block=W,
        chunk_edges=C,
    )


def edge_attr_to_blocked(b: BlockedCsr, attr: jax.Array) -> jax.Array:
    """Map CSR-edge-ordered per-edge attributes into the (T, C) blocked
    layout (invalid lanes -> 0).  Inverse of ``b.edge_ptr``."""
    E = attr.shape[0]
    vals = attr[jnp.clip(b.edge_ptr, 0, max(E - 1, 0))]
    return jnp.where(b.edge_valid, vals, jnp.zeros((), attr.dtype))


def spmm_blocked(b: BlockedCsr, x: jax.Array, *, agg: str = "sum",
                 edge_weight: Optional[jax.Array] = None,
                 compute_dtype=jnp.bfloat16) -> jax.Array:
    """Scatter-free SpMM.  x: (N, F) -> (num_rows, F) float32."""
    W = b.rows_per_block
    T, C = b.edge_src.shape
    F = x.shape[-1]

    g = x.astype(compute_dtype)[b.edge_src]                  # (T, C, F) gather
    # invalid lanes carry local_row == W -> compare never matches (no mask).
    oh = (b.edge_local_row[..., None]
          == jnp.arange(W, dtype=jnp.int32)[None, None, :])  # (T, C, W)
    if edge_weight is not None:
        w = jnp.where(b.edge_valid, edge_weight, 0.0)
        ohw = oh.astype(compute_dtype) * w[..., None].astype(compute_dtype)
    else:
        ohw = oh.astype(compute_dtype)
    # MXU contraction replaces the scatter: (W, C) @ (C, F) per chunk.
    partial = jax.lax.dot_general(
        ohw, g,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (T, W, F)

    # Combine each block's chunks: log-depth cumsum + boundary differences
    # (chunks are block-ordered; mostly 1 chunk/block so this is ~identity).
    csum = jnp.cumsum(partial, axis=0)                        # (T, W, F)
    zero = jnp.zeros((1, W, F), csum.dtype)
    cpad = jnp.concatenate([zero, csum], axis=0)              # (T+1, W, F)
    blocks = cpad[b.block_start[1:]] - cpad[b.block_start[:-1]]  # (B, W, F)

    out = blocks.reshape(-1, F)[: b.num_rows]
    if agg == "mean":
        out = out / jnp.maximum(b.degree, 1)[:, None].astype(out.dtype)
    elif agg != "sum":
        raise ValueError(f"unsupported agg {agg!r}")
    return out
