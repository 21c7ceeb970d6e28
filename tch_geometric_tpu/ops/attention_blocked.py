"""Blocked edge attention: Pallas SDDMM + online edge-softmax + weighted SpMM.

The scatter-free blocked-ELL layout (ops/spmm_blocked.py) extends to the
full attention pattern the reference's downstream consumers (PyG GAT-style
convs) need on sampled or full graphs:

* :func:`sddmm_blocked_pallas` — per-edge dot scores
  ``s[e] = <x_dst[dst(e)], x_src[src(e)]>`` computed per chunk on the MXU:
  the dst block is a natural VMEM tile (``cb[t]`` index map), the per-edge
  dst rows are selected by a one-hot contraction, and the dot against the
  gathered source rows is a VPU reduction.  No (E, F) dst gather ever
  touches HBM (the XLA ``sddmm`` in ops/spmm.py gathers both sides).
* :func:`edge_softmax_blocked` — numerically-stable per-dst-row softmax over
  edge scores in TWO chunk-ordered passes with **online** (running max,
  rescaled sum) accumulation per row block — the flash-attention recurrence
  applied to graph neighborhoods: chunks of the same row block revisit the
  same VMEM (m, z) tile, so no per-edge segment scatter exists at all.
* :func:`spmm_blocked_weighted_pallas` — the spmm_pallas kernel with the
  per-edge weight folded into the one-hot operand (same trick as the q8
  kernel), so attention-weighted aggregation is still one MXU contraction.

Together: ``attend_blocked`` = softmax(SDDMM)-weighted SpMM, the blocked
TPU equivalent of PyG's gather->segment_softmax->scatter attention path.

All kernels run under ``interpret=True`` on CPU for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_blocked import BlockedCsr

NEG_INF = float("-inf")  # python literal: kernels must not capture array constants


def _pad_dst(b: BlockedCsr, x_dst: jax.Array) -> jax.Array:
    """Pad dst features to the block grid (B*W rows)."""
    full = b.num_blocks * b.rows_per_block
    pad = full - x_dst.shape[0]
    if pad:
        x_dst = jnp.pad(x_dst, ((0, pad), (0, 0)))
    return x_dst


# ---------------------------------------------------------------------------
# SDDMM
# ---------------------------------------------------------------------------

def _sddmm_kernel(chunk_block_ref, lr_sub_ref, g_ref, xd_ref, out_ref):
    # NT matmul: scores against EVERY local row at once — P[c, w] =
    # <g[c], xd[w]> contracts over the feature lanes, the layout the MXU
    # handles natively (a sublane-contraction dot_general lowers to a
    # VMEM transpose per chunk: measured 3x slower; and Mosaic cannot
    # move the lane-major lr vector onto sublanes, so the one-hot select
    # uses a build-side (C, 1) sublane copy of the local rows instead).
    P = jax.lax.dot_general(
        g_ref[0], xd_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (C, W)
    lr = lr_sub_ref[0]                                  # (C, 1) sublanes
    C, W = P.shape
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    s = jnp.where(iota_w == lr, P, 0.0).sum(axis=1, keepdims=True)  # (C, 1)
    out_ref[0] = s


def sddmm_blocked_pallas(b: BlockedCsr, x_dst: jax.Array, x_src: jax.Array,
                         *, compute_dtype=jnp.bfloat16,
                         gathered: jax.Array | None = None,
                         interpret: bool = False) -> jax.Array:
    """Per-edge dot scores in blocked edge layout.

    Returns ``(T, C)`` float32; lanes with ``~b.edge_valid`` hold 0 (their
    one-hot row is empty).  Same semantics as ``ops.spmm.sddmm`` modulo the
    edge ordering, which is the blocked layout's chunk order.
    ``gathered``: optional pre-gathered ``x_src[b.edge_src]`` (T, C, F) —
    pass it when a downstream kernel reads the same gather (attend_blocked)
    so the 12 ms random gather is paid once, not per kernel.
    """
    W = b.rows_per_block
    T, C = b.edge_src.shape
    F = x_src.shape[-1]
    assert C % 128 == 0, "chunk_edges must be a multiple of 128"

    g = (gathered if gathered is not None
         else x_src.astype(compute_dtype)[b.edge_src])   # (T, C, F) gather
    xd = _pad_dst(b, x_dst.astype(compute_dtype))
    # sublane-major local rows: invalid lanes carry W (no one-hot match)
    lr_sub = b.edge_local_row.reshape(T, C, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, F), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((W, F), lambda t, cb: (cb[t], 0)),
        ],
        # (1, C, 1) blocks: the kernel's score lives on SUBLANES (it is
        # reduced along the feature lanes); the trailing singleton makes
        # the block legal ((C, 1): C % 8 == 0, 1 == array dim) and the
        # lane-major (T, C) view is one free XLA reshape outside.
        out_specs=pl.BlockSpec((1, C, 1), lambda t, cb: (t, 0, 0)),
    )
    out = pl.pallas_call(
        _sddmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, C, 1), jnp.float32),
        interpret=interpret,
    )(b.chunk_block, lr_sub, g, xd)
    return out.reshape(T, C)


def _sddmm_kernel_v2(chunk_block_ref, lr_lane_ref, g_ref, xd_ref, out_ref):
    """(W, C)-orientation SDDMM: scores leave as (1, C) LANE vectors.

    The v1 kernel keeps everything sublane-major ((C, W) products, (C, 1)
    scores) — measured 9.5 ms of kernel time over the gather floor; the
    flash attend showed the (W, C) orientation with lane-major outputs
    costs ~1.6 ms for strictly MORE work, so the standalone SDDMM adopts
    the same layout."""
    lr = lr_lane_ref[0]                                  # (1, C) lanes
    W = xd_ref.shape[0]
    C = lr.shape[-1]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    ohT = iota_w == lr                                   # (W, C)
    P2 = jax.lax.dot_general(
        xd_ref[:], g_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (W, C)
    out_ref[0] = jnp.where(ohT, P2, 0.0).sum(axis=0, keepdims=True)


def sddmm_blocked_pallas_v2(b: BlockedCsr, x_dst: jax.Array,
                            x_src: jax.Array, *,
                            compute_dtype=jnp.bfloat16,
                            gathered: jax.Array | None = None,
                            interpret: bool = False) -> jax.Array:
    """Per-edge dot scores, lane-major variant (same semantics as
    :func:`sddmm_blocked_pallas`)."""
    W = b.rows_per_block
    T, C = b.edge_src.shape
    F = x_src.shape[-1]
    assert C % 128 == 0 and W % 128 == 0

    g = (gathered if gathered is not None
         else x_src.astype(compute_dtype)[b.edge_src])
    xd = _pad_dst(b, x_dst.astype(compute_dtype))
    lr_lane = b.edge_local_row.reshape(T, 1, C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, F), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((W, F), lambda t, cb: (cb[t], 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, C), lambda t, cb: (t, 0, 0)),
    )
    out = pl.pallas_call(
        _sddmm_kernel_v2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 1, C), jnp.float32),
        interpret=interpret,
    )(b.chunk_block, lr_lane, g, xd)
    return out.reshape(T, C)


# ---------------------------------------------------------------------------
# Online edge softmax
# ---------------------------------------------------------------------------

def _mz_kernel(chunk_block_ref, lr_ref, s_ref, m_ref, z_ref):
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    lr = lr_ref[0].reshape(-1)                          # (C,) lanes
    s = s_ref[0, 0]                                     # (C,) f32 lanes
    W = m_ref.shape[-2]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, lr.shape[0]), 0)
    masked = jnp.where(iota_w == lr[None, :], s[None, :], NEG_INF)  # (W, C)
    # row stats are SUBLANE vectors (reduced along lanes): (W, 1) tiles
    m_c = jnp.max(masked, axis=1, keepdims=True)        # (W, 1)
    m_safe = jnp.where(jnp.isfinite(m_c), m_c, 0.0)
    e = jnp.where(jnp.isfinite(masked), jnp.exp(masked - m_safe), 0.0)
    z_c = e.sum(axis=1, keepdims=True)                  # (W, 1)

    @pl.when(first)
    def _():
        m_ref[0] = m_c
        z_ref[0] = z_c

    @pl.when(jnp.logical_not(first))
    def _():
        m_old = m_ref[0]
        z_old = z_ref[0]
        m_new = jnp.maximum(m_old, m_c)
        m_new_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        r_old = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - m_new_safe), 0.0)
        r_c = jnp.where(jnp.isfinite(m_c), jnp.exp(m_c - m_new_safe), 0.0)
        m_ref[0] = m_new
        z_ref[0] = z_old * r_old + z_c * r_c


def _att_kernel(chunk_block_ref, lr_ref, s_ref, m_ref, z_ref, out_ref):
    lr = lr_ref[0].reshape(-1)                          # (C,) lanes
    s = s_ref[0, 0]                                     # (C,) lanes
    W = m_ref.shape[-2]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, lr.shape[0]), 0)
    ohT = iota_w == lr[None, :]                         # (W, C)
    # per-lane VMEM "gather" of the row stats: mask the (W, 1) sublane
    # stats across lanes and reduce over sublanes -> (C,) lane vectors
    m_e = jnp.where(ohT, m_ref[0], NEG_INF).max(axis=0)            # (C,)
    z_e = jnp.where(ohT, z_ref[0], 0.0).sum(axis=0)                # (C,)
    att = jnp.where(jnp.isfinite(m_e) & (z_e > 0.0),
                    jnp.exp(s - jnp.where(jnp.isfinite(m_e), m_e, 0.0))
                    / jnp.maximum(z_e, 1e-38), 0.0)
    out_ref[0, 0, :] = att


def edge_softmax_blocked(b: BlockedCsr, scores: jax.Array, *,
                         interpret: bool = False) -> jax.Array:
    """Per-dst-row softmax of blocked edge scores.

    ``scores``: (T, C) f32 (invalid lanes' values are ignored — their local
    row is W, outside every one-hot).  Returns (T, C) f32 attention weights
    that sum to 1 over each dst row's valid edges.

    Pass 1 accumulates online (max, rescaled expsum) per row block —
    the flash-attention recurrence; pass 2 normalises each edge against its
    row's final stats, both entirely in VMEM.
    """
    W = b.rows_per_block
    T, C = b.edge_src.shape
    B = b.num_blocks
    assert C % 128 == 0 and W % 128 == 0, "W and C must be multiples of 128"
    lr3 = b.edge_local_row.reshape(T, C // 128, 128)
    # (1, 1, C)/(1, 1, W) blocks: real Mosaic lowering rejects 2-D (1, C)
    # and 1-D (W,) blocks (last two dims must be (8k, 128m) or equal the
    # array dims); the middle singleton satisfies it exactly.
    s3 = scores.reshape(T, 1, C)

    grid_mz = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C // 128, 128), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda t, cb: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, W, 1), lambda t, cb: (cb[t], 0, 0)),
            pl.BlockSpec((1, W, 1), lambda t, cb: (cb[t], 0, 0)),
        ],
    )
    m, z = pl.pallas_call(
        _mz_kernel,
        grid_spec=grid_mz,
        out_shape=[jax.ShapeDtypeStruct((B, W, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, W, 1), jnp.float32)],
        interpret=interpret,
    )(b.chunk_block, lr3, s3)

    grid_att = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C // 128, 128), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, W, 1), lambda t, cb: (cb[t], 0, 0)),
            pl.BlockSpec((1, W, 1), lambda t, cb: (cb[t], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, C), lambda t, cb: (t, 0, 0)),
    )
    out = pl.pallas_call(
        _att_kernel,
        grid_spec=grid_att,
        out_shape=jax.ShapeDtypeStruct((T, 1, C), jnp.float32),
        interpret=interpret,
    )(b.chunk_block, lr3, s3, m, z)
    return out.reshape(T, C)


def _mz_mh_kernel(chunk_block_ref, lr_ref, s_ref, m_ref, z_ref):
    """Multi-head online (max, expsum): head h's scores occupy lanes
    [h*C, (h+1)*C) of the (1, 1, H*C) score row; stats tile is (1, W, H)
    with head h in lane column h."""
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    lr = lr_ref[0].reshape(-1)                          # (C,) lanes
    C = lr.shape[0]
    W = m_ref.shape[-2]
    H = m_ref.shape[-1]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    oh = iota_w == lr[None, :]                          # (W, C)
    ms, zs = [], []
    for hd in range(H):
        s = s_ref[0, 0, hd * C: (hd + 1) * C]           # (C,) lanes
        masked = jnp.where(oh, s[None, :], NEG_INF)     # (W, C)
        m_c = jnp.max(masked, axis=1, keepdims=True)    # (W, 1)
        m_safe = jnp.where(jnp.isfinite(m_c), m_c, 0.0)
        e = jnp.where(jnp.isfinite(masked), jnp.exp(masked - m_safe), 0.0)
        ms.append(m_c)
        zs.append(e.sum(axis=1, keepdims=True))
    m_c = jnp.concatenate(ms, axis=1)                   # (W, H)
    z_c = jnp.concatenate(zs, axis=1)

    @pl.when(first)
    def _():
        m_ref[0] = m_c
        z_ref[0] = z_c

    @pl.when(jnp.logical_not(first))
    def _():
        m_old = m_ref[0]
        z_old = z_ref[0]
        m_new = jnp.maximum(m_old, m_c)
        m_new_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        r_old = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - m_new_safe),
                          0.0)
        r_c = jnp.where(jnp.isfinite(m_c), jnp.exp(m_c - m_new_safe), 0.0)
        m_ref[0] = m_new
        z_ref[0] = z_old * r_old + z_c * r_c


def _att_mh_kernel(chunk_block_ref, lr_ref, s_ref, m_ref, z_ref, out_ref):
    lr = lr_ref[0].reshape(-1)                          # (C,) lanes
    C = lr.shape[0]
    W = m_ref.shape[-2]
    H = m_ref.shape[-1]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    ohT = iota_w == lr[None, :]                         # (W, C)
    # per-head lane-offset stores: a cross-tile lane concatenate
    # ((C,)*H -> (H*C,)) does not lower on real Mosaic ("input offsets
    # outside of the first tile"); sliced stores at C-aligned offsets do —
    # the same addressing the loads above already use.
    for hd in range(H):
        s = s_ref[0, 0, hd * C: (hd + 1) * C]
        m2 = m_ref[0, :, hd: hd + 1]                    # (W, 1)
        z2 = z_ref[0, :, hd: hd + 1]
        m_e = jnp.where(ohT, m2, NEG_INF).max(axis=0)   # (C,) lanes
        z_e = jnp.where(ohT, z2, 0.0).sum(axis=0)
        out_ref[0, 0, hd * C: (hd + 1) * C] = jnp.where(
            jnp.isfinite(m_e) & (z_e > 0.0),
            jnp.exp(s - jnp.where(jnp.isfinite(m_e), m_e, 0.0))
            / jnp.maximum(z_e, 1e-38), 0.0)


def edge_softmax_blocked_multihead(b: BlockedCsr, scores: jax.Array, *,
                                   interpret: bool = False) -> jax.Array:
    """Per-dst-row softmax for H heads in ONE two-pass traversal.

    ``scores``: (H, T, C) f32.  Returns (H, T, C) attention weights.  The
    single-head version walks the chunk list (and reloads each chunk's
    local-row block) once per head; here the (max, expsum) recurrence for
    every head rides one traversal with an (W, H) stats tile."""
    W = b.rows_per_block
    T, C = b.edge_src.shape
    B = b.num_blocks
    H = scores.shape[0]
    assert C % 128 == 0 and W % 128 == 0
    lr3 = b.edge_local_row.reshape(T, C // 128, 128)
    # head h -> lanes [h*C, (h+1)*C) of a (T, 1, H*C) row
    s3 = jnp.moveaxis(scores, 0, 1).reshape(T, 1, H * C)

    grid_mz = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C // 128, 128), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, 1, H * C), lambda t, cb: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, W, H), lambda t, cb: (cb[t], 0, 0)),
            pl.BlockSpec((1, W, H), lambda t, cb: (cb[t], 0, 0)),
        ],
    )
    m, z = pl.pallas_call(
        _mz_mh_kernel,
        grid_spec=grid_mz,
        out_shape=[jax.ShapeDtypeStruct((B, W, H), jnp.float32),
                   jax.ShapeDtypeStruct((B, W, H), jnp.float32)],
        interpret=interpret,
    )(b.chunk_block, lr3, s3)

    grid_att = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C // 128, 128), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, 1, H * C), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, W, H), lambda t, cb: (cb[t], 0, 0)),
            pl.BlockSpec((1, W, H), lambda t, cb: (cb[t], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, H * C), lambda t, cb: (t, 0, 0)),
    )
    out = pl.pallas_call(
        _att_mh_kernel,
        grid_spec=grid_att,
        out_shape=jax.ShapeDtypeStruct((T, 1, H * C), jnp.float32),
        interpret=interpret,
    )(b.chunk_block, lr3, s3, m, z)
    return jnp.moveaxis(out.reshape(T, H, C), 1, 0)


# ---------------------------------------------------------------------------
# Weighted SpMM (attention-weighted aggregation)
# ---------------------------------------------------------------------------

def _spmm_w_kernel(chunk_block_ref, lr_ref, w_ref, g_ref, out_ref):
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    lr = lr_ref[0].reshape(-1)                          # (C,)
    W = out_ref.shape[0]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, lr.shape[0]), 0)
    oh = (iota_w == lr[None, :]).astype(g_ref.dtype)
    # weight folded into the GATHERED side: the (C, 1) sublane copy
    # broadcasts over feature lanes for free, whereas folding it into the
    # one-hot needs a (W, C) f32 select + cast per chunk (measured 2.4x
    # slower end to end)
    g2 = (g_ref[0].astype(jnp.float32) * w_ref[0]).astype(g_ref.dtype)
    part = jnp.dot(oh, g2, preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        out_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + part


def spmm_blocked_weighted_pallas(b: BlockedCsr, x: jax.Array,
                                 edge_weight: jax.Array, *,
                                 compute_dtype=jnp.bfloat16,
                                 gathered: jax.Array | None = None,
                                 interpret: bool = False) -> jax.Array:
    """Weighted scatter-free SpMM: ``y[i] = sum_e w[e] x[src(e)]``.

    ``edge_weight``: (T, C) in blocked edge layout (e.g. the output of
    :func:`edge_softmax_blocked`).  Invalid lanes are ignored via the
    one-hot.  Returns (num_rows, F) float32.
    """
    W = b.rows_per_block
    T, C = b.edge_src.shape
    F = x.shape[-1]
    B = b.num_blocks
    assert C % 128 == 0, "chunk_edges must be a multiple of 128"

    g = (gathered if gathered is not None
         else x.astype(compute_dtype)[b.edge_src])       # (T, C, F) gather
    lr3 = b.edge_local_row.reshape(T, C // 128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C // 128, 128), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, 1), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, F), lambda t, cb: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((W, F), lambda t, cb: (cb[t], 0)),
    )
    out = pl.pallas_call(
        _spmm_w_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * W, F), jnp.float32),
        interpret=interpret,
    )(b.chunk_block, lr3,
      edge_weight.astype(jnp.float32).reshape(T, C, 1), g)
    return out[: b.num_rows]


def _spmm_mw_kernel(chunk_block_ref, lr_ref, w_ref, g_ref, out_ref):
    """Multi-head weighted accumulation: one (W, C) @ (C, H*D) matmul per
    chunk with each head's per-edge weight pre-folded into its D-column
    slice of the gathered features."""
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    lr = lr_ref[0].reshape(-1)                          # (C,)
    W = out_ref.shape[0]
    wh = w_ref[0]                                       # (C, H) f32
    C, H = wh.shape
    F = g_ref.shape[-1]
    D = F // H
    # expand (C, H) -> (C, H*D) with each head's weight repeated across its
    # D feature columns, via a tiny constant one-hot matmul (C*H*F flops —
    # portable where pltpu.repeat is not)
    col_head = jax.lax.broadcasted_iota(jnp.int32, (H, F), 1) // D
    head_row = jax.lax.broadcasted_iota(jnp.int32, (H, F), 0)
    expand = (col_head == head_row).astype(jnp.float32)  # (H, F)
    wexp = jnp.dot(wh, expand, preferred_element_type=jnp.float32)  # (C, F)
    g2 = (g_ref[0].astype(jnp.float32) * wexp).astype(g_ref.dtype)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, lr.shape[0]), 0)
    oh = (iota_w == lr[None, :]).astype(g_ref.dtype)
    part = jnp.dot(oh, g2, preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        out_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + part


def spmm_blocked_multiweighted_pallas(b: BlockedCsr, x: jax.Array,
                                      edge_weight: jax.Array, *,
                                      compute_dtype=jnp.bfloat16,
                                      gathered: jax.Array | None = None,
                                      interpret: bool = False) -> jax.Array:
    """H-head weighted SpMM in ONE kernel + ONE wide gather.

    ``x``: (N, H*D) head-concatenated features; ``edge_weight``: (H, T, C)
    per-head blocked weights.  Returns (num_rows, H*D) float32 where
    columns [h*D, (h+1)*D) are head h's weighted aggregation.  Replaces an
    H-iteration loop of narrow (D-wide) gathers — narrow random gathers
    are the measured bottleneck (BASELINE.md: access rate is width-
    invariant, so H narrow gathers cost H times one wide gather)."""
    W = b.rows_per_block
    T, C = b.edge_src.shape
    F = x.shape[-1]
    H = edge_weight.shape[0]
    B = b.num_blocks
    assert C % 128 == 0 and F % H == 0

    g = (gathered if gathered is not None
         else x.astype(compute_dtype)[b.edge_src])       # (T, C, F) gather
    lr3 = b.edge_local_row.reshape(T, C // 128, 128)
    w = jnp.moveaxis(edge_weight.astype(jnp.float32), 0, -1)  # (T, C, H)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C // 128, 128), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, H), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, F), lambda t, cb: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((W, F), lambda t, cb: (cb[t], 0)),
    )
    out = pl.pallas_call(
        _spmm_mw_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * W, F), jnp.float32),
        interpret=interpret,
    )(b.chunk_block, lr3, w, g)
    return out[: b.num_rows]


def blocked_dst_rows(b: BlockedCsr) -> jax.Array:
    """Global dst row id of every blocked lane (invalid lanes clamped into
    their block — mask with ``b.edge_valid``)."""
    W = b.rows_per_block
    return (b.chunk_block[:, None] * W
            + jnp.minimum(b.edge_local_row, W - 1))


def gat_edge_logits_blocked(b: BlockedCsr, alpha_src: jax.Array,
                            alpha_dst: jax.Array, *,
                            negative_slope: float = 0.2) -> jax.Array:
    """GATv1-style additive logits in blocked edge layout (single head).

    ``alpha_src``/``alpha_dst``: (N,) per-node projections.  Returns (T, C)
    f32 ``leaky_relu(alpha_src[src(e)] + alpha_dst[dst(e)])``.
    """
    rows = jnp.clip(blocked_dst_rows(b), 0, alpha_dst.shape[0] - 1)
    s = (alpha_src[b.edge_src].astype(jnp.float32)
         + alpha_dst[rows].astype(jnp.float32))
    return jax.nn.leaky_relu(s, negative_slope)


def gat_attend_blocked(b: BlockedCsr, h: jax.Array, alpha_src: jax.Array,
                       alpha_dst: jax.Array, *,
                       negative_slope: float = 0.2,
                       compute_dtype=jnp.bfloat16,
                       interpret: bool = False) -> jax.Array:
    """Full GAT attention aggregation on the blocked layout, multi-head.

    ``h``: (N, H, d) projected features; ``alpha_src``/``alpha_dst``: (N, H)
    per-head logits.  Returns (num_rows, H, d) float32.  Heads run as a
    python loop of single-head kernel calls (H is small and static).
    """
    N, H, D = h.shape
    # per-head additive logits (alpha gathers fuse across heads in XLA:
    # both tables are (N, H), one row fetch serves every head).
    # NEGATIVE RESULT (measured, v5e): folding alpha_src into the wide
    # feature gather + building alpha_dst[dst(e)] via block-indexed take +
    # take_along_axis is 2.3x SLOWER (62 vs 27 ms at E=4.2M, H=4, d=32) —
    # take_along_axis over (T, W, H) is itself an access-rate-bound gather
    # (4.5M index ops), and slicing the widened gathered tensor costs full
    # re-streams of the 1.1 GB buffer.  The XLA alpha gathers stay.
    rows = jnp.clip(blocked_dst_rows(b), 0, alpha_dst.shape[0] - 1)
    logits = jax.nn.leaky_relu(
        alpha_src[b.edge_src].astype(jnp.float32)
        + alpha_dst[rows].astype(jnp.float32), negative_slope)  # (T, C, H)
    # ONE multi-head softmax traversal + ONE wide gather + one multi-head
    # weighted kernel instead of H full passes
    atts = edge_softmax_blocked_multihead(
        b, jnp.moveaxis(logits, -1, 0), interpret=interpret)
    out = spmm_blocked_multiweighted_pallas(
        b, h.reshape(N, H * D), atts,
        compute_dtype=compute_dtype, interpret=interpret)
    return out.reshape(-1, H, D)


def _gat_flash_kernel(chunk_block_ref, lr_lane_ref, g_ref, ad_ref,
                      out_ref, m_ref, z_ref, *, heads: int,
                      negative_slope: float):
    """Multi-head GAT flash attend: ONE traversal, ONE gather.

    ``g_ref`` block: (1, C, H*D + H) — the gathered per-edge source rows
    with each head's ``alpha_src`` appended as trailing columns (one wide
    gather serves features AND source logits).  ``ad_ref``: (W, H) block
    tile of per-node ``alpha_dst`` (block-indexed, no gather).  Per head:
    additive leaky-relu logits, flash (m, z) recurrence with a rescaled
    output accumulator over the head's D-column slice.  Stats tiles are
    (W, H); the final out / z runs outside.
    """
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    H = heads
    lr = lr_lane_ref[0]                                  # (1, C)
    W = ad_ref.shape[0]
    C = lr.shape[-1]
    FH = g_ref.shape[-1]
    D = (FH - H) // H
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    ohT = iota_w == lr                                   # (W, C)

    g = g_ref[0]                                         # (C, H*D + H)
    m_old = m_ref[:]                                     # (W, H)
    z_old = z_ref[:]
    out_old = out_ref[:]                                 # (W, H*D)

    ms, zs, parts = [], [], []
    for hd in range(H):
        asrc = g[:, H * D + hd].astype(jnp.float32)[None, :]     # (1, C)
        # per-edge alpha_dst: mask the (W, 1) head column over lanes
        ad = ad_ref[:, hd: hd + 1]                               # (W, 1)
        ad_e = jnp.where(ohT, ad, 0.0).sum(axis=0, keepdims=True)  # (1, C)
        s = asrc + ad_e
        s = jnp.where(s > 0, s, negative_slope * s)              # leaky_relu
        # flash stats for this head
        m_c = jnp.where(ohT, s, NEG_INF).max(axis=1, keepdims=True)  # (W,1)
        m_new = jnp.where(first, m_c, jnp.maximum(m_old[:, hd: hd + 1],
                                                  m_c))
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        m_e = jnp.where(ohT, m_safe, NEG_INF).max(axis=0, keepdims=True)
        e = jnp.where(jnp.isfinite(m_e), jnp.exp(s - m_e), 0.0)  # (1, C)
        z_c = jnp.where(ohT, e, 0.0).sum(axis=1, keepdims=True)  # (W, 1)
        ohw = jnp.where(ohT, e, 0.0).astype(g_ref.dtype)         # (W, C)
        part = jnp.dot(ohw, g[:, hd * D: (hd + 1) * D],
                       preferred_element_type=jnp.float32)       # (W, D)
        ms.append((m_c, m_new, m_safe))
        zs.append(z_c)
        parts.append(part)

    m_c_all = jnp.concatenate([a for a, _, _ in ms], axis=1)     # (W, H)
    m_new_all = jnp.concatenate([b_ for _, b_, _ in ms], axis=1)
    m_safe_all = jnp.concatenate([c for _, _, c in ms], axis=1)
    z_c_all = jnp.concatenate(zs, axis=1)
    part_all = jnp.concatenate(parts, axis=1)                    # (W, H*D)

    @pl.when(first)
    def _():
        out_ref[:] = part_all
        m_ref[:] = m_c_all
        z_ref[:] = z_c_all

    @pl.when(jnp.logical_not(first))
    def _():
        r_old = jnp.where(jnp.isfinite(m_old),
                          jnp.exp(m_old - m_safe_all), 0.0)      # (W, H)
        # expand r_old over each head's D columns via the constant one-hot
        col_head = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 1) // D
        head_row = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 0)
        expand = (col_head == head_row).astype(jnp.float32)      # (H, H*D)
        r_wide = jnp.dot(r_old, expand,
                         preferred_element_type=jnp.float32)     # (W, H*D)
        out_ref[:] = out_old * r_wide + part_all
        m_ref[:] = m_new_all
        z_ref[:] = z_old * r_old + z_c_all


def gat_attend_blocked_flash(b: BlockedCsr, h: jax.Array,
                             alpha_src: jax.Array, alpha_dst: jax.Array, *,
                             negative_slope: float = 0.2,
                             compute_dtype=jnp.bfloat16,
                             interpret: bool = False,
                             debug_stats: bool = False) -> jax.Array:
    """Multi-head GAT aggregation: ONE kernel, ONE random gather.

    Same semantics as :func:`gat_attend_blocked`.  ``h``: (N, H, D)
    projected features; ``alpha_src``/``alpha_dst``: (N, H).  The H
    per-head ``alpha_src`` columns ride the wide feature gather as
    trailing columns (the measured cost of a random gather is per-ACCESS,
    not per-byte — widening 256->264 B is free, a second (T, C) gather is
    another ~12 ms); ``alpha_dst`` needs no gather at all (block-indexed
    (W, H) tiles).  Returns (num_rows, H, D) float32.
    """
    N, H, D = h.shape
    W = b.rows_per_block
    T, C = b.edge_src.shape
    B = b.num_blocks
    assert C % 128 == 0 and W % 128 == 0

    hw = jnp.concatenate(
        [h.reshape(N, H * D).astype(compute_dtype),
         alpha_src.astype(compute_dtype)], axis=-1)      # (N, H*D + H)
    g = hw[b.edge_src]                                   # THE gather
    ad = _pad_dst(b, alpha_dst.astype(jnp.float32))      # (B*W, H)
    lr_lane = b.edge_local_row.reshape(T, 1, C)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, H * D + H), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((W, H), lambda t, cb: (cb[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((W, H * D), lambda t, cb: (cb[t], 0)),
            pl.BlockSpec((W, H), lambda t, cb: (cb[t], 0)),
            pl.BlockSpec((W, H), lambda t, cb: (cb[t], 0)),
        ],
    )
    out, _m, z = pl.pallas_call(
        functools.partial(_gat_flash_kernel, heads=H,
                          negative_slope=negative_slope),
        grid_spec=grid,
        out_shape=[jax.ShapeDtypeStruct((B * W, H * D), jnp.float32),
                   jax.ShapeDtypeStruct((B * W, H), jnp.float32),
                   jax.ShapeDtypeStruct((B * W, H), jnp.float32)],
        interpret=interpret,
    )(b.chunk_block, lr_lane, g, ad)
    # NB: 1e-38 is subnormal in f32 and flushes to zero under FTZ -> 0/0
    # NaN on edge-less rows; guard with an explicit predicate instead.
    zc = z[..., None]
    att = jnp.where(zc > 0, out.reshape(B * W, H, D)
                    / jnp.maximum(zc, 1e-20), 0.0)
    if debug_stats:
        return att[: b.num_rows], out, _m, z
    return att[: b.num_rows]


def _gat_packed_kernel(chunk_block_ref, lr_lane_ref, g_ref, ad_ref,
                       out_ref, m_ref, z_ref, *, heads: int,
                       negative_slope: float, sel_prec=None):
    """HEAD-PACKED multi-head GAT flash attend: one traversal, one gather,
    and — unlike :func:`_gat_flash_kernel` — NO per-head (W, C) stat passes
    and NO skinny per-head (W, C)@(C, D) matmuls (the measured 2.6x loss of
    the first flash-GAT attempt, BASELINE.md round-3 negative result).

    Layout: every per-head quantity lives as H lanes of a (C, H) or (W, H)
    tile; per-edge selects against the one-hot ride the MXU as NT matmuls
    (lhs^T @ rhs with both operands sublane-major — the dot_general form
    real Mosaic lowers without a transpose, per the round-2 fix history);
    the weighted feature contraction is ONE full-width (W, C)@(C, H*D)
    matmul with the exp'd per-head weights expanded over each head's D
    lanes by a constant (H, H*D) one-hot matmul.

    Stabilization is the scalar-chunk-max scheme of
    :func:`_flash_kernel_scalar`, per head: M[h] = max over the chunk's
    lanes of s[:, h], so exp(s - M) <= 1 and no per-edge running-max
    select is needed.
    """
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    H = heads
    g = g_ref[0]                                         # (C, H*D + H)
    asrc = g[:, (g.shape[-1] - H):].astype(jnp.float32)  # (C, H)
    _gat_packed_core(lr_lane_ref, g[:, : g.shape[-1] - H], asrc, ad_ref,
                     out_ref, m_ref, z_ref, first, heads=heads,
                     negative_slope=negative_slope, sel_prec=sel_prec)


def _gat_packed_vec_kernel(chunk_block_ref, lr_lane_ref, g_ref, ad_ref,
                           avec_ref, out_ref, m_ref, z_ref, *, heads: int,
                           negative_slope: float, sel_prec=None):
    """Projection variant: the gather stays at the ALIGNED (C, H*D) feature
    width and per-edge ``alpha_src`` is computed IN-KERNEL as the linear
    projection it is in GATv1 (``alpha_src[i] = sum_d h[i,h,d]*a[h,d]``)
    via one (C, H*D)@(H*D, H) matmul against the block-diagonal-expanded
    projection vector.  Motivation (measured, v5e): the gather engine's
    fast path exists ONLY at exactly-256-byte rows — widening the row to
    264 B (or padding to 272-512 B) drops it from 380 to ~130 Macc/s, so
    the widened one-gather layout pays a 34 ms floor where the aligned
    (N, 128)-bf16 gather pays 11.8 ms (scripts/micro_gat_packed.py)."""
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    g = g_ref[0]                                         # (C, H*D)
    if sel_prec is None:
        # bf16 fast path: project in the gathered dtype (no (C, H*D) f32
        # upcast pass, bf16 MXU) — the projection error is inside the bf16
        # rounding the caller accepted (measured -1.1 ms of the r4 kernel's
        # S1 stage, scripts/micro_gat_stage_decomp.py)
        asrc = jax.lax.dot_general(
            g, avec_ref[:].astype(g.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (C, H)
    else:
        asrc = jax.lax.dot_general(
            g.astype(jnp.float32), avec_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=sel_prec,
            preferred_element_type=jnp.float32)          # (C, H)
    _gat_packed_core(lr_lane_ref, g, asrc, ad_ref, out_ref, m_ref, z_ref,
                     first, heads=heads, negative_slope=negative_slope,
                     sel_prec=sel_prec)


def _gat_packed_core(lr_lane_ref, g_feat, asrc, ad_ref, out_ref, m_ref,
                     z_ref, first, *, heads: int, negative_slope: float,
                     sel_prec=None):
    """``sel_prec``: precision for every matmul that implements a SELECT
    or a stat over f32 values.  TPU f32 dot_generals default to
    bf16-precision MXU passes — the on-chip gates caught this as
    1e-2-level divergence (interpret computes true f32 and cannot see
    it).  f32 compute_dtype passes HIGHEST (exactness mode; needs a
    raised scoped-VMEM limit at wide-chunk layouts); bf16 compute passes
    DEFAULT (select error is inside the bf16 rounding the caller already
    accepted, and DEFAULT keeps the fast path fast)."""
    H = heads
    lr = lr_lane_ref[0]                                  # (1, C)
    W = ad_ref.shape[0]
    C = lr.shape[-1]
    D = g_feat.shape[-1] // H
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    ohT = iota_w == lr                                   # (W, C) bool
    ohTf = ohT.astype(jnp.float32)
    g = g_feat

    # per-edge alpha_dst for every head in ONE NT matmul (exact: each lane
    # has at most one claiming row).  No claimed-lane masking anywhere:
    # padding lanes carry real node-0 features (same value distribution, so
    # the chunk max stays in range), the one-hot contraction zero-weights
    # them in BOTH ``part`` and ``z_c``, and M cancels exactly in
    # att = out/z — the r4 kernel's claimed column + its three masked
    # (C, H) passes were pure overhead (the stats stage measured +2.87 ms,
    # scripts/micro_gat_stage_decomp.py; narrow (C, H) VPU passes cost
    # ~E/8 vector ops each regardless of the 124 idle lanes)
    sel = jax.lax.dot_general(
        ohTf, ad_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        precision=sel_prec,
        preferred_element_type=jnp.float32)              # (C, H)

    s = asrc + sel
    s = jnp.where(s > 0, s, negative_slope * s)          # leaky_relu (C, H)
    M = jnp.max(s, axis=0, keepdims=True)                # (1, H), finite
    E = jnp.exp(s - M)                                   # (C, H) <= 1

    # expand the per-head weights over each head's D feature lanes with a
    # constant one-hot (reshape-free, same trick as _gat_flash_kernel)
    col_head = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 1) // D
    head_row = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 0)
    expand = (col_head == head_row).astype(jnp.float32)  # (H, H*D)
    e_wide = jnp.dot(E, expand, precision=sel_prec,
                     preferred_element_type=jnp.float32)  # (C, H*D)
    if sel_prec is None:
        # bf16 fast path: scale in the gathered dtype — skips the f32
        # upcast/downcast streams over the (C, H*D) tile (the S4 stage's
        # measured cost); the weight rounding is inside bf16 tolerance
        rhs = g * e_wide.astype(g.dtype)
    else:
        rhs = (g.astype(jnp.float32) * e_wide).astype(g.dtype)
    part = jnp.dot(ohT.astype(g.dtype), rhs, precision=sel_prec,
                   preferred_element_type=jnp.float32)   # (W, H*D)
    z_c = jnp.dot(ohTf, E, precision=sel_prec,
                  preferred_element_type=jnp.float32)    # (W, H)
    m_c = jnp.broadcast_to(M, (W, H))

    @pl.when(first)
    def _():
        out_ref[:] = part
        m_ref[:] = m_c
        z_ref[:] = z_c

    @pl.when(jnp.logical_not(first))
    def _():
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, m_c)
        r_old = jnp.exp(m_old - m_new)                   # (W, H)
        r_c = jnp.exp(m_c - m_new)
        r_old_w = jnp.dot(r_old, expand, precision=sel_prec,
                          preferred_element_type=jnp.float32)
        r_c_w = jnp.dot(r_c, expand, precision=sel_prec,
                        preferred_element_type=jnp.float32)
        out_ref[:] = out_ref[:] * r_old_w + part * r_c_w
        m_ref[:] = m_new
        z_ref[:] = z_ref[:] * r_old + z_c * r_c


def gat_attend_blocked_packed(b: BlockedCsr, h: jax.Array,
                              alpha_src: jax.Array | None,
                              alpha_dst: jax.Array, *,
                              negative_slope: float = 0.2,
                              compute_dtype=jnp.bfloat16,
                              alpha_src_vec: jax.Array | None = None,
                              interpret: bool = False) -> jax.Array:
    """Head-packed one-kernel one-gather multi-head GAT (VERDICT r3 #5).

    Same semantics as :func:`gat_attend_blocked` (GATv1 additive logits,
    per-dst softmax, per-head weighted mean of projected source features,
    /root/reference-parity GAT aggregation), with the head-packed kernel
    that keeps every matmul full-width.  ``h``: (N, H, D);
    ``alpha_src``/``alpha_dst``: (N, H).  Returns (num_rows, H, D) f32.

    Two gather layouts:
    * default — ``alpha_src`` rides the feature gather as trailing
      columns (works for ARBITRARY per-node source logits);
    * ``alpha_src_vec`` given as the (H, D) GATv1 projection vector
      (``alpha_src[i,h] == (h[i,h] * vec[h]).sum()``) — the gather stays
      at the exactly-256-byte aligned (N, H*D)-bf16 row width and the
      kernel recomputes per-edge alpha_src with one matmul.  Measured
      (v5e): the gather engine's fast path exists ONLY at 256 B rows
      (380 Macc/s; 264-512 B rows all drop to ~130), so this variant's
      floor is 11.8 ms where the widened layout pays 34 ms at E=4.2M.
      Pass ``alpha_src=None`` in this mode — supplying both raises, so an
      inconsistent (table, vec) pair cannot silently diverge (in bf16 the
      in-kernel projection rounds differently from the table path).
    """
    if (alpha_src is None) == (alpha_src_vec is None):
        raise ValueError(
            "pass exactly one of alpha_src (per-node logit table) or "
            "alpha_src_vec (GATv1 (H, D) projection; the kernel recomputes "
            "the logits in-kernel)")
    N, H, D = h.shape
    W = b.rows_per_block
    T, C = b.edge_src.shape
    B = b.num_blocks
    assert C % 128 == 0 and W % 128 == 0

    ad = _pad_dst(b, alpha_dst.astype(jnp.float32))      # (B*W, H)
    lr_lane = b.edge_local_row.reshape(T, 1, C)
    # exactness mode (f32): HIGHEST-precision select matmuls + a raised
    # scoped-VMEM limit (the extra f32 passes need >16 MB at wide-chunk
    # layouts); production bf16 keeps DEFAULT precision (select error is
    # within the bf16 rounding already accepted) and the default limits
    exact = jnp.dtype(compute_dtype) == jnp.dtype(jnp.float32)
    sel_prec = jax.lax.Precision.HIGHEST if exact else None
    compiler_params = (pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024) if exact else None)

    if alpha_src_vec is not None:
        hw = h.reshape(N, H * D).astype(compute_dtype)   # 256 B rows
        g = hw[b.edge_src]                               # THE gather
        # block-diagonal expansion of the (H, D) projection: (H*D, H)
        avec = jnp.zeros((H * D, H), jnp.float32)
        rows_i = jnp.arange(H * D)
        avec = avec.at[rows_i, rows_i // D].set(
            alpha_src_vec.astype(jnp.float32).reshape(-1))
        in_specs = [
            pl.BlockSpec((1, 1, C), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, H * D), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((W, H), lambda t, cb: (cb[t], 0)),
            pl.BlockSpec((H * D, H), lambda t, cb: (0, 0)),
        ]
        kernel = functools.partial(_gat_packed_vec_kernel, heads=H,
                                   negative_slope=negative_slope,
                                   sel_prec=sel_prec)
        operands = (b.chunk_block, lr_lane, g, ad, avec)
    else:
        hw = jnp.concatenate(
            [h.reshape(N, H * D).astype(compute_dtype),
             alpha_src.astype(compute_dtype)], axis=-1)  # (N, H*D + H)
        g = hw[b.edge_src]                               # THE gather
        in_specs = [
            pl.BlockSpec((1, 1, C), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, H * D + H), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((W, H), lambda t, cb: (cb[t], 0)),
        ]
        kernel = functools.partial(_gat_packed_kernel, heads=H,
                                   negative_slope=negative_slope,
                                   sel_prec=sel_prec)
        operands = (b.chunk_block, lr_lane, g, ad)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((W, H * D), lambda t, cb: (cb[t], 0)),
            pl.BlockSpec((W, H), lambda t, cb: (cb[t], 0)),
            pl.BlockSpec((W, H), lambda t, cb: (cb[t], 0)),
        ],
    )
    out, _m, z = pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=[jax.ShapeDtypeStruct((B * W, H * D), jnp.float32),
                   jax.ShapeDtypeStruct((B * W, H), jnp.float32),
                   jax.ShapeDtypeStruct((B * W, H), jnp.float32)],
        interpret=interpret,
        **({} if compiler_params is None
           else {"compiler_params": compiler_params}),
    )(*operands)
    # FTZ-safe normalization (see gat_attend_blocked_flash)
    zc = z[..., None]
    att = jnp.where(zc > 0, out.reshape(B * W, H, D)
                    / jnp.maximum(zc, 1e-20), 0.0)
    return att[: b.num_rows]


def attend_blocked(b: BlockedCsr, x_dst: jax.Array, x_src: jax.Array, *,
                   scale: float | None = None,
                   compute_dtype=jnp.bfloat16,
                   interpret: bool = False) -> jax.Array:
    """softmax(<x_dst, x_src>/sqrt(F))-weighted neighbor aggregation.

    The blocked-TPU equivalent of gather -> segment_softmax -> scatter
    (transformer-style graph attention, single head).  Returns
    (num_rows, F) float32.
    """
    F = x_src.shape[-1]
    # ONE gather serves both kernels: the random (T, C, F) row fetch is the
    # measured wall (BASELINE.md) — the SDDMM and the weighted aggregation
    # each re-read it as a cheap sequential stream instead of re-gathering.
    g = x_src.astype(compute_dtype)[b.edge_src]
    s = sddmm_blocked_pallas(b, x_dst, x_src, compute_dtype=compute_dtype,
                             gathered=g, interpret=interpret)
    s = s * (scale if scale is not None else 1.0 / (F ** 0.5))
    att = edge_softmax_blocked(b, s, interpret=interpret)
    return spmm_blocked_weighted_pallas(b, x_src, att,
                                        compute_dtype=compute_dtype,
                                        gathered=g, interpret=interpret)


# ---------------------------------------------------------------------------
# Fused 2-kernel attend: SDDMM+stats, then normalize+weighted contraction
# ---------------------------------------------------------------------------

def _sddmm_mz_kernel(chunk_block_ref, lr_sub_ref, g_ref, xd_ref,
                     s_ref, m_ref, z_ref):
    """Pass A: per-edge scaled dot scores AND the online (max, expsum) row
    stats in ONE traversal of the gathered tensor.

    Everything stays sublane-major: scores are (C, 1) sublane vectors (the
    natural SDDMM output) and the stats are (1, W) LANE vectors produced by
    a sublane reduction of the (C, W) masked score tile — no transposes."""
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    P = jax.lax.dot_general(
        g_ref[0], xd_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (C, W)
    lr = lr_sub_ref[0]                                  # (C, 1) sublanes
    C, W = P.shape
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    mask = iota_w == lr                                 # (C, W)
    s = jnp.where(mask, P, 0.0).sum(axis=1, keepdims=True)  # (C, 1) SCALED
    s_ref[0] = s

    sm = jnp.where(mask, s, NEG_INF)                    # (C, W) masked
    m_c = jnp.max(sm, axis=0, keepdims=True)            # (1, W) lanes
    m_safe = jnp.where(jnp.isfinite(m_c), m_c, 0.0)
    e = jnp.where(jnp.isfinite(sm), jnp.exp(sm - m_safe), 0.0)
    z_c = e.sum(axis=0, keepdims=True)                  # (1, W)

    @pl.when(first)
    def _():
        m_ref[0] = m_c
        z_ref[0] = z_c

    @pl.when(jnp.logical_not(first))
    def _():
        m_old = m_ref[0]
        z_old = z_ref[0]
        m_new = jnp.maximum(m_old, m_c)
        m_new_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        r_old = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - m_new_safe),
                          0.0)
        r_c = jnp.where(jnp.isfinite(m_c), jnp.exp(m_c - m_new_safe), 0.0)
        m_ref[0] = m_new
        z_ref[0] = z_old * r_old + z_c * r_c


def _att_w_fused_kernel(chunk_block_ref, lr_sub_ref, lr_ref, s_ref, m_ref,
                        z_ref, g_ref, out_ref):
    """Pass B: normalize each edge against its row's final stats and fold
    the attention weight straight into the weighted one-hot contraction —
    no materialized attention tensor, no separate normalize pass."""
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    lr_sub = lr_sub_ref[0]                              # (C, 1) sublanes
    C = lr_sub.shape[0]
    W = out_ref.shape[0]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    mask = iota_w == lr_sub                             # (C, W)
    # per-edge stats: mask the (1, W) lane stats and reduce over lanes ->
    # (C, 1) sublane vectors, the exact layout the weight fold needs
    m_e = jnp.where(mask, m_ref[0], NEG_INF).max(axis=1, keepdims=True)
    z_e = jnp.where(mask, z_ref[0], 0.0).sum(axis=1, keepdims=True)
    s = s_ref[0]                                        # (C, 1) scaled
    att = jnp.where(jnp.isfinite(m_e) & (z_e > 0.0),
                    jnp.exp(s - jnp.where(jnp.isfinite(m_e), m_e, 0.0))
                    / jnp.maximum(z_e, 1e-38), 0.0)     # (C, 1)

    g2 = (g_ref[0].astype(jnp.float32) * att).astype(g_ref.dtype)
    lr = lr_ref[0].reshape(-1)                          # (C,) lanes
    iota_wc = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    oh = (iota_wc == lr[None, :]).astype(g_ref.dtype)
    part = jnp.dot(oh, g2, preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        out_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + part


# ---------------------------------------------------------------------------
# ONE-kernel flash attend: online-rescaled output accumulator
# ---------------------------------------------------------------------------

def _flash_kernel_row(chunk_block_ref, lr_lane_ref, g_ref, xd_ref,
                      out_ref, m_ref, z_ref):
    """Flash-attention recurrence on graph neighborhoods, ONE traversal.

    The 2-kernel fused attend reads the gathered (T, C, F) tensor twice
    (once per pass), putting its floor at gather + 2 streams (~67% of the
    1-gather wall).  Here the normalization never needs a second pass:
    the output tile accumulates UNNORMALIZED exp-weighted messages and is
    rescaled by ``exp(m_old - m_new)`` whenever the running row max moves
    — the flash-attention trick, with dst-row blocks playing the role of
    query tiles.  The final ``out / z`` division happens outside in XLA
    (one cheap stream over the output, fused into whatever consumes it).

    Everything is kept in the (W, C) orientation so all stats land as
    (W, 1) sublane vectors that broadcast over the (W, F) output tile
    without any in-kernel transposes; per-edge quantities are (1, C) lane
    vectors.  Only O(C) exps are evaluated per chunk (per-edge), never
    O(C*W) — the masked (W, C) tiles see only compare/select/min-max/sum
    single-op passes.
    """
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    lr = lr_lane_ref[0]                                  # (1, C) lanes
    W = out_ref.shape[0]
    C = lr.shape[-1]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    ohT = iota_w == lr                                   # (W, C)

    # scores in (W, C) orientation: P2[w, c] = <xd_w, g_c> (xd pre-scaled)
    P2 = jax.lax.dot_general(
        xd_ref[:], g_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (W, C)
    s = jnp.where(ohT, P2, 0.0).sum(axis=0, keepdims=True)       # (1, C)

    m_c = jnp.where(ohT, s, NEG_INF).max(axis=1, keepdims=True)  # (W, 1)
    m_old = m_ref[:]
    m_new = jnp.where(first, m_c, jnp.maximum(m_old, m_c))
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    # per-edge running row max, via one masked sublane reduce
    m_e = jnp.where(ohT, m_safe, NEG_INF).max(axis=0, keepdims=True)
    e = jnp.where(jnp.isfinite(m_e), jnp.exp(s - m_e), 0.0)      # (1, C)
    z_c = jnp.where(ohT, e, 0.0).sum(axis=1, keepdims=True)      # (W, 1)

    # exp weight folded into the ONE-HOT side: (W, C) orientation keeps
    # every stat sublane-major; the (W, C) f32 select+cast is one pass
    ohw = jnp.where(ohT, e, 0.0).astype(g_ref.dtype)
    part = jnp.dot(ohw, g_ref[0], preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        out_ref[:] = part
        m_ref[:] = m_c
        z_ref[:] = z_c

    @pl.when(jnp.logical_not(first))
    def _():
        r_old = jnp.where(jnp.isfinite(m_old),
                          jnp.exp(m_old - m_safe), 0.0)          # (W, 1)
        out_ref[:] = out_ref[:] * r_old + part
        m_ref[:] = m_new
        z_ref[:] = z_ref[:] * r_old + z_c


def _flash_kernel_scalar(chunk_block_ref, lr_lane_ref, g_ref, xd_ref,
                         out_ref, m_ref, z_ref):
    """Scalar-chunk-max variant: the stabilizing max is one scalar per
    chunk (the chunk's score max) instead of per dst row — three fewer
    masked (W, C) passes.  exp(s - M_chunk) <= 1 for every edge of the
    chunk, so accumulation cannot overflow; a row whose scores sit more
    than ~80 below the block max underflows its weights to 0 (acceptable
    for any realistically-scaled scores; the exact per-row variant exists
    for the rest)."""
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    lr = lr_lane_ref[0]                                  # (1, C)
    W = out_ref.shape[0]
    C = lr.shape[-1]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    ohT = iota_w == lr                                   # (W, C)

    P2 = jax.lax.dot_general(
        xd_ref[:], g_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (W, C)
    s = jnp.where(ohT, P2, 0.0).sum(axis=0, keepdims=True)       # (1, C)
    # pad lanes (lr == W) have empty one-hot columns -> s = 0; mask them
    # out of the chunk max with the lr sentinel
    valid = lr < W                                       # (1, C)
    M = jnp.max(jnp.where(valid, s, NEG_INF))            # scalar
    M = jnp.where(jnp.isfinite(M), M, 0.0)
    e = jnp.where(valid, jnp.exp(s - M), 0.0)            # (1, C)
    z_c = jnp.where(ohT, e, 0.0).sum(axis=1, keepdims=True)      # (W, 1)
    ohw = jnp.where(ohT, e, 0.0).astype(g_ref.dtype)
    part = jnp.dot(ohw, g_ref[0], preferred_element_type=jnp.float32)

    m_c = jnp.full((W, 1), M, jnp.float32)

    @pl.when(first)
    def _():
        out_ref[:] = part
        m_ref[:] = m_c
        z_ref[:] = z_c

    @pl.when(jnp.logical_not(first))
    def _():
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, m_c)
        r_old = jnp.exp(m_old - m_new)                   # (W, 1)
        r_c = jnp.exp(m_c - m_new)
        out_ref[:] = out_ref[:] * r_old + part * r_c
        m_ref[:] = m_new
        z_ref[:] = z_ref[:] * r_old + z_c * r_c


def attend_blocked_flash(b: BlockedCsr, x_dst: jax.Array, x_src: jax.Array,
                         *, scale: float | None = None,
                         compute_dtype=jnp.bfloat16,
                         row_stats: bool = True,
                         interpret: bool = False) -> jax.Array:
    """softmax(<x_dst, x_src>*scale)-weighted aggregation in ONE kernel.

    Same semantics as :func:`attend_blocked` / :func:`attend_blocked_fused`
    but the gathered (T, C, F) tensor is read exactly ONCE: scores, online
    softmax stats and the exp-weighted MXU contraction all happen in a
    single traversal with a flash-attention-style rescaled output
    accumulator; the final per-row ``/ z`` runs outside in XLA.

    ``row_stats=False`` stabilizes with one scalar max per chunk instead
    of per-row running maxima (fewer masked passes; weights of rows ~80
    log-units below the block max underflow to 0)."""
    W = b.rows_per_block
    T, C = b.edge_src.shape
    F = x_src.shape[-1]
    B = b.num_blocks
    assert C % 128 == 0 and W % 128 == 0
    sc = float(scale if scale is not None else 1.0 / (F ** 0.5))

    g = x_src.astype(compute_dtype)[b.edge_src]          # THE gather
    xd = _pad_dst(b, (x_dst * sc).astype(compute_dtype))
    lr_lane = b.edge_local_row.reshape(T, 1, C)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, F), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((W, F), lambda t, cb: (cb[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((W, F), lambda t, cb: (cb[t], 0)),
            pl.BlockSpec((W, 1), lambda t, cb: (cb[t], 0)),
            pl.BlockSpec((W, 1), lambda t, cb: (cb[t], 0)),
        ],
    )
    kernel = _flash_kernel_row if row_stats else _flash_kernel_scalar
    out, _m, z = pl.pallas_call(
        kernel,
        grid_spec=grid,
        out_shape=[jax.ShapeDtypeStruct((B * W, F), jnp.float32),
                   jax.ShapeDtypeStruct((B * W, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B * W, 1), jnp.float32)],
        interpret=interpret,
    )(b.chunk_block, lr_lane, g, xd)
    # 1e-38 flushes to zero under FTZ (subnormal f32): guard explicitly
    return jnp.where(z > 0, out / jnp.maximum(z, 1e-20),
                     0.0)[: b.num_rows]


def attend_blocked_fused(b: BlockedCsr, x_dst: jax.Array, x_src: jax.Array,
                         *, scale: float | None = None,
                         compute_dtype=jnp.bfloat16,
                         interpret: bool = False) -> jax.Array:
    """:func:`attend_blocked` in TWO kernels instead of four.

    Pass A computes the scaled SDDMM scores and the online softmax stats in
    one traversal; pass B normalizes and folds the attention weight
    straight into the one-hot MXU contraction.  Same semantics, two fewer
    passes over the edge list and no materialized attention tensor; the
    gathered (T, C, F) tensor is read exactly twice (once per kernel)
    after a single random gather."""
    W = b.rows_per_block
    T, C = b.edge_src.shape
    F = x_src.shape[-1]
    B = b.num_blocks
    assert C % 128 == 0 and W % 128 == 0
    sc = float(scale if scale is not None else 1.0 / (F ** 0.5))

    # fold the scale into the dst operand: scores leave pass A pre-scaled
    g = x_src.astype(compute_dtype)[b.edge_src]          # THE gather
    xd = _pad_dst(b, (x_dst * sc).astype(compute_dtype))
    lr_sub = b.edge_local_row.reshape(T, C, 1)
    lr3 = b.edge_local_row.reshape(T, C // 128, 128)

    grid_a = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, F), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((W, F), lambda t, cb: (cb[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, 1), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, 1, W), lambda t, cb: (cb[t], 0, 0)),
            pl.BlockSpec((1, 1, W), lambda t, cb: (cb[t], 0, 0)),
        ],
    )
    s, m, z = pl.pallas_call(
        _sddmm_mz_kernel,
        grid_spec=grid_a,
        out_shape=[jax.ShapeDtypeStruct((T, C, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, W), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, W), jnp.float32)],
        interpret=interpret,
    )(b.chunk_block, lr_sub, g, xd)

    grid_b = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C, 1), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C // 128, 128), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, 1), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, 1, W), lambda t, cb: (cb[t], 0, 0)),
            pl.BlockSpec((1, 1, W), lambda t, cb: (cb[t], 0, 0)),
            pl.BlockSpec((1, C, F), lambda t, cb: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((W, F), lambda t, cb: (cb[t], 0)),
    )
    out = pl.pallas_call(
        _att_w_fused_kernel,
        grid_spec=grid_b,
        out_shape=jax.ShapeDtypeStruct((B * W, F), jnp.float32),
        interpret=interpret,
    )(b.chunk_block, lr_sub, lr3, s, m, z, g)
    return out[: b.num_rows]
