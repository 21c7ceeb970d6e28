"""Pallas TPU kernel for the blocked-ELL SpMM contraction.

Replaces the XLA tail of ``spmm_blocked`` (batched one-hot matmul ->
(T, W, F) partials -> cumsum -> block diff) with a single kernel:

* grid over chunks; the destination OUTPUT block for chunk ``t`` is chosen
  by a scalar-prefetched ``chunk_block`` array (PrefetchScalarGridSpec) —
  consecutive chunks of the same row block revisit the same VMEM output
  tile and accumulate in place, so the (T, W, F) partial tensor and the
  log-depth cumsum never touch HBM at all.
* the one-hot matrix is materialised only in VMEM, per chunk, from the
  (C,) local-row ids, and contracted on the MXU.

Inputs are the XLA-gathered source rows (the gather remains XLA's — its
random-row DMA engine is the practical limit; see BASELINE.md).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_blocked import BlockedCsr


def _kernel(chunk_block_ref, lr_ref, g_ref, out_ref):
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    lr = lr_ref[0].reshape(-1)                       # (C,) int32
    W = out_ref.shape[0]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, lr.shape[0]), 0)
    oh = (iota_w == lr[None, :]).astype(g_ref.dtype)  # (W, C) in VMEM only
    part = jnp.dot(oh, g_ref[0], preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        out_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + part


def spmm_blocked_pallas(b: BlockedCsr, x: jax.Array, *, agg: str = "sum",
                        compute_dtype=jnp.bfloat16,
                        interpret: bool = False) -> jax.Array:
    """Scatter-free SpMM with the Pallas accumulation kernel.

    Exact same semantics as ``spmm_blocked``; the gather is XLA, the
    contraction + block accumulation is the kernel above.
    """
    W = b.rows_per_block
    T, C = b.edge_src.shape
    F = x.shape[-1]
    B = b.num_blocks

    with jax.named_scope("spmm.gather"):
        g = x.astype(compute_dtype)[b.edge_src]      # (T, C, F) XLA gather

    # TPU block shapes: last two dims must tile to (8, 128) or equal the
    # array dims — reshape the (T, C) int32 local rows to (T, C/128, 128)
    # and take the full trailing dims per chunk.
    assert C % 128 == 0, "chunk_edges must be a multiple of 128"
    lr3 = b.edge_local_row.reshape(T, C // 128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C // 128, 128), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, F), lambda t, cb: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((W, F), lambda t, cb: (cb[t], 0)),
    )
    with jax.named_scope("spmm.contract"):
        out = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B * W, F), jnp.float32),
            interpret=interpret,
        )(b.chunk_block, lr3, g)

    out = out[: b.num_rows]
    if agg == "mean":
        out = out / jnp.maximum(b.degree, 1)[:, None].astype(out.dtype)
    elif agg != "sum":
        raise ValueError(f"unsupported agg {agg!r}")
    return out


def spmm_blocked_auto(b: BlockedCsr, x: jax.Array, *, agg: str = "sum",
                      compute_dtype=jnp.bfloat16) -> jax.Array:
    """Pallas kernel on TPU; XLA blocked path elsewhere."""
    from .spmm_blocked import spmm_blocked
    if jax.default_backend() == "tpu" and b.chunk_edges % 128 == 0:
        return spmm_blocked_pallas(b, x, agg=agg, compute_dtype=compute_dtype)
    return spmm_blocked(b, x, agg=agg, compute_dtype=compute_dtype)


def spmm_blocked_segmented(seg, x: jax.Array, *, agg: str = "sum",
                           compute_dtype=jnp.bfloat16,
                           out_dtype=jnp.float32,
                           interpret: bool = False) -> jax.Array:
    """Memory-bounded full-graph SpMM over a ``SegmentedBlockedCsr``.

    ``lax.scan`` over segments: each step gathers + contracts ONE segment
    (peak intermediate O(E/S * F) instead of O(E * F), which at
    ogbn-products scale with F=256 is the difference between ~0.5 GB and
    ~16 GB).  Segments are equal block ranges, so stacked partials reshape
    directly into the output; exact same semantics as ``spmm_blocked``.

    When ``seg.edge_weight`` is present (0 on pad lanes) each edge's
    contribution is scaled by it — the weighted Pallas kernel on TPU, the
    XLA blocked path elsewhere.
    """
    from .attention_blocked import spmm_blocked_weighted_pallas
    from .spmm_blocked import spmm_blocked

    W = seg.rows_per_block
    Bp = seg.blocks_per_segment
    S = seg.num_segments
    on_tpu = (jax.default_backend() == "tpu" and not interpret
              and seg.chunk_edges % 128 == 0)

    def body(_, inp):
        es, lr, cb, bs = inp[:4]
        b = BlockedCsr(
            edge_src=es, edge_local_row=lr, edge_valid=None,
            chunk_block=cb, block_start=bs, degree=None, edge_ptr=None,
            num_rows=Bp * W, rows_per_block=W, chunk_edges=seg.chunk_edges)
        if seg.edge_weight is None:
            out = spmm_blocked_auto(b, x, agg="sum",
                                    compute_dtype=compute_dtype)
        elif on_tpu:
            out = spmm_blocked_weighted_pallas(b, x, inp[4],
                                               compute_dtype=compute_dtype)
        else:
            out = spmm_blocked(b, x, agg="sum", edge_weight=inp[4],
                               compute_dtype=compute_dtype)
        return None, out.astype(out_dtype)

    xs = (seg.edge_src, seg.edge_local_row, seg.chunk_block, seg.block_start)
    if seg.edge_weight is not None:
        xs = xs + (seg.edge_weight,)
    _, outs = jax.lax.scan(body, None, xs)
    out = outs.reshape(S * Bp * W, -1)[: seg.num_rows]
    if agg == "mean":
        out = out / jnp.maximum(seg.degree, 1)[:, None].astype(out.dtype)
    elif agg != "sum":
        raise ValueError(f"unsupported agg {agg!r}")
    return out


def spmm_hot_split(hs, x: jax.Array, *, agg: str = "sum",
                   compute_dtype=jnp.bfloat16,
                   interpret: bool = False) -> jax.Array:
    """Hot/cold split SpMM over a :class:`~.spmm_blocked.HotSplitCsr`.

    Cold edges run the standard blocked kernel against the full feature
    table; hot edges (deduped per (row, hot source), multiplicity as an
    edge weight) run the weighted kernel against the compact
    ``x[hot_ids]`` table (one cheap K-row gather).  Exact same result as
    ``spmm_blocked`` on the unsplit graph, fewer and faster row fetches
    on power-law graphs (see HotSplitCsr).
    """
    from .attention_blocked import spmm_blocked_weighted_pallas
    from .spmm_blocked import spmm_blocked

    on_tpu = jax.default_backend() == "tpu" and not interpret
    if on_tpu:
        cold = spmm_blocked_pallas(hs.cold, x, agg="sum",
                                   compute_dtype=compute_dtype)
    else:
        cold = spmm_blocked(hs.cold, x, agg="sum",
                            compute_dtype=compute_dtype)
    x_hot = x[hs.hot_ids]                        # (K, F): small fast table
    if on_tpu or interpret:
        hot = spmm_blocked_weighted_pallas(hs.hot, x_hot, hs.hot_count,
                                           compute_dtype=compute_dtype,
                                           interpret=interpret)
    else:
        hot = spmm_blocked(hs.hot, x_hot, agg="sum",
                           edge_weight=hs.hot_count,
                           compute_dtype=compute_dtype)
    n = hs.num_rows
    out = cold[:n] + hot[:n]
    if agg == "mean":
        out = out / jnp.maximum(hs.degree, 1)[:, None].astype(out.dtype)
    elif agg != "sum":
        raise ValueError(f"unsupported agg {agg!r}")
    return out


def spmm_hot_split_segmented(hs, x: jax.Array, *, agg: str = "sum",
                             compute_dtype=jnp.bfloat16,
                             out_dtype=jnp.float32,
                             interpret: bool = False) -> jax.Array:
    """Full-graph hot/cold split SpMM over a ``HotSplitSeg`` — the
    products-scale variant of :func:`spmm_hot_split` (bounded gathered
    intermediate via the segmented scan in both halves)."""
    cold = spmm_blocked_segmented(hs.cold, x, agg="sum",
                                  compute_dtype=compute_dtype,
                                  out_dtype=out_dtype, interpret=interpret)
    x_hot = x[hs.hot_ids]
    hot = spmm_blocked_segmented(hs.hot, x_hot, agg="sum",
                                 compute_dtype=compute_dtype,
                                 out_dtype=out_dtype, interpret=interpret)
    n = hs.num_rows
    out = cold[:n] + hot[:n]
    if agg == "mean":
        out = out / jnp.maximum(hs.degree, 1)[:, None].astype(out.dtype)
    elif agg != "sum":
        raise ValueError(f"unsupported agg {agg!r}")
    return out


def quantize_rows(x: jax.Array):
    """Per-row symmetric int8 quantization: returns (q int8, scale f32)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = (amax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / jnp.maximum(scale, 1e-12)), -127, 127)
    return q.astype(jnp.int8), scale[..., 0]


def _kernel_q8(chunk_block_ref, lr_ref, sc_ref, q_ref, out_ref):
    t = pl.program_id(0)
    blk = chunk_block_ref[t]
    prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, blk != prev_blk)

    lr = lr_ref[0].reshape(-1)                        # (C,)
    sc = sc_ref[0].reshape(-1)                        # (C,) f32 row scales
    W = out_ref.shape[0]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, lr.shape[0]), 0)
    # fold the dequant scale into the one-hot side: sum_c oh*s_c * q_c
    oh = jnp.where(iota_w == lr[None, :], sc[None, :], 0.0).astype(jnp.bfloat16)
    g = q_ref[0].astype(jnp.bfloat16)                 # int8 -> bf16 in VMEM
    part = jnp.dot(oh, g, preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        out_ref[:] = part

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + part


def spmm_blocked_pallas_q8(b: BlockedCsr, q: jax.Array, row_scale: jax.Array,
                           *, agg: str = "sum",
                           interpret: bool = False) -> jax.Array:
    """Int8-quantized scatter-free SpMM (EXPERIMENTAL).

    ``q``/``row_scale`` from :func:`quantize_rows`; the dequant scale is
    folded into the one-hot operand so accuracy is ~0.6% max relative.

    Measured on v5e: int8 random-row gathers are several times SLOWER than
    bf16 (128 B rows fall far below the gather access granularity), so this
    path currently loses to ``spmm_blocked_pallas`` (81 ms vs 15 ms at
    E=4M, F=128) — kept as the ready path for hardware/XLA versions with
    efficient narrow gathers.  See BASELINE.md.
    """
    W = b.rows_per_block
    T, C = b.edge_src.shape
    F = q.shape[-1]
    B = b.num_blocks
    assert C % 128 == 0, "chunk_edges must be a multiple of 128"

    gq = q[b.edge_src]                                # (T, C, F) int8 gather
    gs = row_scale[b.edge_src]                        # (T, C) f32 gather
    lr3 = b.edge_local_row.reshape(T, C // 128, 128)
    sc3 = gs.reshape(T, C // 128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, C // 128, 128), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C // 128, 128), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, F), lambda t, cb: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((W, F), lambda t, cb: (cb[t], 0)),
    )
    out = pl.pallas_call(
        _kernel_q8,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * W, F), jnp.float32),
        interpret=interpret,
    )(b.chunk_block, lr3, sc3, gq)

    out = out[: b.num_rows]
    if agg == "mean":
        out = out / jnp.maximum(b.degree, 1)[:, None].astype(out.dtype)
    elif agg != "sum":
        raise ValueError(f"unsupported agg {agg!r}")
    return out
