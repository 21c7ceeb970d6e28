"""Stage-by-stage cost decomposition of the head-packed GAT kernel
(VERDICT r4 item 3: drive `gat_attend_blocked_packed` toward its 11.8 ms
aligned-gather floor, or bound each residual ms).

Cumulative kernel variants, all with IDENTICAL memory traffic (same
(T, C, H*D) gathered input blocks, same (W, H*D)+(W, H)x2 output tiles,
same accumulation pattern), enabling one compute stage at a time:

  S0  one-hot contraction only (oh @ g) — the spmm-shaped core
  S1  + in-kernel alpha_src projection ((C, H*D) @ (H*D, H))
  S2  + alpha_dst/claimed select (NT matmul vs the one-hot)
  S3  + leaky-relu + chunk-max stats + exp
  S4  + head-expansion (E @ (H, H*D) one-hot) + f32 rhs scale  == full

The deltas S1-S0, S2-S1, ... attribute the kernel's non-gather residual
(measured 9.3 ms at E=4.2M, H=4, D=32) to specific stages.  Run on TPU.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tch_geometric_tpu.ops.attention_blocked import (_pad_dst, NEG_INF)
from tch_geometric_tpu.ops.spmm_blocked import build_blocked

N, E, F = 262_144, 4_194_304, 128
H, D = 4, 32
NEG_SLOPE = 0.2


def make_stage_kernel(stage: int, heads: int):
    def kernel(chunk_block_ref, lr_lane_ref, g_ref, ad_ref, avec_ref,
               out_ref, m_ref, z_ref):
        t = pl.program_id(0)
        blk = chunk_block_ref[t]
        prev_blk = chunk_block_ref[jnp.maximum(t - 1, 0)]
        first = jnp.logical_or(t == 0, blk != prev_blk)
        Hh = heads
        g = g_ref[0]                                     # (C, H*D)
        lr = lr_lane_ref[0]                              # (1, C)
        W = ad_ref.shape[0]
        C = lr.shape[-1]
        Dd = g.shape[-1] // Hh
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
        ohT = iota_w == lr
        ohTf = ohT.astype(jnp.float32)

        z_extra = jnp.zeros((W, Hh), jnp.float32)
        E_w = None
        if stage == -1:
            # pure stream: read the gathered block, cheapest reduction,
            # same output tiles — the floor for ANY pallas consumer of the
            # materialized gather (gather writes 1.07 GB; kernel re-reads)
            part = jnp.broadcast_to(
                g.astype(jnp.float32).sum(axis=0, keepdims=True),
                (W, g.shape[-1]))

            @pl.when(first)
            def _():
                out_ref[:] = part
                m_ref[:] = jnp.zeros((W, Hh), jnp.float32)
                z_ref[:] = z_extra

            @pl.when(jnp.logical_not(first))
            def _():
                out_ref[:] = out_ref[:] + part
                z_ref[:] = z_ref[:] + z_extra
            return
        if stage >= 1:
            asrc = jax.lax.dot_general(
                g.astype(jnp.float32), avec_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (C, H)
            z_extra = z_extra + jnp.dot(ohTf, asrc,
                                        preferred_element_type=jnp.float32)
        if stage >= 2:
            adw = jnp.concatenate(
                [ad_ref[:], jnp.ones((W, 1), jnp.float32)], axis=1)
            sel = jax.lax.dot_general(
                ohTf, adw, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (C, H+1)
            ad_e = sel[:, :Hh]
            claimed = sel[:, Hh:]
        if stage >= 3:
            s = asrc + ad_e
            s = jnp.where(s > 0, s, NEG_SLOPE * s)
            s_m = jnp.where(claimed > 0, s, NEG_INF)
            M = jnp.max(s_m, axis=0, keepdims=True)
            M = jnp.where(jnp.isfinite(M), M, 0.0)
            E_w = jnp.where(claimed > 0, jnp.exp(s - M), 0.0)   # (C, H)
            z_extra = jnp.dot(ohTf, E_w, preferred_element_type=jnp.float32)
        if stage >= 4:
            col_head = jax.lax.broadcasted_iota(
                jnp.int32, (Hh, Hh * Dd), 1) // Dd
            head_row = jax.lax.broadcasted_iota(
                jnp.int32, (Hh, Hh * Dd), 0)
            expand = (col_head == head_row).astype(jnp.float32)
            e_wide = jnp.dot(E_w, expand,
                             preferred_element_type=jnp.float32)
            rhs = (g.astype(jnp.float32) * e_wide).astype(g.dtype)
        else:
            rhs = g
        part = jnp.dot(ohT.astype(g.dtype), rhs,
                       preferred_element_type=jnp.float32)      # (W, H*D)

        @pl.when(first)
        def _():
            out_ref[:] = part
            m_ref[:] = jnp.zeros((W, Hh), jnp.float32)
            z_ref[:] = z_extra

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:] = out_ref[:] + part
            z_ref[:] = z_ref[:] + z_extra

    return kernel


def run_stage(b, hw, ad, avec, *, stage):
    T, C = b.edge_src.shape
    B = b.num_blocks
    W = b.rows_per_block
    g = hw[b.edge_src]
    lr_lane = b.edge_local_row.reshape(T, 1, C)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((1, C, H * D), lambda t, cb: (t, 0, 0)),
            pl.BlockSpec((W, H), lambda t, cb: (cb[t], 0)),
            pl.BlockSpec((H * D, H), lambda t, cb: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((W, H * D), lambda t, cb: (cb[t], 0)),
            pl.BlockSpec((W, H), lambda t, cb: (cb[t], 0)),
            pl.BlockSpec((W, H), lambda t, cb: (cb[t], 0)),
        ],
    )
    out, m, z = pl.pallas_call(
        make_stage_kernel(stage, H),
        grid_spec=grid,
        out_shape=[jax.ShapeDtypeStruct((B * W, H * D), jnp.float32),
                   jax.ShapeDtypeStruct((B * W, H), jnp.float32),
                   jax.ShapeDtypeStruct((B * W, H), jnp.float32)],
    )(b.chunk_block, lr_lane, g, ad, avec)
    return out.sum() + z.sum()


def bench(fn, *args, iters=10):
    c = jax.jit(lambda *a: fn(*a))
    float(c(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            v = c(*args)
        jax.block_until_ready(v)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E)
    dst = np.sort(rng.integers(0, N, E))
    indptr = np.searchsorted(dst, np.arange(N + 1))
    b = build_blocked(indptr, src.astype(np.int64),
                      rows_per_block=128)
    hw = jnp.asarray(rng.normal(size=(N, H * D)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    ad = _pad_dst(b, jnp.asarray(
        rng.normal(size=(N, H)).astype(np.float32)))
    vec = rng.normal(size=(H, D)).astype(np.float32)     # GATv1 projection
    avec_np = np.zeros((H * D, H), np.float32)           # block-diag expand
    rows_i = np.arange(H * D)
    avec_np[rows_i, rows_i // D] = vec.reshape(-1)
    avec = jnp.asarray(avec_np)

    # reference rows
    idx = b.edge_src.reshape(-1)

    @jax.jit
    def gather_only(hw):
        return hw[idx].sum().astype(jnp.float32)

    t_g = bench(gather_only, hw)
    print(f"pure aligned gather: {t_g:.2f} ms")

    prev = None
    names = {-1: "S-1 pure kernel stream (gather + block re-read)",
             0: "S0 one-hot contraction", 1: "S1 + asrc projection",
             2: "S2 + alpha_dst select", 3: "S3 + stats/exp",
             4: "S4 + head-expand + f32 scale (full)"}
    for stage in range(-1, 5):
        t = bench(functools.partial(run_stage, b, stage=stage),
                  hw, ad, avec)
        delta = "" if prev is None else f"  (+{t - prev:.2f})"
        print(f"{names[stage]}: {t:.2f} ms{delta}", flush=True)
        prev = t

    from tch_geometric_tpu.ops.attention_blocked import (
        gat_attend_blocked_packed)
    vec_j = jnp.asarray(vec)
    t_full = bench(
        lambda hw: gat_attend_blocked_packed(
            b, hw.reshape(N, H, D), None, ad[:N], alpha_src_vec=vec_j,
            compute_dtype=jnp.bfloat16).sum(),
        hw)
    print(f"(real packed kernel end-to-end, for reference: {t_full:.2f} ms"
          " — includes XLA normalize epilogue)")


if __name__ == "__main__":
    main()
