"""Kernel-only timing of the blocked attention stages (pre-gathered input).

The on-chip attention stages run ~3x their gather floor while plain SpMM
runs at ~1.09x (scripts/bench_attention.py).  This isolates the Pallas
kernels from the gather: every variant takes the SAME pre-gathered
(T, C, F) tensor from HBM, so differences are pure kernel cost.

  A  plain one-hot matmul            (the fast spmm kernel)
  B  weight folded into gathered g   (current weighted kernel)
  C  weight folded into one-hot      (previous weighted kernel)
  D  NT-matmul SDDMM                 (current sddmm kernel)
  E  read-only baseline              (touch g, write (W,F) tile)

Run: python scripts/micro_attention_kernels.py
"""
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

N = 1 << 18
E = 1 << 22
F = 128
K = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps=3):
    f = jax.jit(fn)
    t0 = time.time()
    float(f(*args))
    cs = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K, cs


def main():
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    dst = rng.integers(0, N, E, dtype=np.int64)
    src = rng.integers(0, N, E, dtype=np.int64)
    order = np.argsort(dst, kind="stable")
    dst, src = dst[order], src[order]
    indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int32)
    b = build_blocked(indptr, src.astype(np.int32), rows_per_block=128)
    T, C = b.edge_src.shape
    W = b.rows_per_block
    B = b.num_blocks
    log(f"T={T} C={C}")

    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g = x.astype(jnp.bfloat16)[b.edge_src]               # pre-gathered
    wts = jnp.asarray(rng.random((T, C)).astype(np.float32))
    lr3 = b.edge_local_row.reshape(T, C // 128, 128)
    lr_sub = b.edge_local_row.reshape(T, C, 1)
    cb = b.chunk_block

    def acc_tail(first, out_ref, part):
        @pl.when(first)
        def _():
            out_ref[:] = part

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[:] = out_ref[:] + part

    def firstness():
        t = pl.program_id(0)
        return t, None

    def k_plain(cb_ref, lr_ref, g_ref, out_ref):
        t = pl.program_id(0)
        first = jnp.logical_or(t == 0, cb_ref[t] != cb_ref[jnp.maximum(t - 1, 0)])
        lr = lr_ref[0].reshape(-1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
        oh = (iota == lr[None, :]).astype(g_ref.dtype)
        part = jnp.dot(oh, g_ref[0], preferred_element_type=jnp.float32)
        acc_tail(first, out_ref, part)

    def k_w_in_g(cb_ref, lr_ref, w_ref, g_ref, out_ref):
        t = pl.program_id(0)
        first = jnp.logical_or(t == 0, cb_ref[t] != cb_ref[jnp.maximum(t - 1, 0)])
        lr = lr_ref[0].reshape(-1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
        oh = (iota == lr[None, :]).astype(g_ref.dtype)
        g2 = (g_ref[0].astype(jnp.float32) * w_ref[0]).astype(g_ref.dtype)
        part = jnp.dot(oh, g2, preferred_element_type=jnp.float32)
        acc_tail(first, out_ref, part)

    def k_w_in_oh(cb_ref, lr_ref, w_ref, g_ref, out_ref):
        t = pl.program_id(0)
        first = jnp.logical_or(t == 0, cb_ref[t] != cb_ref[jnp.maximum(t - 1, 0)])
        lr = lr_ref[0].reshape(-1)
        w = w_ref[0, 0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
        oh = jnp.where(iota == lr[None, :], w[None, :], 0.0).astype(g_ref.dtype)
        part = jnp.dot(oh, g_ref[0], preferred_element_type=jnp.float32)
        acc_tail(first, out_ref, part)

    def k_sddmm(cb_ref, lrs_ref, g_ref, xd_ref, out_ref):
        P = jax.lax.dot_general(
            g_ref[0], xd_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        lr = lrs_ref[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
        s = jnp.where(iota == lr, P, 0.0).sum(axis=1, keepdims=True)
        out_ref[0] = s

    def k_touch(cb_ref, lr_ref, g_ref, out_ref):
        t = pl.program_id(0)
        first = jnp.logical_or(t == 0, cb_ref[t] != cb_ref[jnp.maximum(t - 1, 0)])
        part = jnp.sum(g_ref[0].astype(jnp.float32), axis=0,
                       keepdims=True) * jnp.ones((W, 1), jnp.float32)
        acc_tail(first, out_ref, part)

    spec_lr = pl.BlockSpec((1, C // 128, 128), lambda t, cb_: (t, 0, 0))
    spec_lrs = pl.BlockSpec((1, C, 1), lambda t, cb_: (t, 0, 0))
    spec_w2 = pl.BlockSpec((1, C, 1), lambda t, cb_: (t, 0, 0))
    spec_w1 = pl.BlockSpec((1, 1, C), lambda t, cb_: (t, 0, 0))
    spec_g = pl.BlockSpec((1, C, F), lambda t, cb_: (t, 0, 0))
    spec_out = pl.BlockSpec((W, F), lambda t, cb_: (cb_[t], 0))
    spec_xd = pl.BlockSpec((W, F), lambda t, cb_: (cb_[t], 0))

    def run(kernel, specs, outshape, *inputs):
        gridspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(T,), in_specs=specs,
            out_specs=outshape[0])
        def f(*a):
            def body(c, _):
                out = pl.pallas_call(kernel, grid_spec=gridspec,
                                     out_shape=outshape[1])(*a)
                return c + out.sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c
        return timed(f, cb, *inputs)

    out_wf = (spec_out, jax.ShapeDtypeStruct((B * W, F), jnp.float32))
    out_c1 = (pl.BlockSpec((1, C, 1), lambda t, cb_: (t, 0, 0)),
              jax.ShapeDtypeStruct((T, C, 1), jnp.float32))

    dt, cs = run(k_plain, [spec_lr, spec_g], out_wf, lr3, g)
    log(f"A plain one-hot matmul : {dt*1e3:7.2f} ms (compile {cs:.0f}s)")
    dt, cs = run(k_touch, [spec_lr, spec_g], out_wf, lr3, g)
    log(f"E read-only baseline   : {dt*1e3:7.2f} ms (compile {cs:.0f}s)")
    dt, cs = run(k_w_in_g, [spec_lr, spec_w2, spec_g], out_wf, lr3,
                 wts.reshape(T, C, 1), g)
    log(f"B weight in gathered g : {dt*1e3:7.2f} ms (compile {cs:.0f}s)")
    dt, cs = run(k_w_in_oh, [spec_lr, spec_w1, spec_g], out_wf, lr3,
                 wts.reshape(T, 1, C), g)
    log(f"C weight in one-hot    : {dt*1e3:7.2f} ms (compile {cs:.0f}s)")
    xd = jnp.zeros((B * W, F), jnp.bfloat16)
    dt, cs = run(k_sddmm, [spec_lrs, spec_g, spec_xd], out_c1, lr_sub, g, xd)
    log(f"D NT sddmm             : {dt*1e3:7.2f} ms (compile {cs:.0f}s)")


if __name__ == "__main__":
    main()
