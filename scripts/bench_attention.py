"""SDDMM / edge-softmax / attention benchmarks on the real chip.

VERDICT item 4: the blocked attention kernels (ops/attention_blocked.py)
had only run under interpret=True; this script compiles and times them on
TPU at the headline SpMM shape class (N=262k, E=4.19M random, F=128) plus
a 4-head GAT step, and reports each stage against the measured gather wall
(the same speed-of-light as SpMM — SDDMM and weighted SpMM each pay one
(T, C, F) source gather; see BASELINE.md roofline decomposition).

Matches: the aggregation+attention path the reference delegates to PyG
convs (/root/reference/examples/neighbor_sampling.py:21-24); north star
"SpMM/SDDMM at speed-of-light per chip".

Run: python scripts/bench_attention.py
"""
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, ".")

N = 1 << 18
E = 1 << 22
F = 128
H, DH = 4, 32     # GAT heads
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
    from tch_geometric_tpu.ops.attention_blocked import (
        attend_blocked, edge_softmax_blocked, gat_attend_blocked,
        sddmm_blocked_pallas, spmm_blocked_weighted_pallas)
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
    log(f"layout: T={T} C={C} pad={T*C/E:.3f}")

    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    hh = jnp.asarray(rng.normal(size=(N, H, DH)).astype(np.float32))
    a_src = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_dst = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))

    def chain(fn):
        # each iteration's inputs depend on the carry (an epsilon shift):
        # defeats CSE/hoisting so the timing reflects one full pipeline per
        # iteration, the same discipline as the roofline chains
        def run(*args):
            def body(c, _):
                out = fn(c * 1e-30)
                return (c + out).astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c
        return run

    import os
    only = set(filter(None, os.environ.get("BENCH_STAGES", "").split(",")))

    def want(name):
        return not only or name in only

    rows = []

    # SDDMM
    if want("sddmm"):
        dt, cs = timed(chain(lambda e: sddmm_blocked_pallas(b, x + e, x + e)
                             .sum()))
        rows.append(("sddmm", dt))
        log(f"sddmm               : {dt*1e3:7.2f} ms  {E/dt/1e9:6.3f} "
            f"Gedge/s (compile {cs:.0f}s)")

    if want("sddmm_v2"):
        from tch_geometric_tpu.ops.attention_blocked import (
            sddmm_blocked_pallas_v2)
        dt, cs = timed(chain(
            lambda e: sddmm_blocked_pallas_v2(b, x + e, x + e).sum()))
        rows.append(("sddmm_v2", dt))
        log(f"sddmm v2 (lane-maj) : {dt*1e3:7.2f} ms  {E/dt/1e9:6.3f} "
            f"Gedge/s (compile {cs:.0f}s)")

    # edge softmax over per-iteration-shifted scores
    if want("edge_softmax") or want("weighted_spmm"):
        s0 = sddmm_blocked_pallas(b, x, x)
    if want("edge_softmax"):
        dt, cs = timed(chain(lambda e: edge_softmax_blocked(b, s0 + e)
                             .sum()))
        rows.append(("edge_softmax", dt))
        log(f"edge_softmax        : {dt*1e3:7.2f} ms  {E/dt/1e9:6.3f} "
            f"Gedge/s (compile {cs:.0f}s)")

    # weighted SpMM
    if want("weighted_spmm"):
        att0 = edge_softmax_blocked(b, s0)
        dt, cs = timed(chain(
            lambda e: spmm_blocked_weighted_pallas(b, x + e, att0).sum()))
        rows.append(("weighted_spmm", dt))
        log(f"weighted_spmm       : {dt*1e3:7.2f} ms  {E/dt/1e9:6.3f} "
            f"Gedge/s (compile {cs:.0f}s)")

    # full transformer-style attention (SDDMM + softmax + weighted SpMM)
    if want("attend_full"):
        dt, cs = timed(chain(lambda e: attend_blocked(b, x + e, x + e)
                             .sum()))
        rows.append(("attend_full", dt))
        log(f"attend (full)       : {dt*1e3:7.2f} ms  {E/dt/1e9:6.3f} "
            f"Gedge/s (compile {cs:.0f}s)")

    # fused 2-kernel attend
    if want("attend_fused"):
        from tch_geometric_tpu.ops.attention_blocked import (
            attend_blocked_fused)
        dt, cs = timed(chain(lambda e: attend_blocked_fused(b, x + e, x + e)
                             .sum()))
        rows.append(("attend_fused", dt))
        log(f"attend (fused 2-krn): {dt*1e3:7.2f} ms  {E/dt/1e9:6.3f} "
            f"Gedge/s (compile {cs:.0f}s)")

    # ONE-kernel flash attend (single read of the gathered tensor)
    if want("attend_flash"):
        from tch_geometric_tpu.ops.attention_blocked import (
            attend_blocked_flash)
        for rs, tag in ((True, "row"), (False, "scalar")):
            dt, cs = timed(chain(
                lambda e, rs=rs: attend_blocked_flash(
                    b, x + e, x + e, row_stats=rs).sum()))
            rows.append((f"attend_flash_{tag}", dt))
            log(f"attend (flash {tag:6s}): {dt*1e3:7.2f} ms  "
                f"{E/dt/1e9:6.3f} Gedge/s (compile {cs:.0f}s)")

    # 4-head GAT aggregation
    if want("gat_4head"):
        dt, cs = timed(chain(
            lambda e: gat_attend_blocked(b, hh + e, a_src, a_dst).sum()))
        rows.append(("gat_4head", dt))
        log(f"gat 4-head (d=32)   : {dt*1e3:7.2f} ms  {E/dt/1e9:6.3f} "
            f"Gedge/s (compile {cs:.0f}s)")

    if want("gat_flash"):
        from tch_geometric_tpu.ops.attention_blocked import (
            gat_attend_blocked_flash)
        dt, cs = timed(chain(
            lambda e: gat_attend_blocked_flash(b, hh + e, a_src,
                                               a_dst).sum()))
        rows.append(("gat_flash", dt))
        log(f"gat 4-head (flash)  : {dt*1e3:7.2f} ms  {E/dt/1e9:6.3f} "
            f"Gedge/s (compile {cs:.0f}s)")

    if want("gat_packed"):
        from tch_geometric_tpu.ops.attention_blocked import (
            gat_attend_blocked_packed)
        dt, cs = timed(chain(
            lambda e: gat_attend_blocked_packed(b, hh + e, a_src,
                                                a_dst).sum()))
        rows.append(("gat_packed", dt))
        log(f"gat 4-head (packed) : {dt*1e3:7.2f} ms  {E/dt/1e9:6.3f} "
            f"Gedge/s (compile {cs:.0f}s)")

    # context: the gather wall for ONE (T, C, F) source fetch
    padded_idx = b.edge_src.reshape(-1)

    def g_floor(xb, idx):
        def body(c, _):
            shift = jnp.int32(jnp.abs(c)) % N
            return xb[(idx + shift) % N].sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    dtf, _ = timed(g_floor, xb, padded_idx)
    log(f"gather wall (1 pass): {dtf*1e3:7.2f} ms")
    for name, dt in rows:
        # attend_full pays ONE gather since the SDDMM/weighted kernels
        # share the pre-gathered (T, C, F) tensor (attention_blocked.py)
        gathers = {"sddmm": 1, "sddmm_v2": 1, "edge_softmax": 0,
                   "weighted_spmm": 1, "attend_full": 1, "attend_fused": 1,
                   "attend_flash_row": 1, "attend_flash_scalar": 1,
                   "gat_4head": 0, "gat_flash": 1, "gat_packed": 1}[name]
        if gathers:
            log(f"  {name}: {gathers*dtf/dt*100:.1f}% of its "
                f"{gathers}-gather floor")


if __name__ == "__main__":
    main()
