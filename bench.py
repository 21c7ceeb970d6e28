"""Headline benchmark: CSR SpMM edges/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over the measured torch-CPU sparse-mm
equivalent of the reference's downstream aggregation path (the reference
itself publishes no numbers and its Rust sampler cannot run here —
BASELINE.md), measured on this machine.

Synthetic workload: N=262144 nodes, E=4M edges (avg deg 16), F=128 fp32 —
the SAGE mean-aggregation shape class of BASELINE config 3.
"""
import json
import sys
import time

import numpy as np

# Persistent compilation cache: the axon tunnel compile service is slow and
# occasionally produces pathological executables; caching makes repeat runs
# fast and deterministic.
import jax as _jax_for_cache
_jax_for_cache.config.update("jax_compilation_cache_dir",
                             "/tmp/jax_cache_tpu")
_jax_for_cache.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


N = 1 << 18          # 262144
E = 1 << 22          # 4,194,304
F = 128
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_graph():
    rng = np.random.default_rng(0)
    dst = rng.integers(0, N, E, dtype=np.int64)
    src = rng.integers(0, N, E, dtype=np.int64)
    order = np.argsort(dst, kind="stable")
    dst, src = dst[order], src[order]
    indptr = np.searchsorted(dst, np.arange(N + 1))
    return indptr.astype(np.int32), src.astype(np.int32)


def bench_tpu(indptr, indices):
    import jax
    import jax.numpy as jnp
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked
    from tch_geometric_tpu.ops.spmm_pallas import spmm_blocked_auto

    log(f"devices: {jax.devices()}")
    graph = build_blocked(indptr, indices, rows_per_block=256)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(N, F)).astype(np.float32))

    # K data-dependent chained iterations inside ONE jit, ending in a scalar
    # fetched to host: defeats async dispatch (block_until_ready on a remote
    # buffer does not guarantee execution completed through the tunnel).
    K = ITERS

    @jax.jit
    def f_chain(g, x):
        def body(h, _):
            return spmm_blocked_auto(g, h, agg="mean").astype(jnp.float32), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.sum()

    t0 = time.time()
    float(f_chain(graph, x))
    log(f"compile+first run: {time.time()-t0:.1f}s")

    from tch_geometric_tpu.utils.metrics import MetricsLogger
    mlog = MetricsLogger()          # JSON-lines per-step metrics on stderr
    mlog.step(0)
    times = []
    for it in range(3):
        t0 = time.perf_counter()
        float(f_chain(graph, x))    # host fetch = true barrier
        times.append(time.perf_counter() - t0)
        mlog.step(it + 1, edges=E * K)
    dt = float(np.median(times)) / K
    log(f"tpu spmm {dt*1e3:.2f} ms/iter -> {E/dt/1e9:.2f} Gedge/s")

    # Measured speed-of-light for THIS access pattern: the pure gather of
    # the kernel's exact padded row-fetch multiset.  scripts/
    # bench_spmm_roofline.py establishes the wall is the gather engine's
    # per-access issue rate (~380 Macc/s at 256 B rows) — invariant to
    # index randomness (sequential == random), table size (4 MB..64 MB)
    # and hot-prefix concentration, and NOT parallelizable across gather
    # ops (two half-gathers are 2.5x slower).  No gather-based SpMM can
    # exceed it; the fraction below is the honest roofline.
    padded_idx = graph.edge_src.reshape(-1)
    xb = x.astype(jnp.bfloat16)

    @jax.jit
    def g_floor(xb, idx):
        def body(c, _):
            shift = jnp.int32(jnp.abs(c)) % N
            return xb[(idx + shift) % N].sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    float(g_floor(xb, padded_idx))
    tf = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g_floor(xb, padded_idx))
        tf.append(time.perf_counter() - t0)
    dtf = float(np.median(tf)) / K
    frac = dtf / dt
    log(f"gather wall {dtf*1e3:.2f} ms/iter ({padded_idx.shape[0]/dtf/1e6:.0f}"
        f" Macc/s) -> kernel at {frac*100:.1f}% of measured speed-of-light")
    return E / dt, frac


def bench_torch_cpu(indptr, indices):
    import torch
    torch.set_num_threads(max(torch.get_num_threads(), 2))
    crow = torch.from_numpy(indptr.astype(np.int64))
    col = torch.from_numpy(indices.astype(np.int64))
    vals = torch.ones(E, dtype=torch.float32)
    A = torch.sparse_csr_tensor(crow, col, vals, size=(N, N))
    x = torch.randn(N, F)
    # warmup + 3 timed iters
    y = A @ x
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = A @ x
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    log(f"torch cpu spmm median {dt*1e3:.1f} ms -> {E/dt/1e9:.3f} Gedge/s")
    return E / dt


def run_kernel_gates():
    """On-chip numerical gates (VERDICT r3 item 2): every Pallas kernel vs
    the XLA segment-op reference ON THE HARDWARE THIS BENCH TIMES.
    interpret-mode tests cannot catch real-Mosaic lowering divergence — the
    recurring bug class documented in BASELINE.md's attention fix history.
    Returns (errs_f32, errs_bf16, all_pass)."""
    import jax.numpy as jnp
    from tch_geometric_tpu.utils.kernel_gates import (BF16_THRESHOLD,
                                                      F32_THRESHOLD, gate,
                                                      run_kernel_gates as rg)
    t0 = time.time()
    errs_f32 = rg(compute_dtype=jnp.float32)
    ok32, worst32 = gate(errs_f32, F32_THRESHOLD)
    errs_bf16 = rg(compute_dtype=jnp.bfloat16)
    ok16, worst16 = gate(errs_bf16, BF16_THRESHOLD)
    log(f"kernel gates ({time.time()-t0:.0f}s): f32 worst {worst32} "
        f"(thr {F32_THRESHOLD}), bf16 worst {worst16} (thr {BF16_THRESHOLD})")
    if not (ok32 and ok16):
        log(f"KERNEL GATE FAILURE: f32={errs_f32} bf16={errs_bf16}")
    return errs_f32, errs_bf16, bool(ok32 and ok16)


def main():
    indptr, indices = build_graph()
    try:
        baseline = bench_torch_cpu(indptr, indices)
    except Exception as e:  # torch missing/failed: fall back to 1 edge/ns ref
        log(f"torch baseline failed: {e}")
        baseline = None
    value, roofline_frac = bench_tpu(indptr, indices)
    try:
        errs_f32, errs_bf16, gates_pass = run_kernel_gates()
    except Exception as e:   # a gate crash is itself a red flag — report it
        log(f"kernel gates crashed: {e!r}")
        errs_f32, errs_bf16, gates_pass = {}, {}, False
    vs = (value / baseline) if baseline else 0.0
    print(json.dumps({
        "metric": "spmm_edges_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 2),
        "roofline_frac_of_measured_gather_wall": round(roofline_frac, 3),
        "kernel_gates_pass": gates_pass,
        "kernel_gate_max_abs_err_f32":
            {k: float(f"{v:.3e}") for k, v in errs_f32.items()},
        "kernel_gate_max_abs_err_bf16":
            {k: float(f"{v:.3e}") for k, v in errs_bf16.items()},
    }))


if __name__ == "__main__":
    main()
