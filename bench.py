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
    graph = build_blocked(indptr, indices, rows_per_block=128)
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

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f_chain(graph, x))    # host fetch = true barrier
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / K
    log(f"tpu spmm {dt*1e3:.2f} ms/iter -> {E/dt/1e9:.2f} Gedge/s")
    return E / dt


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


def main():
    indptr, indices = build_graph()
    try:
        baseline = bench_torch_cpu(indptr, indices)
    except Exception as e:  # torch missing/failed: fall back to 1 edge/ns ref
        log(f"torch baseline failed: {e}")
        baseline = None
    value = bench_tpu(indptr, indices)
    vs = (value / baseline) if baseline else 0.0
    print(json.dumps({
        "metric": "spmm_edges_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
