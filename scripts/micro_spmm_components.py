"""Component timing of the blocked SpMM: where do the 18.5 ms go?

Measures, on the bench workload (N=262k, E=4.2M, F=128):
  * the raw bf16 row gather x[edge_src] alone (the presumed floor),
  * spmm_blocked_pallas at rows_per_block W in {128, 64, 32}
    (one-hot MXU FLOPs scale linearly with W),
  * the XLA blocked path for reference.

Each timed as K chained data-dependent iterations inside one jit ending in
a scalar fetch (true barrier through the axon tunnel).
"""
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from tch_geometric_tpu.ops.spmm_blocked import build_blocked, spmm_blocked
from tch_geometric_tpu.ops.spmm_pallas import spmm_blocked_pallas

N = 1 << 18
E = 1 << 22
F = 128
K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args):
    t0 = time.time()
    float(fn(*args))
    log(f"{name}: compile+run {time.time()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / K
    log(f"{name}: {dt*1e3:.2f} ms/iter  ({E/dt/1e9:.3f} Gedge/s)")
    return dt


rng = np.random.default_rng(0)
dst = rng.integers(0, N, E, dtype=np.int64)
src = rng.integers(0, N, E, dtype=np.int64)
order = np.argsort(dst, kind="stable")
dst, src = dst[order], src[order]
indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int32)
indices = src.astype(np.int32)

x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

results = {}

# --- raw gather floor -------------------------------------------------
g128 = build_blocked(indptr, indices, rows_per_block=128)
log(f"W=128: T={g128.num_chunks} C={g128.chunk_edges} "
    f"pad={(g128.num_chunks*g128.chunk_edges)/E:.3f}")


@jax.jit
def gather_only(b, x):
    def body(h, _):
        g = h.astype(jnp.bfloat16)[b.edge_src]          # (T, C, F)
        # cheap data-dependent reduction to chain iterations
        s = g[:, 0, :].astype(jnp.float32).sum(axis=0)  # (F,)
        return h.at[0].add(s * 1e-9), None
    h, _ = jax.lax.scan(body, x, None, length=K)
    return h.sum()


results["gather_only"] = timeit("gather(T,C,F) bf16", gather_only, g128, x)

for W in (128, 64, 32):
    b = build_blocked(indptr, indices, rows_per_block=W)
    log(f"W={W}: T={b.num_chunks} C={b.chunk_edges} "
        f"pad={(b.num_chunks*b.chunk_edges)/E:.3f}")

    @jax.jit
    def f_pallas(b, x):
        def body(h, _):
            return spmm_blocked_pallas(b, h, agg="mean").astype(jnp.float32), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.sum()

    results[f"pallas_W{W}"] = timeit(f"pallas W={W}", f_pallas, b, x)

@jax.jit
def f_xla(b, x):
    def body(h, _):
        return spmm_blocked(b, h, agg="mean").astype(jnp.float32), None
    h, _ = jax.lax.scan(body, x, None, length=K)
    return h.sum()

results["xla_blocked"] = timeit("xla blocked W=128", f_xla, g128, x)

log("---")
for k, v in results.items():
    log(f"{k:18s} {v*1e3:7.2f} ms  {E/v/1e9:6.3f} Gedge/s")
