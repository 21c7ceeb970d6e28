"""Chunk-size / padding sweep for spmm_blocked_pallas on the bench graph.

The gather is 82% of kernel time and its cost is proportional to padded
edge count (T*C), so padding ratio is the lever: sweep chunk_edges and the
source-locality sort to find the best default.
"""
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from tch_geometric_tpu.ops.spmm_blocked import build_blocked
from tch_geometric_tpu.ops.spmm_pallas import spmm_blocked_pallas

N = 1 << 18
E = 1 << 22
F = 128
K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


rng = np.random.default_rng(0)
dst = rng.integers(0, N, E, dtype=np.int64)
src = rng.integers(0, N, E, dtype=np.int64)
order = np.argsort(dst, kind="stable")
dst, src = dst[order], src[order]
indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int32)
indices = src.astype(np.int32)

x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))


def timeit(name, b):
    @jax.jit
    def f(b, x):
        def body(h, _):
            return spmm_blocked_pallas(b, h, agg="mean").astype(jnp.float32), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.sum()

    t0 = time.time()
    float(f(b, x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(b, x))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / K
    pad = b.num_chunks * b.chunk_edges / E
    log(f"{name:28s} T={b.num_chunks:5d} C={b.chunk_edges:5d} pad={pad:.3f} "
        f"-> {dt*1e3:6.2f} ms  {E/dt/1e9:6.3f} Gedge/s")
    return dt


for C in (2176, 2304, 2560, 4608, 9216):
    b = build_blocked(indptr, indices, rows_per_block=128, chunk_edges=C)
    timeit(f"W=128 C={C} sorted", b)

b = build_blocked(indptr, indices, rows_per_block=128, chunk_edges=2176,
                  sort_chunk_sources=False)
timeit("W=128 C=2176 unsorted", b)

# W=256 halves block count and block-boundary padding, doubles one-hot FLOPs
for C in (4352, 4608):
    b = build_blocked(indptr, indices, rows_per_block=256, chunk_edges=C)
    timeit(f"W=256 C={C} sorted", b)
