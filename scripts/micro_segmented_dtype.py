"""Products-scale segmented SpMM: f32 vs bf16 table, F=100 vs 128 vs 256."""
import time
import sys
import os

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tch_geometric_tpu.ops import build_blocked_segmented, spmm_blocked_segmented

K = 3
N, E, S = 2_449_029, 61_859_140, 32
rng = np.random.default_rng(0)
src = rng.integers(0, N, E).astype(np.int32)
dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int32)
del dst
seg = build_blocked_segmented(indptr, src, num_segments=S)
print("layout ready", flush=True)


def timeit(name, f, *args):
    t0 = time.time()
    float(f(*args))
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / K
    print(f"{name}: {dt*1e3:.2f} ms/iter ({E/dt/1e6:.0f}M edges/s)", flush=True)


def chain(out_dtype):
    @jax.jit
    def f(layout, x):
        def body(h, _):
            return spmm_blocked_segmented(layout, h, agg="mean",
                                          out_dtype=out_dtype).astype(x.dtype), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.astype(jnp.float32).sum()
    return f


import gc
for F, dt, od in ((100, jnp.bfloat16, jnp.bfloat16),
                  (128, jnp.bfloat16, jnp.bfloat16),
                  (256, jnp.bfloat16, jnp.bfloat16),
                  (256, jnp.float32, jnp.float32)):
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32)).astype(dt)
    timeit(f"F={F} {dt.dtype.name} out={od.dtype.name}", chain(od), seg, x)
    del x
    gc.collect()
