"""Why is the segmented SpMM slow?  Bisect: segmented vs unsegmented at
arxiv scale (fits unsegmented), then one segmented layer at products scale
with varying S.
"""
import time
import sys
import os

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tch_geometric_tpu.ops import (build_blocked, build_blocked_segmented,
                                   spmm_blocked_segmented)
from tch_geometric_tpu.ops.spmm_pallas import spmm_blocked_auto

K = 5


def timeit(name, f, *args):
    t0 = time.time()
    float(f(*args))
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / K
    print(f"{name}: {dt*1e3:.2f} ms/iter", flush=True)
    return dt


def chain(fn):
    @jax.jit
    def f(layout, x):
        def body(h, _):
            return fn(layout, h).astype(x.dtype), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.sum()
    return f


# ---- arxiv scale -----------------------------------------------------
N, E, F = 169_343, 1_166_243, 128
rng = np.random.default_rng(0)
dst = np.sort(rng.integers(0, N, E)).astype(np.int64)
src = rng.integers(0, N, E).astype(np.int32)
indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int32)
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

b = build_blocked(indptr, src)
timeit("arxiv unsegmented", chain(
    lambda l, h: spmm_blocked_auto(l, h, agg="mean")), b, x)
for S in (4, 16):
    seg = build_blocked_segmented(indptr, src, num_segments=S)
    print(f"S={S}: Tp={seg.edge_src.shape[1]} C={seg.chunk_edges}", flush=True)
    timeit(f"arxiv segmented S={S}", chain(
        lambda l, h: spmm_blocked_segmented(l, h, agg="mean",
                                            out_dtype=jnp.float32)), seg, x)

# ---- products scale, one layer ---------------------------------------
import gc
del b, seg, x
gc.collect()
N, E = 2_449_029, 61_859_140
for dist in ("uniform", "powerlaw"):
    rng = np.random.default_rng(0)
    if dist == "uniform":
        srcp = rng.integers(0, N, E).astype(np.int32)
    else:
        w = 1.0 / np.arange(1, N + 1) ** 0.8
        w /= w.sum()
        srcp = rng.choice(N, E, p=w).astype(np.int32)
    dstp = np.sort(rng.integers(0, N, E)).astype(np.int64)
    indptr = np.searchsorted(dstp, np.arange(N + 1)).astype(np.int32)
    del dstp
    for F, dt in ((128, np.float32),):
        xp = jnp.asarray(rng.normal(size=(N, F)).astype(dt))
        for S in (8, 32):
            t0 = time.time()
            seg = build_blocked_segmented(indptr, srcp, num_segments=S)
            pad = seg.edge_src.size / E
            print(f"{dist} S={S}: Tp={seg.edge_src.shape[1]} "
                  f"C={seg.chunk_edges} pad={pad:.3f} "
                  f"build {time.time()-t0:.0f}s", flush=True)
            timeit(f"products {dist} F={F} S={S}", chain(
                lambda l, h: spmm_blocked_segmented(
                    l, h, agg="mean", out_dtype=jnp.float32)), seg, xp)
            del seg
            gc.collect()
        del xp
