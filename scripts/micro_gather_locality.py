"""Gather rate vs index locality on a 1.25 GB table (products scale).

Questions: (a) how much faster is a sorted gather than a random one on a
big table, (b) what does an on-device sort of the indices cost, (c) does
coarse bucketing (sort by high bits only) recover most of the win?
"""
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

N = 2_449_029
IDX = 8 * 469_504
F = 128
K = 5

rng = np.random.default_rng(0)
idx_np = rng.integers(0, N, IDX).astype(np.int32)
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))


def timeit(name, f, *args):
    float(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / K
    print(f"{name:24s} {dt*1e3:7.2f} ms  {IDX/dt/1e6:6.1f} Maccess/s",
          flush=True)
    return dt


def gather_f(x, idx):
    @jax.jit
    def f(x, idx):
        def body(c, _):
            g = x[(idx + c) % N]
            return c + 1, g[::65536].sum()
        c, s = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return s.sum()
    return f


f = gather_f(x, None)
idx_rand = jnp.asarray(idx_np)
idx_sorted = jnp.asarray(np.sort(idx_np))
# block-sorted: sort within 128k-index blocks only (cheap shuffle-local)
nb = (IDX // (1 << 17)) * (1 << 17)
blk = idx_np[:nb].reshape(-1, 1 << 17)
idx_blksort = jnp.asarray(np.concatenate([np.sort(blk, axis=-1).reshape(-1), np.sort(idx_np[nb:])]))
# bucket by high bits: 64 buckets via host stable sort of idx >> 16
order = np.argsort(idx_np >> 16, kind="stable")
idx_bucket = jnp.asarray(idx_np[order])

timeit("random", f, x, idx_rand)
timeit("sorted", f, x, idx_sorted)
timeit("block-sorted 128k", f, x, idx_blksort)
timeit("bucketed >>16", f, x, idx_bucket)


@jax.jit
def f_sort(idx):
    def body(c, _):
        s = jnp.sort(idx + c)
        return c + 1, s[::65536].sum()
    c, s = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
    return s.sum()


@jax.jit
def f_argsort(idx):
    def body(c, _):
        o = jnp.argsort(idx + c)
        return c + 1, o[::65536].sum()
    c, s = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
    return s.sum()


timeit("jnp.sort 3.75M i32", f_sort, idx_rand)
timeit("jnp.argsort 3.75M i32", f_argsort, idx_rand)


# sort + sorted-gather + unpermute (the full locality pipeline, on device)
@jax.jit
def f_pipeline(x, idx):
    def body(c, _):
        ix = (idx + c) % N
        o = jnp.argsort(ix)
        g = x[ix[o]]
        # inverse permutation scatter-free: gather with rank positions
        inv = jnp.argsort(o)
        gg = g[inv]
        return c + 1, gg[::65536].sum()
    c, s = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
    return s.sum()


timeit("argsort+gather+inv", f_pipeline, x, idx_rand)
