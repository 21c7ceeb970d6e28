"""Micro-benchmarks of the sampler's hot gathers at products scale.

Isolates: per-edge scalar gather from indices (62M i32), windowed
contiguous-row gather (the new fast path), and the feature-table gather.
Small programs -> fast compiles through the tunnel.
"""
import time, sys, os
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

K = 10
N = 2_449_029
E = 61_859_140
F = 100


def timeit(name, fn, *args):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / K
    print(f"{name}: {dt*1e3:.3f} ms/iter", flush=True)
    return dt


def main():
    key = jax.random.key(0)
    indices = jax.random.randint(key, (E,), 0, N, dtype=jnp.int32)
    x = jax.random.normal(key, (N, F), jnp.float32)

    n2 = 512 * 150   # hop-2 frontier
    frontier_eptr = jax.random.randint(key, (n2, 5), 0, E - 64, dtype=jnp.int32)
    starts = jax.random.randint(key, (n2,), 0, E - 64, dtype=jnp.int32)
    nn_ = 512 * (1 + 15 + 150 + 750)
    nodes = jax.random.randint(key, (nn_,), 0, N, dtype=jnp.int32)

    @jax.jit
    def scalar_gather(e):
        def body(c, _):
            v = indices[c]
            return c + (v % 2).astype(jnp.int32), None
        c, _ = jax.lax.scan(body, e, None, length=K)
        return c.sum()

    @jax.jit
    def window_gather(s):
        def body(c, _):
            win = jax.vmap(lambda a: jax.lax.dynamic_slice(indices, (a,), (64,)))(c)
            pick = win[:, :5]
            return c + (pick.sum(-1) % 2).astype(jnp.int32), None
        c, _ = jax.lax.scan(body, s, None, length=K)
        return c.sum()

    @jax.jit
    def feat_gather(nd):
        def body(c, _):
            v = x[c]
            return c + (v.sum(-1) > 0).astype(jnp.int32), None
        c, _ = jax.lax.scan(body, nd, None, length=K)
        return c.sum()

    @jax.jit
    def feat_gather_onepass(nd):
        v = x[nd]
        return v.sum()

    timeit(f"scalar gather ({n2},5) of 62M i32", scalar_gather, frontier_eptr)
    timeit(f"window gather ({n2},64) slices", window_gather, starts)
    timeit(f"feature gather ({nn_},{F}) f32 x{K}", feat_gather, nodes)
    t0 = time.time()
    jax.block_until_ready(feat_gather_onepass(nodes))
    print(f"feature gather single: compile {time.time()-t0:.0f}s", flush=True)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(feat_gather_onepass(nodes))
        times.append(time.perf_counter() - t0)
    print(f"feature gather single: {np.median(times)*1e3:.3f} ms "
          f"({nn_*F*4/np.median(times)/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
