"""Micro: aligned 2D row gathers vs scalar gathers (sampler fast-path probe).

table[rows] where table is (E/G, G) int32 — XLA row gather of G*4-byte rows.
If per-row cost ~2 ns (BASELINE: 150-225 GB/s on 256-512 B rows), this beats
the measured 20 ns/element scalar gather by ~10x per fetched element.
"""
import time, sys, os
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

K = 10
E = 61_859_140
G = 64


def timeit(name, fn, *args):
    t0 = time.time()
    float(jax.device_get(fn(*args)))   # host fetch = true tunnel barrier
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(fn(*args)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / K
    print(f"{name}: {dt*1e3:.3f} ms/iter", flush=True)
    return dt


def main():
    key = jax.random.key(0)
    rows_n = E // G
    table = jax.random.randint(key, (rows_n, G), 0, 1 << 20, dtype=jnp.int32)

    b_node = 512 * 150          # per-node window fetch: 2 rows each
    b_edge = 512 * 150 * 5      # per-edge row fetch: 1 row each
    idx_node = jax.random.randint(key, (b_node, 2), 0, rows_n, dtype=jnp.int32)
    idx_edge = jax.random.randint(key, (b_edge,), 0, rows_n, dtype=jnp.int32)

    @jax.jit
    def g_node(i):
        def body(c, _):
            v = table[c]                    # (B, 2, G)
            return c + (v.sum((-1, -2), dtype=jnp.int32) % 2)[:, None], None
        c, _ = jax.lax.scan(body, i, None, length=K)
        return c.sum()

    @jax.jit
    def g_edge(i):
        def body(c, _):
            v = table[c]                    # (B, G)
            return c + (v.sum(-1, dtype=jnp.int32) % 2), None
        c, _ = jax.lax.scan(body, i, None, length=K)
        return c.sum()

    timeit(f"row gather ({b_node},2) of {G}-lane rows", g_node, idx_node)
    timeit(f"row gather ({b_edge},) of {G}-lane rows", g_edge, idx_edge)


if __name__ == "__main__":
    main()
