"""Micro: neighbor-id fetch strategies for the sampler hot path.

The 3-hop sampler's dominant cost is fetching sampled neighbor ids from the
CSR ``indices`` array: hop ``ell`` needs ``B_ell * k_ell`` ids, ~468k scalar
HBM gathers per products-scale batch at ~20 ns each (BASELINE.md).

When ``max_degree`` is small (products synthetic: 56), each node's whole
neighbor window lies in <= 2 aligned 64-lane rows of ``indices.reshape(-1,
64)``, so per-NODE row gathers (85k rows) can replace per-EDGE scalar
gathers (468k) IF the local selection of k lanes out of the fetched window
is cheap.  Candidates:

  scalar     indices[eptr]                  (current path)
  window+ta  rows = ind2d[r0 + {0,1}] ; take_along_axis(win, off+pos)
  window+oh  rows ...                ; one-hot VPU sum selection

Run on the chip.  Shapes mirror hop-2 of B=512 fanouts [15,10,5].
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
B = 512 * 150     # hop-2 frontier
k = 5
MAXDEG = 56


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
    E64 = -(-E // G) * G
    ind = jax.random.randint(key, (E64,), 0, 1 << 21, dtype=jnp.int32)
    ind2d = ind.reshape(-1, G)
    starts = jax.random.randint(key, (B,), 0, E - MAXDEG - 1, dtype=jnp.int32)
    pos = jax.random.randint(key, (B, k), 0, MAXDEG, dtype=jnp.int32)

    @jax.jit
    def f_scalar(starts, pos):
        def body(c, _):
            eptr = c[:, None] + pos
            v = ind[eptr]                      # (B, k) scalar gathers
            return c + (v.sum(-1, dtype=jnp.int32) % 2), None
        c, _ = jax.lax.scan(body, starts, None, length=K)
        return c.sum()

    @jax.jit
    def f_window_ta(starts, pos):
        def body(c, _):
            r0 = c // G
            rows = r0[:, None] + jnp.arange(2, dtype=jnp.int32)[None, :]
            win = ind2d[rows].reshape(B, 2 * G)      # (B, 128) row gathers
            off = (c % G)[:, None] + pos
            v = jnp.take_along_axis(win, off, axis=-1)
            return c + (v.sum(-1, dtype=jnp.int32) % 2), None
        c, _ = jax.lax.scan(body, starts, None, length=K)
        return c.sum()

    @jax.jit
    def f_window_oh(starts, pos):
        def body(c, _):
            r0 = c // G
            rows = r0[:, None] + jnp.arange(2, dtype=jnp.int32)[None, :]
            win = ind2d[rows].reshape(B, 2 * G)      # (B, 128)
            off = (c % G)[:, None] + pos             # (B, k)
            lane = jnp.arange(2 * G, dtype=jnp.int32)
            oh = off[..., None] == lane[None, None, :]   # (B, k, 128) bool
            v = jnp.sum(jnp.where(oh, win[:, None, :], 0), axis=-1)
            return c + (v.sum(-1, dtype=jnp.int32) % 2), None
        c, _ = jax.lax.scan(body, starts, None, length=K)
        return c.sum()

    t0 = timeit(f"scalar gather ({B}x{k})", f_scalar, starts, pos)
    t1 = timeit(f"window rows + take_along_axis", f_window_ta, starts, pos)
    t2 = timeit(f"window rows + one-hot select", f_window_oh, starts, pos)
    print(f"speedups vs scalar: ta {t0/t1:.2f}x  oh {t0/t2:.2f}x")


if __name__ == "__main__":
    main()
