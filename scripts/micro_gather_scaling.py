"""Calibrate XLA gather cost vs index count and index sortedness on v5e.

Hypotheses to separate:
  (a) per-index cost is flat (~20 ns) -> sampling is index-count bound,
      batching multiple minibatches per step amortizes nothing;
  (b) large gathers amortize (SpMM gathers 4.7M rows at ~1.7 ns/row) ->
      batch many minibatches per jitted step to ride the efficient regime;
  (c) sorted indices gather much faster -> locality, not size, explains SpMM.
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


def timeit(name, fn, *args):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    c = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / K
    n = args[0].size
    print(f"{name:36s} n={n:>9d}  {dt*1e3:8.3f} ms/iter  "
          f"{dt/n*1e9:6.2f} ns/idx  (compile {c:.0f}s)", flush=True)
    return dt


def main():
    key = jax.random.key(0)
    table = jax.random.randint(key, (E,), 0, 1 << 20, dtype=jnp.int32)

    @jax.jit
    def scalar(idx):
        def body(c, _):
            v = table[c]
            return c + (v % 2), None
        c, _ = jax.lax.scan(body, idx, None, length=K)
        return c.sum()

    for n in (100_000, 400_000, 1_600_000, 6_400_000):
        idx = jax.random.randint(jax.random.key(n), (n,), 0, E, jnp.int32)
        timeit("scalar gather unsorted", scalar, idx)
        if n in (400_000, 6_400_000):
            timeit("scalar gather sorted", scalar, jnp.sort(idx))


if __name__ == "__main__":
    main()
