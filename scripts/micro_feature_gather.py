"""Feature-gather rate vs row alignment at products scale.

Gathers 8x469k random rows from a 2.4M-row table with F=100 f32 (400 B,
unaligned), F=128 f32 (512 B), F=128 bf16 (256 B), F=100 bf16.
"""
import time
import sys

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

N = 2_449_029
IDX = 8 * 469_504
K = 5

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, IDX).astype(np.int32))


def run(name, F, dtype):
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32)).astype(dtype)

    @jax.jit
    def f(x, idx):
        def body(c, _):
            g = x[(idx + c) % N]
            return c + 1, g[::65536].astype(jnp.float32).sum()
        c, sums = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=K)
        return sums.sum()

    float(f(x, idx))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x, idx))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / K
    bytes_ = IDX * F * dtype.dtype.itemsize
    print(f"{name:16s} {dt*1e3:7.2f} ms  {bytes_/dt/1e9:6.1f} GB/s  "
          f"{IDX/dt/1e6:6.1f} Maccess/s", flush=True)
    del x


run("F=100 f32", 100, jnp.float32)
run("F=128 f32", 128, jnp.float32)
run("F=128 bf16", 128, jnp.bfloat16)
run("F=100 bf16", 100, jnp.bfloat16)
run("F=112 f32", 112, jnp.float32)
