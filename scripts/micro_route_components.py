"""Per-op bisect of the routing plan at feature-fetch scale (L=469k).

micro_route_counting.py showed BOTH the argsort and the counting plan cost
~5-11 ms at L=469k while the rank scan alone is 1.3-2.2 ms — so the
mechanics (slot scatter, payload permute, pickup gather) dominate, not the
sort.  This times each primitive in isolation (chained in-jit, real data
dependencies) to find the one to kill.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

L = 469_504
F = 100
K = 20

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, 2_449_029, L).astype(np.int32))
valid = jnp.asarray(rng.random(L) < 0.9)
payload = jnp.asarray(rng.integers(0, 1 << 20, (L, 3)).astype(np.int32))
rows = jnp.asarray(rng.normal(size=(L, F)).astype(np.float32))
perm = jnp.asarray(rng.permutation(L).astype(np.int32))


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best/K*1e3:7.3f} ms", flush=True)
    return out


def chain(op):
    """K chained applications; the int32 output xors back into the input."""
    def f(x, aux):
        def body(i, carry):
            r = op(x ^ (carry & 1), aux)
            return carry + r
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))
    return f


def chainf(op):
    def f(x, aux):
        def body(i, carry):
            r = op(x, aux ^ (carry & 1))
            return carry + r
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))
    return f


print("device:", jax.devices()[0], f"L={L}")

# 1. argsort int32 keys
timed("argsort(keys)", chain(
    lambda k, _: jnp.argsort(k, stable=True).sum()), ids, 0)

# 2. unique-indices scatter (the inverse-permutation / slot-table build)
timed("unique scatter (L,)", chainf(
    lambda _, p: jnp.zeros((L,), jnp.int32).at[p].set(
        jnp.arange(L, dtype=jnp.int32), unique_indices=True).sum()),
    0, perm)

# 3. permutation gather of (L, 3) int32 payload
timed("payload gather (L,3) i32", chainf(
    lambda _, p: payload[p].sum()), 0, perm)

# 4. cumsum rank (P=1)
timed("cumsum rank (L,) P=1", chain(
    lambda v, _: (jnp.cumsum((v & 1)) - 1).sum()), ids, 0)

# 5. pickup gather of (L, F) f32 rows by permutation
timed("row gather (L,100) f32", chainf(
    lambda _, p: rows[p].sum().astype(jnp.int32)), 0, perm)

# 6. two where-masks over (L, F) f32
timed("2x where over (L,100)", chain(
    lambda v, _: jnp.where((v & 1)[:, None] > 0,
                           jnp.where((v & 2)[:, None] > 0, rows, 0.0),
                           0.0).sum().astype(jnp.int32)), ids, 0)

# 7. searchsorted segment bounds (tiny)
timed("searchsorted bounds", chain(
    lambda k, _: jnp.searchsorted(k, jnp.arange(9, dtype=k.dtype)).sum()
    .astype(jnp.int32)), jnp.sort(ids), 0)

# 8. take_along_axis rank pick (L,8)->(L,)
oh8 = jnp.asarray(rng.integers(0, 100, (L, 8)).astype(np.int32))
ow = jnp.asarray(rng.integers(0, 8, L).astype(np.int32))
timed("take_along_axis (L,8)", chain(
    lambda o, _: jnp.take_along_axis(oh8, (o % 8)[:, None], axis=1).sum()),
    ow, 0)
