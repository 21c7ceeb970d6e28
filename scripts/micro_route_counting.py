"""Routing-plan microbench: argsort router vs counting router (VERDICT r4 #1).

The partitioned trainers route every frontier request to its owner with
``_route_to_owners``: a stable argsort over the (owner | invalid-last) key,
an inverse-permutation scatter, and searchsorted segment starts.  TPU sorts
are the dominant routing cost at products scale (BASELINE.md round-3
partitioned-step residual).  Because ownership is interleaved (owner = v % P
with tiny P), a request's rank within its owner bucket is just the count of
earlier valid requests with the same owner — computable with one (L, P)
one-hot cumsum + a unique-indices slot scatter, no sort at all.

This harness times both plans (rank + one scatter() application on a (L, 4)
payload) at the hop sizes the products-scale trainer actually routes
(L = 512, 7_680, 76_800 per hop; L = 469_504 for the feature fetch) and
checks bit-identity of (rank, ok, scattered payload) between the two.
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


def route_argsort(owner, valid, num_parts, capacity, payload):
    L = owner.shape[0]
    sort_key = jnp.where(valid, owner, num_parts).astype(jnp.int32)
    order = jnp.argsort(sort_key, stable=True)
    inv = jnp.zeros((L,), jnp.int32).at[order].set(
        jnp.arange(L, dtype=jnp.int32), unique_indices=True)
    sk = sort_key[order]
    bounds = jnp.searchsorted(
        sk, jnp.arange(num_parts + 1, dtype=sk.dtype)).astype(jnp.int32)
    start = bounds[:num_parts]
    rank = inv.astype(jnp.int32) - start[jnp.clip(owner, 0, num_parts - 1)]
    ok = (rank < capacity) & valid
    ps = payload[order]
    c = jnp.arange(capacity, dtype=jnp.int32)
    idx = start[:, None] + c[None, :]
    take = idx < bounds[1:][:, None]
    got = ps[jnp.clip(idx, 0, L - 1)]
    take = take[..., None]
    req = jnp.where(take, got, jnp.zeros((), payload.dtype))
    return jnp.where(valid, rank, L), ok, req


def route_counting(owner, valid, num_parts, capacity, payload):
    L = owner.shape[0]
    ow = jnp.clip(owner, 0, num_parts - 1).astype(jnp.int32)
    onehot = ((ow[:, None] == jnp.arange(num_parts, dtype=jnp.int32)[None, :])
              & valid[:, None])
    csum = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
    rank = jnp.take_along_axis(csum, ow[:, None], axis=1)[:, 0] - 1
    rank = jnp.where(valid, rank, L).astype(jnp.int32)
    ok = (rank < capacity) & valid
    in_round = (rank < capacity) & valid
    slot = jnp.where(in_round, ow * capacity + rank,
                     num_parts * capacity + jnp.arange(L, dtype=jnp.int32))
    src = jnp.full((num_parts * capacity,), L, jnp.int32).at[slot].set(
        jnp.arange(L, dtype=jnp.int32), mode="drop", unique_indices=True)
    got = (src < L)[:, None]
    ps = payload[jnp.clip(src, 0, L - 1)]
    req = jnp.where(got, ps, jnp.zeros((), payload.dtype)).reshape(
        num_parts, capacity, payload.shape[-1])
    return rank, ok, req


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    for L in (512, 7_680, 76_800, 469_504):
        for P in (1, 4, 8):
            capacity = max(1, int(np.ceil(1.3 * L / P)))
            capacity = min(capacity, L)
            owner = jnp.asarray(rng.integers(0, P, L).astype(np.int32))
            valid = jnp.asarray(rng.random(L) < 0.97)
            payload = jnp.asarray(
                rng.integers(0, 1 << 20, (L, 4)).astype(np.int32))

            fa = jax.jit(lambda o, v, p: route_argsort(o, v, P, capacity, p))
            fc = jax.jit(lambda o, v, p: route_counting(o, v, P, capacity, p))
            ra = jax.block_until_ready(fa(owner, valid, payload))
            rc = jax.block_until_ready(fc(owner, valid, payload))
            same = all(bool(jnp.array_equal(a, b)) for a, b in zip(ra, rc))

            K = 40  # chained in-jit iterations: device time, not dispatch

            def chain(route):
                def body(i, carry):
                    p = carry ^ i          # iteration-dependent, no hoisting
                    rank, ok, req = route(owner, valid, P, capacity, p)
                    # real scalar dependency on every output — no DCE
                    return carry + (req.sum() + rank.sum()
                                    + ok.sum().astype(jnp.int32))
                return jax.jit(lambda p: jax.lax.fori_loop(0, K, body, p))

            def t(f):
                jax.block_until_ready(f(payload))
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(f(payload))
                    best = min(best, time.perf_counter() - t0)
                return best / K * 1e3

            ta, tc = t(chain(route_argsort)), t(chain(route_counting))
            print(f"L={L:>7} P={P} C={capacity:>7}  argsort {ta:7.3f} ms  "
                  f"counting {tc:7.3f} ms  ({ta/tc:4.1f}x)  "
                  f"identical={same}", flush=True)


if __name__ == "__main__":
    main()
