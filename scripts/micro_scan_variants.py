"""Which prefix-sum formulation is fastest on TPU at routing sizes?

The owner-rank of a routed request is a per-owner exclusive count of earlier
valid requests — a (L, P) one-hot prefix sum.  ``jnp.cumsum`` over L=469k
measures ~5 ms (as slow as the argsort it would replace), so this harness
races formulations:

  A jnp.cumsum along axis 0                     (reduce_window lowering)
  B lax.associative_scan along axis 0           (log-depth slices)
  C blocked 2-level: reshape (G, c, P), cumsum inside chunks (short axis),
    carry chunk totals with a small scan, add base
  D blocked with the in-chunk scan done as a (c, c) lower-triangular MATMUL
    riding the MXU (f32 counts are exact up to 2^24)
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


def cumsum_plain(oh):
    return jnp.cumsum(oh, axis=0)


def cumsum_ascan(oh):
    return jax.lax.associative_scan(jnp.add, oh, axis=0)


def _blocked(oh, c, inner):
    L, Pn = oh.shape
    G = -(-L // c)
    pad = G * c - L
    ohp = jnp.pad(oh, ((0, pad), (0, 0)))
    chunks = ohp.reshape(G, c, Pn)
    within = inner(chunks)                      # inclusive, per chunk
    totals = within[:, -1, :]                   # (G, P)
    base = jnp.cumsum(totals, axis=0) - totals  # exclusive over chunks
    out = within + base[:, None, :]
    return out.reshape(G * c, Pn)[:L]


def cumsum_blocked(oh, c=512):
    return _blocked(oh, c, lambda ch: jnp.cumsum(ch, axis=1))


def cumsum_blocked_mxu(oh, c=512):
    tril = jnp.tril(jnp.ones((c, c), jnp.float32))

    def inner(ch):
        r = jax.lax.dot_general(
            tril, ch.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (c, G, P)
        return jnp.transpose(r, (1, 0, 2)).astype(jnp.int32)

    return _blocked(oh, c, inner)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])
    K = 20
    for L in (469_504,):
        for Pn in (1, 8):
            ow = jnp.asarray(rng.integers(0, Pn, L).astype(np.int32))
            valid = jnp.asarray(rng.random(L) < 0.97)
            oh = ((ow[:, None] == jnp.arange(Pn, dtype=jnp.int32)[None, :])
                  & valid[:, None]).astype(jnp.int32)

            ref = None
            for name, fn in (("cumsum", cumsum_plain),
                             ("blk512", cumsum_blocked),
                             ("blkMXU", cumsum_blocked_mxu)):
                def chain(x0):
                    def body(i, carry):
                        # input genuinely varies with the carry: no hoisting
                        x = (x0 + (carry & 1)) & 1
                        return carry + fn(x)
                    return jax.lax.fori_loop(0, K, body, jnp.zeros_like(x0))

                f = jax.jit(chain)
                out = jax.block_until_ready(f(oh))
                if ref is None:
                    ref = out
                same = bool(jnp.array_equal(out, ref))
                # single-shot correctness vs plain cumsum
                same = same and bool(jnp.array_equal(
                    jax.jit(fn)(oh), jnp.cumsum(oh, axis=0)))
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(f(oh))
                    best = min(best, time.perf_counter() - t0)
                print(f"L={L:>7} P={Pn}  {name:7s} {best/K*1e3:7.3f} ms  "
                      f"match={same}", flush=True)


if __name__ == "__main__":
    main()
