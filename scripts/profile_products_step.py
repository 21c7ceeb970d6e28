"""Decompose the products-scale multibatch train step (M=8, B=512).

Times three chained jitted programs on the synthetic ogbn-products graph:
  (a) vmapped neighbor sampling alone,
  (b) sampling + fused feature gather,
  (c) the full multibatch train step (sample+gather+scan of M updates),
and (c) again with bf16 model compute.
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
from tch_geometric_tpu.data.ogb import synthetic_ogbn
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel.train import make_multibatch_sage_trainer
from tch_geometric_tpu.sampling import rng
from tch_geometric_tpu.sampling.neighbor import _sample_neighbors_impl

M, B = 8, 512
FANOUTS = (15, 10, 5)
WINDOW = 256


def log(*a):
    print(*a, flush=True)


t0 = time.time()
data = synthetic_ogbn("ogbn-products")
graph = data.csc()
log(f"graph ready in {time.time()-t0:.0f}s")
x = jnp.asarray(data.x)
labels = jnp.asarray(data.y)
key = jax.random.key(0)
rng_np = np.random.default_rng(0)
seeds = jnp.asarray(rng_np.integers(0, data.num_nodes, (M, B)).astype(np.int32))
labels_mb = labels[seeds]


def sample_all(key, step, graph, seeds):
    keys = jax.vmap(lambda i: rng.fold(key, step + i))(jnp.arange(M))
    zeros = jnp.zeros(seeds.shape, jnp.int32)

    def one(k, s, z):
        return _sample_neighbors_impl(k, graph, s, z, None, None,
                                      FANOUTS, True, None, WINDOW)

    return jax.vmap(one)(keys, seeds, zeros)


K = 5


def timeit(name, f, *args):
    t0 = time.time()
    float(f(*args))          # host scalar fetch = true barrier (bench.py)
    log(f"{name}: compile {time.time()-t0:.0f}s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / K / M
    log(f"{name}: {dt*1e3:.2f} ms/minibatch")
    return dt


@jax.jit
def f_sample(key, graph, seeds):
    def body(c, i):
        s = sample_all(key, c, graph, seeds)
        return c + M + s.nodes[0, 0].astype(jnp.int32) * 0, s.nodes.sum()
    c, sums = jax.lax.scan(body, jnp.zeros((), jnp.int32), jnp.arange(K))
    return sums.sum()


@jax.jit
def f_sample_gather(key, graph, x, seeds):
    def body(c, i):
        s = sample_all(key, c, graph, seeds)
        xg = x[jnp.clip(s.nodes, 0, x.shape[0] - 1)]
        xg = jnp.where(s.node_valid[..., None], xg, 0.0)
        return c + M + s.nodes[0, 0].astype(jnp.int32) * 0, xg.sum()
    c, sums = jax.lax.scan(body, jnp.zeros((), jnp.int32), jnp.arange(K))
    return sums.sum()


timeit("sample only", f_sample, key, graph, seeds)
timeit("sample+gather", f_sample_gather, key, graph, x, seeds)

for name, dtype in (("full step f32", None), ("full step bf16", jnp.bfloat16)):
    model = GraphSAGE(hidden=256, out=47, num_layers=3, dtype=dtype)
    init_mb, train_mb = make_multibatch_sage_trainer(model, FANOUTS,
                                                     learning_rate=1e-3)
    state = init_mb(key, graph, x, seeds[0])

    def steps(state, key, graph, x, seeds, labels_mb):
        def body(st, _):
            st, losses, accs = train_mb(st, key, graph, x, seeds, labels_mb)
            return st, losses[-1]
        st, losses = jax.lax.scan(body, state, None, length=1)
        return st, losses
    # train_mb is already jitted; loop K times at Python level but chained
    t0 = time.time()
    st = state
    for _ in range(1):
        st, losses, accs = train_mb(st, key, graph, x, seeds, labels_mb)
    float(losses[-1])
    log(f"{name}: compile {time.time()-t0:.0f}s")
    ts = []
    for _ in range(3):
        st = state
        t0 = time.perf_counter()
        for _ in range(K):
            st, losses, accs = train_mb(st, key, graph, x, seeds, labels_mb)
        float(losses[-1])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / K / M
    log(f"{name}: {dt*1e3:.2f} ms/minibatch  loss={float(losses[-1]):.3f}")
