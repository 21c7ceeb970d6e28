"""Bisect the products-scale multibatch step's fwd/bwd time.

Variants: forward-only loss; no xg validity mask; bf16 feature table.
"""
import time
import sys
import os

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tch_geometric_tpu.data.ogb import synthetic_ogbn
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.sampling import rng
from tch_geometric_tpu.sampling.neighbor import _sample_neighbors_impl

M, B = 8, 512
FANOUTS = (15, 10, 5)
WINDOW = 256
K = 5

t0 = time.time()
data = synthetic_ogbn("ogbn-products")
graph = data.csc()
print(f"graph ready in {time.time()-t0:.0f}s", flush=True)
x32 = jnp.asarray(data.x)
x16 = x32.astype(jnp.bfloat16)
labels = jnp.asarray(data.y)
key = jax.random.key(0)
rng_np = np.random.default_rng(0)
seeds = jnp.asarray(rng_np.integers(0, data.num_nodes, (M, B)).astype(np.int32))
labels_mb = labels[seeds]

model = GraphSAGE(hidden=256, out=47, num_layers=3, dtype=jnp.bfloat16)
tx = optax.adam(1e-3)


def sample_all(key, step, graph, seeds):
    keys = jax.vmap(lambda i: rng.fold(key, step + i))(jnp.arange(M))
    zeros = jnp.zeros(seeds.shape, jnp.int32)

    def one(k, s, z):
        return _sample_neighbors_impl(k, graph, s, z, None, None,
                                      FANOUTS, True, None, WINDOW)
    return jax.vmap(one)(keys, seeds, zeros)


def gathered(x_table, s, mask):
    xg = x_table[jnp.clip(s.nodes, 0, x_table.shape[0] - 1)]
    if mask:
        xg = jnp.where(s.node_valid[..., None], xg, jnp.zeros((), xg.dtype))
    return xg


# init params once
s0 = sample_all(key, jnp.zeros((), jnp.int32), graph, seeds)
one_s = jax.tree.map(lambda a: a[0], s0)
params0 = model.init(key, one_s, gathered(x32, s0, True)[0],
                     method=GraphSAGE.tree_forward)
opt0 = tx.init(params0)


def make_step(mask, grad):
    @jax.jit
    def step(params, opt_state, key, graph, x_table, seeds, labels_mb):
        def one_chain(carry, c):
            params, opt_state = carry
            s = sample_all(key, c, graph, seeds)
            xg = gathered(x_table, s, mask)

            def body(pc, inp):
                p, o = pc
                sm, xm, lm = inp

                def loss_fn(p):
                    logits = model.apply(p, sm, xm,
                                         method=GraphSAGE.tree_forward)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, lm).mean()

                if grad:
                    loss, g = jax.value_and_grad(loss_fn)(p)
                    up, o = tx.update(g, o, p)
                    p = optax.apply_updates(p, up)
                else:
                    loss = loss_fn(p)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (s, xg, labels_mb))
            return (params, opt_state), losses[-1]

        (params, opt_state), ls = jax.lax.scan(
            step_body := one_chain, (params, opt_state),
            jnp.arange(K, dtype=jnp.int32) * M)
        return ls.sum()
    return step


def timeit(name, f, x_table):
    t0 = time.time()
    float(f(params0, opt0, key, graph, x_table, seeds, labels_mb))
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(params0, opt0, key, graph, x_table, seeds, labels_mb))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / K / M
    print(f"{name}: {dt*1e3:.2f} ms/minibatch", flush=True)


timeit("fwd-only masked f32tab", make_step(True, False), x32)
timeit("fwd+bwd  masked f32tab", make_step(True, True), x32)
timeit("fwd+bwd  nomask f32tab", make_step(False, True), x32)
timeit("fwd+bwd  nomask bf16tab", make_step(False, True), x16)
