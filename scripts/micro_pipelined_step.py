"""Does pipelining the feature gather against the update scan help?

The multibatch trainer gathers ALL M minibatches' features up front, then
scans M updates (parallel/train.py).  Gather (~5 ms/minibatch, DMA-bound)
and update (~4.5 ms, MXU/VPU-bound) are serial phases of one program.  This
micro restructures the scan so iteration i gathers batch i+1's features
while updating on batch i's — if XLA schedules the independent gather
concurrently with the matmuls, the gather latency hides behind compute.

Also sweeps M (8/16) for the baseline shape.
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
from tch_geometric_tpu.parallel.train import make_multibatch_sage_trainer
from tch_geometric_tpu.sampling import rng
from tch_geometric_tpu.sampling.neighbor import _sample_neighbors_impl

B = 512
FANOUTS = (15, 10, 5)
WINDOW = 256
SCALE = float(os.environ.get("SCALE", "1.0"))


def log(*a):
    print(*a, flush=True)


t0 = time.time()
data = synthetic_ogbn("ogbn-products", scale=SCALE)
graph = data.csc()
log(f"graph ready in {time.time()-t0:.0f}s")
x = jnp.asarray(data.x).astype(jnp.bfloat16)
labels = jnp.asarray(data.y)
key = jax.random.key(0)
rng_np = np.random.default_rng(0)

model = GraphSAGE(hidden=256, out=47, num_layers=3, dtype=jnp.bfloat16)
tx = optax.adam(1e-3)


def timeit(name, fn, state, seeds, labels_mb, iters=3, chain=4):
    # NOTE: block_until_ready on a remote (axon tunnel) buffer does not
    # guarantee execution completed — a host SCALAR fetch is the only true
    # barrier (see bench.py).  Chain a few steps state->state per timing to
    # amortize the fetch.
    def run_chain(st):
        for _ in range(chain):
            st, losses = fn(st, key, graph, x, seeds, labels_mb)
        return st, float(losses.sum())
    t0 = time.time()
    run_chain(state)
    log(f"{name}: compile+first {time.time()-t0:.0f}s")
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_chain(state)
        ts.append(time.perf_counter() - t0)
    M = seeds.shape[0]
    dt = float(np.median(ts)) / M / chain
    log(f"{name}: {dt*1e3:.2f} ms/minibatch")
    return dt


# ---- baseline: existing multibatch trainer at M=8 and M=16
for M in (8, 16):
    # with_replacement=True to match sample_one below: this micro compares
    # GATHER strategies, so both arms must use the same sampling kernel
    init_mb, train_mb = make_multibatch_sage_trainer(model, FANOUTS,
                                                     learning_rate=1e-3,
                                                     with_replacement=True)
    seeds = jnp.asarray(rng_np.integers(0, data.num_nodes, (M, B)).astype(np.int32))
    state = init_mb(key, graph, x, seeds[0])
    fn = lambda st, k, g, xx, s, l: train_mb(st, k, g, xx, s, l)[:2]
    timeit(f"multibatch M={M} (gather-all upfront)", fn, state, seeds,
           labels[seeds])

# ---- pipelined variant: gather batch i+1 inside update-i's scan step
M = 8
seeds = jnp.asarray(rng_np.integers(0, data.num_nodes, (M, B)).astype(np.int32))
init_mb, _ = make_multibatch_sage_trainer(model, FANOUTS, learning_rate=1e-3,
                                          with_replacement=True)
state0 = init_mb(key, graph, x, seeds[0])


def sample_one(k, g, s):
    # g must be a traced ARGUMENT: closing over the concrete module-level
    # graph embeds ~GBs of constants in the HLO and the axon remote-compile
    # service rejects the request with HTTP 413
    z = jnp.zeros(s.shape, jnp.int32)
    return _sample_neighbors_impl(k, g, s.astype(jnp.int32), z, None,
                                  None, FANOUTS, True, None, WINDOW)


@jax.jit
def train_pipelined(state, key, graph, x_table, seeds, labels_mb):
    M = seeds.shape[0]
    keys = jax.vmap(lambda i: rng.fold(key, state.step + i))(jnp.arange(M))
    sample = jax.vmap(sample_one, in_axes=(0, None, 0))(keys, graph, seeds)
    gathers = sample.nodes                              # (M, n_total)

    def gather(i):
        return x_table[jnp.clip(gathers[i], 0, x_table.shape[0] - 1)]

    def one_update(params, opt_state, sample_m, x_m, labels_m):
        def loss_fn(p):
            logits = model.apply(p, sample_m, x_m,
                                 method=GraphSAGE.tree_forward)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels_m).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def body(carry, i):
        params, opt_state, x_cur = carry
        x_next = gather(jnp.minimum(i + 1, M - 1))      # prefetch next batch
        sample_i = jax.tree.map(lambda a: a[i], sample)
        params, opt_state, loss = one_update(params, opt_state, sample_i,
                                             x_cur, labels_mb[i])
        return (params, opt_state, x_next), loss

    (params, opt_state, _), losses = jax.lax.scan(
        body, (state.params, state.opt_state, gather(0)), jnp.arange(M))
    return type(state)(params, opt_state, state.step + M), losses


timeit("pipelined M=8 (gather i+1 inside update i)", train_pipelined,
       state0, seeds, labels[seeds])
