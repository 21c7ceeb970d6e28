"""Decompose the products-scale sampled-training step into phases.

Times, on the real chip, each phase as a K-iteration chained scan inside one
jit (defeats async dispatch through the axon tunnel):
  sample      on-device 3-hop neighbor sampling only
  gather      sampling + feature-table gather
  forward     sampling + gather + tree forward (no grad)
  step        full train step (fwd+bwd+adam)
Plus micro-benchmarks of the individual gathers at hop-2 scale.
"""
import time, sys, os
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tch_geometric_tpu.data.ogb import synthetic_ogbn
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel import make_sage_trainer
from tch_geometric_tpu.parallel.train import TrainState
from tch_geometric_tpu.sampling import rng
from tch_geometric_tpu.sampling.neighbor import _sample_neighbors_impl

B = 512
FANOUTS = (15, 10, 5)
K = 10


def timeit(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: compile+1st {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / K
    print(f"{name}: {dt*1e3:.2f} ms/iter", flush=True)
    return dt


def main():
    t0 = time.time()
    data = synthetic_ogbn("ogbn-products")
    graph = data.csc()
    print(f"setup {time.time()-t0:.0f}s N={data.num_nodes} E={data.num_edges} "
          f"max_deg={graph.max_degree}", flush=True)
    x = jnp.asarray(data.x)
    labels = jnp.asarray(data.y)
    seeds = jnp.arange(B)
    key = jax.random.key(0)

    def sample_once(k):
        zeros = jnp.zeros((B,), jnp.int32)
        return _sample_neighbors_impl(k, graph, seeds.astype(jnp.int32), zeros,
                                      None, None, FANOUTS, True, None, 256)

    @jax.jit
    def f_sample(key):
        def body(c, _):
            s = sample_once(c)
            return rng.fold(c, s.nodes.sum()), None
        c, _ = jax.lax.scan(body, key, None, length=K)
        return c

    @jax.jit
    def f_gather(key):
        def body(c, _):
            s = sample_once(c)
            xg = x[jnp.clip(s.nodes, 0, x.shape[0] - 1)]
            return rng.fold(c, xg.sum().astype(jnp.int32)), None
        c, _ = jax.lax.scan(body, key, None, length=K)
        return c

    model = GraphSAGE(hidden=256, out=47, num_layers=3)
    init_fn, train_step, _ = make_sage_trainer(model, list(FANOUTS),
                                               learning_rate=1e-3)
    state = init_fn(key, graph, x, seeds)

    @jax.jit
    def f_forward(params, key):
        def body(c, _):
            s = sample_once(c)
            xg = x[jnp.clip(s.nodes, 0, x.shape[0] - 1)]
            xg = jnp.where(s.node_valid[:, None], xg, 0.0)
            out = model.apply(params, s, xg, method=GraphSAGE.tree_forward)
            return rng.fold(c, out.sum().astype(jnp.int32)), None
        c, _ = jax.lax.scan(body, key, None, length=K)
        return c

    @jax.jit
    def f_step(state, key):
        def body(c, _):
            st, k = c
            st, loss, acc = train_step.__wrapped__(st, k, graph, x, seeds,
                                                   labels[seeds])
            return (st, rng.fold(k, 1)), None
        (st, k), _ = jax.lax.scan(body, (state, key), None, length=K)
        return st.step

    t_s = timeit("sample", f_sample, key)
    t_g = timeit("sample+gather", f_gather, key)
    t_f = timeit("sample+gather+forward", f_forward, state.params, key)
    t_t = timeit("full step", f_step, state, key)
    print(f"\nbreakdown: sample={t_s*1e3:.2f} gather={((t_g-t_s))*1e3:.2f} "
          f"forward={(t_f-t_g)*1e3:.2f} bwd+adam={(t_t-t_f)*1e3:.2f} ms")

    # --- micro: the individual hot gathers at hop-2 scale -------------------
    n2 = B * 15 * 10
    frontier = jax.random.randint(key, (n2,), 0, data.num_nodes, dtype=jnp.int32)
    eptr = jax.random.randint(key, (n2, 5), 0, data.num_edges, dtype=jnp.int32)

    @jax.jit
    def f_indptr(f):
        def body(c, _):
            s = graph.indptr[c]
            e = graph.indptr[c + 1]
            return (c + (e - s).astype(jnp.int32) % 1), None
        c, _ = jax.lax.scan(body, f, None, length=K)
        return c

    @jax.jit
    def f_indices(e):
        def body(c, _):
            v = graph.indices[c]
            return c + (v % 2).astype(jnp.int32), None
        c, _ = jax.lax.scan(body, e, None, length=K)
        return c

    nn_ = B + B*15 + B*150 + B*750
    nodes = jax.random.randint(key, (nn_,), 0, data.num_nodes, dtype=jnp.int32)

    @jax.jit
    def f_feat(nd):
        def body(c, _):
            v = x[c]
            return c + (v.sum(-1) > 0).astype(jnp.int32), None
        c, _ = jax.lax.scan(body, nd, None, length=K)
        return c

    timeit(f"indptr gather 2x({n2},)", f_indptr, frontier)
    timeit(f"indices gather ({n2},5)", f_indices, eptr)
    timeit(f"feature gather ({nn_},100) f32", f_feat, nodes)


if __name__ == "__main__":
    main()
