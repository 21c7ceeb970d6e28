"""Is the partitioned-step slowness in the forward or the backward?

Round-3 finding: the partitioned TRAIN step measures seconds while the
forward-only distributed samplers (budget) measure ~45 ms on the same
topology.  Candidate: the VJP of the routing/halo gathers lowers to
XLA:TPU's serial scatter path (the round-2 note: a colliding scatter made
this step 2.07 s before the forward was rewritten sort-based — the
backward may have regressed to it via a compiler change).

Times, at arxiv scale on one chip:
  A. distributed sampling alone (int, no grad path)
  B. full _loss forward (sampling + halo feature gather + model)
  C. value_and_grad of the same loss
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu_diff")
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel import dist_sampling as ds
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features, halo_gather)
from tch_geometric_tpu.sampling import rng as srng

N = 169_343
E = N * 7
F = 128
B = 512
FANOUTS = (15, 10, 5)

rng = np.random.default_rng(0)
dstn = np.sort(rng.integers(0, N, E))
srcn = rng.integers(0, N, E)
indptr = np.searchsorted(dstn, np.arange(N + 1)).astype(np.int64)
pg = ds.build_partitioned_graph(indptr, srcn.astype(np.int64), 1)
x = rng.normal(size=(N, F)).astype(np.float32)
xi = jnp.asarray(build_interleaved_features(x, 1))
labels = jnp.asarray(rng.integers(0, 40, B).astype(np.int32))

mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
model = GraphSAGE(hidden=256, out=40, num_layers=3)
repl, shard = P(), P("data")


def _sample_gather(key, gshard, x_shard, seeds_local, dev):
    total = seeds_local.shape[0]
    sample, s_ovf = ds._dist_sample_device(
        key, gshard, seeds_local, dev=dev, fanouts=FANOUTS, axis="data",
        num_parts=1, total_seeds=total, capacity_factor=1.3,
        with_replacement=False)
    n_rows = x_shard.shape[0]
    ids = jnp.clip(sample.nodes, 0, n_rows - 1)
    cap = ids.shape[0]
    xg, f_ovf = halo_gather(x_shard, ids, axis="data", num_parts=1,
                            capacity=cap, valid=sample.node_valid)
    return sample, xg


def _loss(params, key, gshard, x_shard, seeds_local, labels_local, dev):
    sample, xg = _sample_gather(key, gshard, x_shard, seeds_local, dev)
    logits = model.apply(params, sample, xg, deterministic=True,
                         method=GraphSAGE.tree_forward)
    import optax
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels_local).mean()


def _fetch(out):
    """True barrier: host-fetch a scalar (block_until_ready on a remote
    buffer does not guarantee execution completed through the tunnel)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def timeit(name, fn, *args, iters=5):
    t0 = time.time()
    _fetch(fn(*args))
    c = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.1f} ms  (compile {c:.0f}s)", flush=True)


with mesh:
    sh = NamedSharding(mesh, P("data"))
    g_d = jax.device_put(pg, sh)
    xi_d = jax.device_put(xi, sh)
    seeds = jax.device_put(jnp.arange(B, dtype=jnp.int32), sh)
    key = jax.random.key(0)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=(repl, shard, shard),
                       out_specs=shard)
    def samp_only(key, gshard, seeds_local):
        dev = jax.lax.axis_index("data")
        sample, _ = ds._dist_sample_device(
            key, gshard, seeds_local, dev=dev, fanouts=FANOUTS, axis="data",
            num_parts=1, total_seeds=seeds_local.shape[0],
            capacity_factor=1.3, with_replacement=False)
        return sample.nodes[None]

    timeit("A sampling only", samp_only, key, g_d, seeds)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=(repl, shard, shard),
                       out_specs=(shard, shard))
    def fwd_gather(key, gshard, seeds_local):
        dev = jax.lax.axis_index("data")
        s, xg = _sample_gather(key, gshard, xi_d, seeds_local, dev)
        return s.nodes[None], xg[None]

    # note: xi_d closed over (small at arxiv scale — 83 MB, fine)
    timeit("B sampling + halo gather", fwd_gather, key, g_d, seeds)

    # init params
    @functools.partial(shard_map, mesh=mesh, in_specs=(repl, shard, shard),
                       out_specs=repl)
    def _init(key, gshard, seeds_local):
        dev = jax.lax.axis_index("data")
        s, xg = _sample_gather(key, gshard, xi_d, seeds_local, dev)
        p = model.init(key, s, xg, method=GraphSAGE.tree_forward)
        return jax.lax.pmean(p, "data")

    params = _init(key, g_d, seeds)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(repl, repl, shard, shard, shard),
        out_specs=repl)
    def fwd_loss(params, key, gshard, seeds_local, labels_local):
        dev = jax.lax.axis_index("data")
        lo = _loss(params, key, gshard, xi_d, seeds_local, labels_local,
                   dev)
        return jax.lax.pmean(lo, "data")

    lab_d = jax.device_put(labels, sh)
    timeit("C full forward loss", fwd_loss, params, key, g_d, seeds, lab_d)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(repl, repl, shard, shard, shard),
        out_specs=(repl, repl))
    def loss_grad(params, key, gshard, seeds_local, labels_local):
        dev = jax.lax.axis_index("data")
        lo, gr = jax.value_and_grad(_loss)(params, key, gshard, xi_d,
                                           seeds_local, labels_local, dev)
        return jax.lax.pmean(lo, "data"), jax.lax.pmean(gr, "data")

    timeit("D forward + grad", loss_grad, params, key, g_d, seeds, lab_d)

    # E: the ACTUAL trainer step — dependent chain vs independent calls.
    # If the dependent chain is slow while independent calls are fast, the
    # cost is the per-execution round-trip through the axon tunnel (a
    # dependent chain cannot pipeline), not device time.
    init_fn, train_step, _ = ds.make_partitioned_trainer(
        model, FANOUTS, mesh, learning_rate=1e-3, capacity_factor=1.3)
    state = init_fn(key, g_d, xi_d, seeds)
    state, loss, acc, ovf = train_step(state, key, g_d, xi_d, seeds, lab_d)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(10):
        state, loss, acc, ovf = train_step(state, key, g_d, xi_d, seeds,
                                           lab_d)
    float(loss)
    print(f"E1 trainer step, DEPENDENT chain: "
          f"{(time.perf_counter()-t0)/10*1e3:9.1f} ms", flush=True)

    s0 = state
    t0 = time.perf_counter()
    outs = []
    for _ in range(10):
        _st, loss, acc, ovf = train_step(s0, key, g_d, xi_d, seeds, lab_d)
        outs.append(loss)
    float(outs[-1])
    print(f"E2 trainer step, INDEPENDENT calls: "
          f"{(time.perf_counter()-t0)/10*1e3:9.1f} ms", flush=True)
