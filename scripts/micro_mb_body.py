"""Bisect the multibatch scan body: fwd only / +grad / +pmean / +adam."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel import dist_sampling as ds
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features, halo_gather)
from tch_geometric_tpu.sampling.neighbor import split_sample_batches
from tch_geometric_tpu.sampling import rng as rngmod

N, F, B, M = 169_343, 128, 512, 4
E = N * 7
FANOUTS = (15, 10, 5)
r = np.random.default_rng(0)
dst = np.sort(r.integers(0, N, E))
src = r.integers(0, N, E)
indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int64)
pg = ds.build_partitioned_graph(indptr, src.astype(np.int64), 1)
xi = jnp.asarray(build_interleaved_features(
    r.normal(size=(N, F)).astype(np.float32), 1))
labels = jnp.asarray(r.integers(0, 40, N).astype(np.int32))
mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
model = GraphSAGE(hidden=256, out=40, num_layers=3)
tx = optax.adam(1e-3)
key = jax.random.key(0)
tree_forward = GraphSAGE.tree_forward

sh = NamedSharding(mesh, P("data"))
sh2 = NamedSharding(mesh, P(None, "data"))
with mesh:
    g_d = jax.device_put(pg, sh)
    xi_d = jax.device_put(xi, sh)
    seeds = jax.device_put(
        jnp.arange(M * B, dtype=jnp.int32).reshape(M, B) % N, sh2)
    lab = jax.device_put(labels[jnp.arange(M * B).reshape(M, B) % N], sh2)

    def make(mode):
        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P(None, "data"),
                      P(None, "data")),
            out_specs=P())
        def step(params, key, gshard, x_shard, seeds_local, labels_local):
            dev = jax.lax.axis_index("data")
            Mn, Bp = seeds_local.shape
            flat = seeds_local.reshape(-1)
            gidx = (jnp.arange(Mn, dtype=jnp.int32)[:, None] * Bp
                    + dev * Bp
                    + jnp.arange(Bp, dtype=jnp.int32)).reshape(-1)
            sample, _ = ds._dist_sample_device(
                key, gshard, flat, dev=dev, fanouts=FANOUTS, axis="data",
                num_parts=1, total_seeds=Mn * Bp, capacity_factor=1.3,
                with_replacement=False, seed_gidx=gidx)
            ids = jnp.clip(sample.nodes, 0, x_shard.shape[0] - 1)
            xg, _ = halo_gather(x_shard, ids, axis="data", num_parts=1,
                                capacity=ids.shape[0],
                                valid=sample.node_valid)
            split, xs = split_sample_batches(sample, Mn, xg)
            opt_state = tx.init(params)

            def body(carry, inp):
                p, opt = carry
                m, sample_m, x_m, labels_m = inp

                def loss_fn(p):
                    logits = model.apply(
                        p, sample_m, x_m, deterministic=True,
                        method=tree_forward)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, labels_m).mean()

                if mode == "fwd":
                    loss = loss_fn(p)
                elif mode in ("grad", "pmean", "adam"):
                    loss, grads = jax.value_and_grad(loss_fn)(p)
                    if mode in ("pmean", "adam"):
                        grads = jax.lax.pmean(grads, "data")
                    if mode == "adam":
                        updates, opt = tx.update(grads, opt, p)
                        p = optax.apply_updates(p, updates)
                return (p, opt), loss

            (_p, _o), losses = jax.lax.scan(
                body, (params, opt_state),
                (jnp.arange(Mn, dtype=jnp.uint32), split, xs,
                 labels_local))
            return jax.lax.pmean(losses, "data")

        return step

    params = model.init(key, jax.tree_util.tree_map(
        lambda a: a, None) or None, None) if False else None
    # init params via a tiny sample
    zeros = jnp.zeros((B,), jnp.int32)
    from tch_geometric_tpu.sampling.neighbor import _sample_neighbors_impl
    from tch_geometric_tpu.data.graph import make_graph
    g1 = make_graph(indptr, src.astype(np.int64), num_src=N, num_dst=N)
    s1 = _sample_neighbors_impl(key, g1, zeros, zeros, None, None, FANOUTS,
                                False, None, 256)
    x1 = jnp.zeros((s1.nodes.shape[0], F), jnp.float32)
    params = model.init(key, s1, x1, method=tree_forward)

    for mode in ("fwd", "grad", "pmean", "adam"):
        step = make(mode)
        out = step(params, key, g_d, xi_d, seeds, lab)
        float(np.asarray(out)[-1])
        t0 = time.perf_counter()
        K = 10
        for _ in range(K):
            out = step(params, key, g_d, xi_d, seeds, lab)
        float(np.asarray(out)[-1])
        dt = (time.perf_counter() - t0) / K
        print(f"{mode:6s}: {dt*1e3:7.1f} ms ({dt/M*1e3:6.1f} ms/minibatch)",
              flush=True)
