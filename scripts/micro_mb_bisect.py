"""Bisect the M-fused partitioned trainer: sample+halo+split vs update scan.

Products-scale measured 1.7 s/minibatch scaling WITH M — a per-update cost
in the scan body, not the fused sampling.  This times each phase at arxiv
scale where compiles are quick.
"""
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
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel import dist_sampling as ds
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features, halo_gather)
from tch_geometric_tpu.sampling.neighbor import split_sample_batches
from tch_geometric_tpu.sampling import rng as rngmod

N = 169_343
E = N * 7
F = 128
B = 512
M = 4
FANOUTS = (15, 10, 5)

r = np.random.default_rng(0)
dst = np.sort(r.integers(0, N, E))
src = r.integers(0, N, E)
indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int64)
pg = ds.build_partitioned_graph(indptr, src.astype(np.int64), 1)
x = r.normal(size=(N, F)).astype(np.float32)
xi = jnp.asarray(build_interleaved_features(x, 1))
labels = jnp.asarray(r.integers(0, 40, N).astype(np.int32))
mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
model = GraphSAGE(hidden=256, out=40, num_layers=3)
key = jax.random.key(0)

sh = NamedSharding(mesh, P("data"))
sh2 = NamedSharding(mesh, P(None, "data"))
with mesh:
    g_d = jax.device_put(pg, sh)
    xi_d = jax.device_put(xi, sh)
    seeds = jax.device_put(
        jnp.arange(M * B, dtype=jnp.int32).reshape(M, B) % N, sh2)
    lab = jax.device_put(labels[jnp.arange(M * B).reshape(M, B) % N], sh2)

    # phase A: fused sample + halo + split only
    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P("data"), P("data"), P(None, "data")),
                       out_specs=P(None, "data"))
    def phase_a(key, gshard, x_shard, seeds_local):
        dev = jax.lax.axis_index("data")
        Mn, Bp = seeds_local.shape
        flat = seeds_local.reshape(-1)
        gidx = (jnp.arange(Mn, dtype=jnp.int32)[:, None] * Bp
                + dev * Bp + jnp.arange(Bp, dtype=jnp.int32)).reshape(-1)
        sample, s_ovf = ds._dist_sample_device(
            key, gshard, flat, dev=dev, fanouts=FANOUTS, axis="data",
            num_parts=1, total_seeds=Mn * Bp, capacity_factor=1.3,
            with_replacement=False, seed_gidx=gidx)
        ids = jnp.clip(sample.nodes, 0, x_shard.shape[0] - 1)
        xg, f_ovf = halo_gather(x_shard, ids, axis="data", num_parts=1,
                                capacity=ids.shape[0],
                                valid=sample.node_valid)
        split, xs = split_sample_batches(sample, Mn, xg)
        return xs.sum(axis=(1, 2))[:, None] * jnp.ones((1, Bp))

    out = phase_a(key, g_d, xi_d, seeds)
    float(np.asarray(out)[0, 0])
    t0 = time.perf_counter()
    K = 10
    for _ in range(K):
        out = phase_a(key, g_d, xi_d, seeds)
    float(np.asarray(out)[0, 0])
    ta = (time.perf_counter() - t0) / K
    print(f"A sample+halo+split (M={M}): {ta*1e3:.1f} ms", flush=True)

    # phase B: the full trainer step
    init_fn, train_step = ds.make_partitioned_multibatch_trainer(
        model, FANOUTS, mesh, learning_rate=1e-3, capacity_factor=1.3)
    st = init_fn(key, g_d, xi_d, seeds)
    st, losses, accs, ovf = train_step(st, key, g_d, xi_d, seeds, lab)
    float(np.asarray(losses)[-1])
    outs = []
    t0 = time.perf_counter()
    for _ in range(K):
        _s, losses, accs, ovf = train_step(st, key, g_d, xi_d, seeds, lab)
        outs.append(losses)
    float(np.asarray(outs[-1])[-1])
    tb = (time.perf_counter() - t0) / K
    print(f"B full multibatch step (M={M}): {tb*1e3:.1f} ms "
          f"({tb/M*1e3:.1f} ms/minibatch)", flush=True)

    # phase C: single-batch partitioned trainer for reference
    init1, step1, _ = ds.make_partitioned_trainer(
        model, FANOUTS, mesh, learning_rate=1e-3, capacity_factor=1.3)
    seeds1 = jax.device_put(jnp.arange(B, dtype=jnp.int32), sh)
    lab1 = jax.device_put(labels[:B], sh)
    st1 = init1(key, g_d, xi_d, seeds1)
    st1, loss1, acc1, ovf1 = step1(st1, key, g_d, xi_d, seeds1, lab1)
    float(np.asarray(loss1))
    outs = []
    t0 = time.perf_counter()
    for _ in range(K):
        _s, loss1, acc1, ovf1 = step1(st1, key, g_d, xi_d, seeds1, lab1)
        outs.append(loss1)
    float(np.asarray(outs[-1]))
    tc = (time.perf_counter() - t0) / K
    print(f"C single-batch partitioned step: {tc*1e3:.1f} ms", flush=True)
