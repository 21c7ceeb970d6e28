"""Bisect the partitioned-trainer step cost on one real chip.

The P=1 partitioned step measured 2066 ms at products scale vs 20.9 ms for
the replicated-topology trainer — this script times each stage of the
distributed pipeline separately (routing, owner sampling, halo feature
gather, full step) on an arxiv-scale graph to find the pathology.
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tch_geometric_tpu.parallel import dist_sampling as ds
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features, halo_gather)

N = 169_343
AVG_DEG = 7
E = N * AVG_DEG
F = 128
B = 512
FANOUTS = (15, 10, 5)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
dst = np.sort(rng.integers(0, N, E))
src = rng.integers(0, N, E)
indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int64)
g = ds.build_partitioned_graph(indptr, src.astype(np.int64), 1)
print("max_degree", g.max_degree, "ell", g.ell is not None, flush=True)

mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
seeds = jnp.arange(B, dtype=jnp.int32)
key = jax.random.key(0)

with mesh:
    sh = NamedSharding(mesh, P("data"))
    g_d = jax.device_put(g, sh)

    # 1. full distributed sampling
    def samp(key, gput, s):
        smp, ovf = ds.dist_sample_neighbors(key, gput, s, FANOUTS, mesh,
                                            capacity_factor=1.3)
        return smp.nodes, ovf

    t = timeit(samp, key, g_d, seeds)
    print(f"dist sampling: {t*1e3:8.2f} ms", flush=True)

    # 2. owner-side draws alone (no routing): per-uid keys + lane topk
    L = B * 15 * 10  # hop-2 frontier
    rows = jnp.asarray(rng.integers(0, N, L).astype(np.int32))
    uids = jnp.arange(L, dtype=jnp.int32)

    @jax.jit
    def draws(gput, rows, uids):
        keys = ds._uid_keys(jax.random.key(1), uids.astype(jnp.uint32))
        row = gput.ell[rows]
        lanes, deg = row[:, :-2], row[:, -2]
        pos, val = ds._uid_uniform_lane_topk(keys, deg, lanes.shape[-1], 5)
        nb = ds._select_lanes(lanes, jnp.clip(pos, 0, lanes.shape[-1] - 1))
        return nb

    t = timeit(draws, g_d, rows, uids)
    print(f"owner draws (L={L}): {t*1e3:8.2f} ms", flush=True)

    # 2b. key folds alone
    @jax.jit
    def folds(uids):
        return jax.random.key_data(
            ds._uid_keys(jax.random.key(1), uids.astype(jnp.uint32)))

    t = timeit(folds, uids)
    print(f"uid key folds:  {t*1e3:8.2f} ms", flush=True)

    # 2c. per-row uniforms alone
    @jax.jit
    def unis(uids):
        keys = ds._uid_keys(jax.random.key(1), uids.astype(jnp.uint32))
        return jax.vmap(lambda kk: jax.random.uniform(kk, (64,)))(keys)

    t = timeit(unis, uids)
    print(f"per-row uniforms: {t*1e3:6.2f} ms", flush=True)

    # 3. routing alone (argsort + bincount + scatter) at hop-2 size
    @jax.jit
    def route(ids):
        owner = ids % 1
        valid = jnp.ones_like(ids, dtype=bool)
        router = ds._route_to_owners(owner, valid, 1, L)
        return router.scatter(ids), router.rank, router.ok

    t = timeit(route, rows)
    print(f"routing (L={L}): {t*1e3:8.2f} ms", flush=True)

    # 4. feature halo gather at tree size
    Ltot = B * (1 + 15 + 150 + 750)
    ids = jnp.asarray(rng.integers(0, N, Ltot).astype(jnp.int32))

    from jax import shard_map
    import functools

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=(P("data"), P("data")),
                       out_specs=(P("data"), P("data")))
    def halo(x_shard, ids_l):
        rows, ovf = halo_gather(x_shard, ids_l[0], axis="data", num_parts=1,
                                capacity=Ltot)
        return rows[None], ovf[None]

    t = timeit(halo, jax.device_put(x, sh), ids[None])
    print(f"halo feature gather (L={Ltot}): {t*1e3:8.2f} ms", flush=True)

    # 5. plain gather reference
    t = timeit(jax.jit(lambda ids: x[ids]), ids)
    print(f"plain feature gather:           {t*1e3:8.2f} ms", flush=True)

    # 6. full partitioned train step (jitted) at this scale
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.parallel.dist_sampling import (
        make_partitioned_trainer)
    from tch_geometric_tpu.parallel.sharded_features import (
        build_interleaved_features)

    xi = jax.device_put(
        jnp.asarray(build_interleaved_features(np.asarray(x), 1)), sh)
    labels = jnp.asarray(rng.integers(0, 40, N))
    model = GraphSAGE(hidden=256, out=40, num_layers=3)
    init_fn, train_step, _ = make_partitioned_trainer(
        model, FANOUTS, mesh, learning_rate=1e-3)
    seeds_d = jax.device_put(seeds, sh)
    lab = jax.device_put(labels[:B], sh)
    state = init_fn(key, g_d, xi, seeds_d)

    def step(state):
        state, loss, acc, ovf = train_step(state, key, g_d, xi, seeds_d, lab)
        return state, loss

    state, loss = step(state)   # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(10):
        state, loss = step(state)
    jax.block_until_ready(loss)
    print(f"full partitioned train step:    "
          f"{(time.perf_counter()-t0)/10*1e3:8.2f} ms", flush=True)
