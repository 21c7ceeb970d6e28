"""Products-scale run of the FULLY PARTITIONED trainer on real hardware.

One chip = a 1-device mesh, so the all_to_alls are loopback; what this
measures is the partitioned path's per-step overhead versus the
replicated-topology trainer (bench_products_scale.py): request routing
(sort + bincount + scatter per hop), owner-side per-uid key folds, and the
capacity-padded exchange buffers.  The multi-chip collectives themselves are
validated on the virtual mesh (tests/test_dist_sampling.py,
bench_scaling.py).
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

from tch_geometric_tpu.data.ogb import synthetic_ogbn
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel.dist_sampling import (
    build_partitioned_graph, make_partitioned_trainer)
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features)

# cache key carries the generating config (dataset/seed/scale/version) so a
# stale cache from an older synthetic config can't silently benchmark the
# wrong graph (ADVICE r4)
_CFG = "ogbn-products_seed0_scale1.0_v1"
CACHE = f"/tmp/products_csc_cache_{_CFG}.npz"
t0 = time.time()
if os.path.exists(CACHE):
    d = np.load(CACHE)
    indptr, indices, x_np, y_np = (d["indptr"], d["indices"], d["x"],
                                   d["y"])

    class _D:  # minimal stand-in for the Data fields used below
        num_nodes = indptr.shape[0] - 1
        num_edges = indices.shape[0]
        x, y = x_np, y_np
    data = _D()
    print(f"products CSC from cache: N={data.num_nodes} E={data.num_edges} "
          f"loaded {time.time()-t0:.0f}s", flush=True)
else:
    data = synthetic_ogbn("ogbn-products")
    print(f"synthetic products: N={data.num_nodes} E={data.num_edges} "
          f"built {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    graph = data.csc()   # native CSC build (also warms the fixture cache)
    indptr = np.asarray(graph.indptr)
    indices = np.asarray(graph.indices)
    print(f"CSC build: {time.time()-t0:.0f}s max_degree={graph.max_degree}",
          flush=True)
    np.savez(CACHE, indptr=indptr, indices=indices, x=np.asarray(data.x),
             y=np.asarray(data.y))

n_dev = 1
t0 = time.time()
pg = build_partitioned_graph(indptr, indices, n_dev)
print(f"partitioned build (P={n_dev}): {time.time()-t0:.0f}s "
      f"(ell={'yes' if pg.ell is not None else 'no'})", flush=True)

mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
xi = build_interleaved_features(np.asarray(data.x), n_dev)
labels = jnp.asarray(data.y)

B = 512
model = GraphSAGE(hidden=256, out=47, num_layers=3)
# VERDICT r3 item 6: re-tune capacity_factor x num_rounds — a smaller
# capacity with a retry round shrinks every exchange buffer (and the
# owner-side work over its padded slots) as long as overflow stays 0
cfgs = os.environ.get("PART_CONFIGS", "1.3:1,0.8:2,0.6:2")
if os.environ.get("PART_ONLY_TAIL"):
    cfgs = ""
for cfg in [c for c in cfgs.split(",") if c]:
    cf, rounds = cfg.split(":")
    cf, rounds = float(cf), int(rounds)
    xdt = jnp.bfloat16 if os.environ.get("PART_BF16") else None
    init_fn, train_step, _ = make_partitioned_trainer(
        model, [15, 10, 5], mesh, learning_rate=1e-3, capacity_factor=cf,
        num_rounds=rounds, exchange_dtype=xdt)

    with mesh:
        sh = NamedSharding(mesh, P("data"))
        g_d = jax.device_put(pg, sh)
        xi_d = jax.device_put(jnp.asarray(xi), sh)
        seeds = jax.device_put(jnp.arange(B, dtype=jnp.int32), sh)
        lab = jax.device_put(labels[:B], sh)
        key = jax.random.key(0)
        t0 = time.time()
        state = init_fn(key, g_d, xi_d, seeds)
        print("init:", round(time.time() - t0, 1), flush=True)
        t0 = time.time()
        state, loss, acc, ovf = train_step(state, key, g_d, xi_d, seeds,
                                           lab)
        print("compile+step:", round(time.time() - t0, 1),
              "loss", float(loss), "overflow", int(ovf), flush=True)
        K = 10
        t0 = time.perf_counter()
        for _ in range(K):
            state, loss, acc, ovf = train_step(state, key, g_d, xi_d,
                                               seeds, lab)
        float(loss)
        dt = (time.perf_counter() - t0) / K
        print(f"partitioned products-scale train step (P={n_dev} cf={cf} "
              f"rounds={rounds}): {dt*1e3:.1f} ms -> {1/dt:.1f} "
              f"minibatches/s  loss={float(loss):.3f} overflow={int(ovf)}",
              flush=True)
        # independent calls isolate DEVICE time from the axon tunnel's
        # per-round-trip latency (a dependent state chain serializes on
        # it; measured ~140 ms/step of pure tunnel overhead at arxiv
        # scale — scripts/micro_part_fwd_vs_grad.py E1 vs E2)
        s0 = state
        outs = []
        t0 = time.perf_counter()
        for _ in range(K):
            _st, loss, acc, ovf = train_step(s0, key, g_d, xi_d, seeds,
                                             lab)
            outs.append(loss)
        float(outs[-1])
        dt2 = (time.perf_counter() - t0) / K
        print(f"  device-time (independent calls): {dt2*1e3:.1f} ms -> "
              f"{1/dt2:.1f} minibatches/s", flush=True)

# --------------------------------------------------------------------------
# Round-4: M-fused multibatch partitioned trainer (one M*B-seed tree per
# step; exchanges + halo amortize over M like the replicated multibatch's
# 20.9 -> 10.3 ms/minibatch)
# --------------------------------------------------------------------------
if os.environ.get("PART_MULTIBATCH"):
    from tch_geometric_tpu.parallel.dist_sampling import (
        make_partitioned_multibatch_trainer)
    M = int(os.environ.get("PART_M", "8"))
    init_fn, train_step = make_partitioned_multibatch_trainer(
        model, [15, 10, 5], mesh, learning_rate=1e-3, capacity_factor=1.3)
    with mesh:
        sh = NamedSharding(mesh, P("data"))
        sh2 = NamedSharding(mesh, P(None, "data"))
        g_d = jax.device_put(pg, sh)
        xi_d = jax.device_put(jnp.asarray(xi), sh)
        seeds = jax.device_put(
            jnp.arange(M * B, dtype=jnp.int32).reshape(M, B), sh2)
        lab = jax.device_put(labels[:M * B].reshape(M, B), sh2)
        key = jax.random.key(0)
        t0 = time.time()
        state = init_fn(key, g_d, xi_d, seeds)
        state, losses, accs, ovf = train_step(state, key, g_d, xi_d, seeds,
                                              lab)
        float(np.asarray(losses)[-1])
        print(f"multibatch init+compile: {time.time()-t0:.0f}s "
              f"overflow={int(ovf)}", flush=True)
        # TWO timed trials: the first absorbs residual async work from
        # init/compile (measured: 282 ms vs 46 ms for identical binaries
        # at arxiv scale); the second is the steady state
        K = 10
        for trial in range(2):
            outs = []
            t0 = time.perf_counter()
            for _ in range(K):
                _s, losses, accs, ovf = train_step(state, key, g_d, xi_d,
                                                   seeds, lab)
                outs.append(losses)
            float(np.asarray(outs[-1])[-1])
            dt = (time.perf_counter() - t0) / K / M
            print(f"multibatch partitioned step (M={M}, trial {trial}): "
                  f"{dt*1e3:.1f} ms/minibatch -> {1/dt:.1f} minibatches/s  "
                  f"overflow={int(ovf)}", flush=True)

# --------------------------------------------------------------------------
# BASELINE config 5 sampler family at products scale: budget sampling +
# CTDNE temporal walks over the SAME partitioned topology, with the routing
# overflow RATE reported at the default capacity factor (VERDICT item 6:
# overflow must be a measured, bounded quantity at realistic skew).
# --------------------------------------------------------------------------
if os.environ.get("PART_SKIP_TAIL"):
    sys.exit(0)
from tch_geometric_tpu.parallel.dist_budget import dist_budget_sample
from tch_geometric_tpu.parallel.dist_walks import (
    dist_biased_tempo_random_walk, effective_edge_ts)
from tch_geometric_tpu.utils.metrics import MetricsLogger

mlog = MetricsLogger()
rng_np = np.random.default_rng(0)
key = jax.random.key(1)
seeds_np = rng_np.integers(0, data.num_nodes, B).astype(np.int32)

for cf, rounds in ((1.3, 1), (1.3, 2)):
    sample, ovf = dist_budget_sample(key, pg, seeds_np, (15, 10, 5), mesh,
                                     capacity_factor=cf, num_rounds=rounds)
    # TRUE barrier before timing: a host fetch.  block_until_ready on a
    # remote axon buffer does not guarantee execution completed, and the
    # first timed loop otherwise absorbs the 1.2 GB graph transfer
    # (measured: the same binary reads 966 ms cold-absorbed vs 28 ms
    # warmed — scripts/../tmp analysis, round 4)
    np.asarray(sample.nodes)
    n_requests = sum(B * int(np.prod([15, 10, 5][:i]))
                     for i in range(3))
    t0 = time.perf_counter()
    K = 10
    for _ in range(K):
        sample, ovf = dist_budget_sample(key, pg, seeds_np, (15, 10, 5),
                                         mesh, capacity_factor=cf,
                                         num_rounds=rounds)
    np.asarray(sample.nodes)
    dt = (time.perf_counter() - t0) / K
    rate = int(np.asarray(ovf).sum()) / n_requests
    print(f"budget [15,10,5] B={B} cf={cf} rounds={rounds}: "
          f"{dt*1e3:.1f} ms/batch  overflow_rate={rate:.2e}", flush=True)
    mlog.step(rounds, batch_size=B, budget_ms=dt * 1e3, overflow_rate=rate)

# CTDNE walks need effective timestamps on a CSR (out-edge) partition;
# synthesize timestamps at products scale
t0 = time.time()
ts_edge = rng_np.integers(0, 1 << 20, data.num_edges).astype(np.int64)
ts_node = rng_np.integers(0, 1 << 20, data.num_nodes).astype(np.int64)
ts_eff = effective_edge_ts(indices, ts_edge, ts_node)
pgw = build_partitioned_graph(indptr, indices, n_dev, edge_timestamps=ts_eff)
print(f"temporal partition build: {time.time()-t0:.0f}s", flush=True)

Bw = 4096
starts = rng_np.integers(0, data.num_nodes, Bw).astype(np.int32)
start_ts = np.zeros(Bw, np.int32)
for cf, rounds in ((1.3, 1), (1.3, 2)):
    walks, wts, ovf = dist_biased_tempo_random_walk(
        key, pgw, starts, start_ts, 20, "exponential", mesh, retry_count=3,
        capacity_factor=cf, num_rounds=rounds)
    np.asarray(walks)      # true barrier (see budget warmup note)
    t0 = time.perf_counter()
    K = 5
    for _ in range(K):
        walks, wts, ovf = dist_biased_tempo_random_walk(
            key, pgw, starts, start_ts, 20, "exponential", mesh,
            retry_count=3, capacity_factor=cf, num_rounds=rounds)
    np.asarray(walks)
    dt = (time.perf_counter() - t0) / K
    rate = int(np.asarray(ovf).sum()) / (Bw * 19)
    print(f"CTDNE L=20 B={Bw} cf={cf} rounds={rounds}: "
          f"{dt*1e3:.1f} ms -> {Bw/dt:.0f} walks/s  "
          f"overflow_rate={rate:.2e}", flush=True)
    mlog.step(rounds, batch_size=Bw, ctdne_ms=dt * 1e3, overflow_rate=rate)
