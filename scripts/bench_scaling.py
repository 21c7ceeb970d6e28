"""Weak-scaling efficiency harness for the distributed aggregation paths.

BASELINE target: ">=70% edges/s scaling efficiency at N>=2 hosts".  Real
multi-chip hardware is not reachable from this environment (one tunneled
chip), so this harness measures the *methodology* on a virtual device mesh
(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count) and runs
unchanged on a real slice: per-device work is held constant (weak scaling)
while the mesh grows, and efficiency = t(1 dev) / t(P dev).

Measures both distributed SpMM schedules (parallel/partition.py):
  ring      ppermute ring accumulation (constant per-step comm, P steps)
  alltoall  Ulysses-shaped halo gather, then local aggregation

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/bench_scaling.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
# a site-packages .pth hook pre-imports jax, so env vars are too late;
# jax.config.update before first backend use is authoritative (see
# tests/conftest.py).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tch_geometric_tpu.parallel.partition import (
    build_ring_shards, pad_features, ring_spmm)

NODES_PER_DEV = 4096     # weak scaling: constant per-device rows
DEG = 16
F = 128
ITERS = 5


def make_graph(num_nodes, rng):
    src = rng.integers(0, num_nodes, num_nodes * DEG, dtype=np.int64)
    dst = rng.integers(0, num_nodes, num_nodes * DEG, dtype=np.int64)
    return np.stack([src, dst])


def bench_mesh(n_dev):
    rng = np.random.default_rng(0)
    num_nodes = NODES_PER_DEV * n_dev
    edge_index = make_graph(num_nodes, rng)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    shards = build_ring_shards(edge_index, num_nodes, n_dev)
    x = pad_features(rng.normal(size=(num_nodes, F)).astype(np.float32), n_dev)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    # close over shards: rows_per_part/num_parts are static layout fields
    run = jax.jit(lambda v: ring_spmm(shards, v, mesh))
    jax.block_until_ready(run(xs))
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(run(xs))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    edges = edge_index.shape[1]
    return dt, edges / dt


def bench_sharded_train(n_dev):
    """Weak-scaling of the sharded-feature-table sampled TRAIN step
    (parallel/sharded_features.py): per-device seed batch held constant."""
    from tch_geometric_tpu.data import csc_graph_from_coo
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.parallel.sharded_features import (
        build_interleaved_features, make_sharded_feature_trainer)

    rng = np.random.default_rng(0)
    num_nodes = NODES_PER_DEV * n_dev
    edge_index = make_graph(num_nodes, rng)
    graph = csc_graph_from_coo(edge_index, num_nodes)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    x = rng.normal(size=(num_nodes, F)).astype(np.float32)
    xi = build_interleaved_features(x, n_dev)
    labels = rng.integers(0, 8, num_nodes)

    model = GraphSAGE(hidden=64, out=8, num_layers=2)
    init_fn, train_step, _ = make_sharded_feature_trainer(
        model, [10, 5], mesh, learning_rate=1e-2)
    with mesh:
        sh = NamedSharding(mesh, P("data"))
        xi_d = jax.device_put(jnp.asarray(xi), sh)
        B = 64 * n_dev                      # constant per-device batch
        seeds = jax.device_put(
            jnp.asarray(rng.integers(0, num_nodes, B).astype(np.int32)), sh)
        lab = jax.device_put(jnp.asarray(labels)[seeds], sh)
        key = jax.random.key(0)
        state = init_fn(key, graph, xi_d, seeds)
        state, loss, _a, _o = train_step(state, key, graph, xi_d, seeds, lab)
        jax.block_until_ready(loss)
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            state, loss, _a, _o = train_step(state, key, graph, xi_d,
                                             seeds, lab)
            jax.block_until_ready(loss)
            times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return dt, B / dt


def bench_partitioned_train(n_dev):
    """Weak-scaling of the FULLY partitioned train step (topology AND
    features sharded; parallel/dist_sampling.py): per-device seeds constant;
    per hop two all_to_alls route frontier requests to adjacency owners."""
    from tch_geometric_tpu.data.storage import to_csc
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.parallel.dist_sampling import (
        build_partitioned_graph, make_partitioned_trainer)
    from tch_geometric_tpu.parallel.sharded_features import (
        build_interleaved_features)

    rng = np.random.default_rng(0)
    num_nodes = NODES_PER_DEV * n_dev
    edge_index = make_graph(num_nodes, rng)
    col_ptrs, row_indices, _perm = to_csc(edge_index, num_nodes)
    g = build_partitioned_graph(np.asarray(col_ptrs),
                                np.asarray(row_indices), n_dev)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    x = rng.normal(size=(num_nodes, F)).astype(np.float32)
    xi = build_interleaved_features(x, n_dev)
    labels = rng.integers(0, 8, num_nodes)

    model = GraphSAGE(hidden=64, out=8, num_layers=2)
    init_fn, train_step, _ = make_partitioned_trainer(
        model, [10, 5], mesh, learning_rate=1e-2)
    with mesh:
        sh = NamedSharding(mesh, P("data"))
        g_d = jax.device_put(g, sh)
        xi_d = jax.device_put(jnp.asarray(xi), sh)
        B = 64 * n_dev                      # constant per-device batch
        seeds = jax.device_put(
            jnp.asarray(rng.integers(0, num_nodes, B).astype(np.int32)), sh)
        lab = jax.device_put(jnp.asarray(labels)[seeds], sh)
        key = jax.random.key(0)
        state = init_fn(key, g_d, xi_d, seeds)
        state, loss, _a, _o = train_step(state, key, g_d, xi_d, seeds, lab)
        jax.block_until_ready(loss)
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            state, loss, _a, _o = train_step(state, key, g_d, xi_d,
                                             seeds, lab)
            jax.block_until_ready(loss)
            times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return dt, B / dt


def partitioned_accounting(n_dev, *, b_per_dev=64, fanouts=(10, 5),
                           feat=F, cf=1.3):
    """Per-device comm/compute accounting for the partitioned train step.

    VERDICT item 7: the >=70% weak-scaling claim needs ALGORITHMIC evidence
    the 2-vCPU host can't corrupt.  These are exact static quantities of
    the compiled program (capacities are shape constants), derived from the
    same formulas the trainer uses:

    * all_to_all bytes per device per step: requests (P, C, 3) i32 +
      responses (P, C, 4k) i32 per hop, halo (P, Ch) i32 + (P, Ch, F) f32 —
      with C = ceil(cf * L / P) the P's cancel: ~cf * L * const, flat in P.
    * owner-side sample slots per device: (P, C) per hop ~= cf * L, flat.
    * tree nodes per device (model FLOPs proxy): depends only on b_per_dev
      and the fanouts — exactly flat.
    """
    L = b_per_dev
    a2a_bytes = 0
    owner_slots = 0
    tree_nodes = b_per_dev
    for k in fanouts:
        C = max(1, min(int(np.ceil(cf * L / n_dev)), L))
        a2a_bytes += n_dev * C * 3 * 4            # route requests out
        a2a_bytes += n_dev * C * 4 * k * 4        # sampled tuples back
        owner_slots += n_dev * C
        L *= k
        tree_nodes += L
    Ch = max(1, min(int(np.ceil(cf * tree_nodes / n_dev)), tree_nodes))
    a2a_bytes += n_dev * Ch * 4 + n_dev * Ch * feat * 4   # halo exchange
    return {"a2a_bytes_per_dev": a2a_bytes,
            "owner_slots_per_dev": owner_slots,
            "tree_nodes_per_dev": tree_nodes}


def check_accounting(n_max):
    """Assert per-device bytes/work flat in P (ceiling slack < 10%).

    Baseline is P=2: at P=1 the capacity clamps to the frontier size (no
    padding, loopback exchange), which understates multi-device buffers."""
    rows = {n: partitioned_accounting(n) for n in (1, 2, 4, 8) if n <= n_max}
    base = rows.get(2, rows[1])
    print("per-device accounting (partitioned step, static quantities):")
    for n, r in rows.items():
        print(f"  P={n}: a2a {r['a2a_bytes_per_dev']/1e3:8.1f} KB  "
              f"owner slots {r['owner_slots_per_dev']:6d}  "
              f"tree nodes {r['tree_nodes_per_dev']:6d}")
        if n >= 2:
            for k, v in r.items():
                assert v <= base[k] * 1.10, (n, k, v, base[k])
        assert r["tree_nodes_per_dev"] == base["tree_nodes_per_dev"]
    return rows


def main():
    n_max = len(jax.devices())
    results = {}
    base = None
    print(f"devices: {n_max} ({jax.devices()[0].platform})")
    check_accounting(n_max)
    for n in [1, 2, 4, 8]:
        if n > n_max:
            break
        dt, eps = bench_mesh(n)
        if base is None:
            base = dt
        eff = base / dt
        results[n] = (dt, eps, eff)
        print(f"P={n}: {dt*1e3:8.2f} ms/iter  {eps/1e6:8.1f} Medges/s  "
              f"weak-scaling eff {eff*100:5.1f}%")

    print("sharded-feature sampled train step (constant per-device batch):")
    base = None
    for n in [1, 2, 4, 8]:
        if n > n_max:
            break
        dt, sps = bench_sharded_train(n)
        if base is None:
            base = dt
        eff = base / dt
        results[("train", n)] = (dt, sps, eff)
        print(f"P={n}: {dt*1e3:8.2f} ms/step  {sps:8.0f} seeds/s  "
              f"weak-scaling eff {eff*100:5.1f}%")

    print("fully partitioned train step (topology + features sharded):")
    base = None
    for n in [1, 2, 4, 8]:
        if n > n_max:
            break
        dt, sps = bench_partitioned_train(n)
        if base is None:
            base = dt
        eff = base / dt
        results[("dist", n)] = (dt, sps, eff)
        print(f"P={n}: {dt*1e3:8.2f} ms/step  {sps:8.0f} seeds/s  "
              f"weak-scaling eff {eff*100:5.1f}%")
    return results


if __name__ == "__main__":
    main()
