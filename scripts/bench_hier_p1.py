"""Hier-plan (1,1)-mesh step on one chip vs the flat P=1 step — the
measured plan-cost row for the multislice projection (VERDICT r4 item 1:
"update scripts/project_multichip.py with the measured plan costs").

At S=1, C=1 the hier trainer's slice all_gather and chip exchanges are
loopback, so any step-time delta vs the flat P=1 partitioned trainer IS
the hier plan's on-device overhead (the all_gather materialization + the
remapped owner arithmetic).  Uses the same synthetic-products cache as
bench_partitioned_products.py.
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

from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel.dist_sampling import (
    build_partitioned_graph, make_partitioned_trainer)
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features)

_CFG = "ogbn-products_seed0_scale1.0_v1"
CACHE = f"/tmp/products_csc_cache_{_CFG}.npz"
t0 = time.time()
if os.path.exists(CACHE):
    d = np.load(CACHE)
    indptr, indices, x_np, y_np = (d["indptr"], d["indices"], d["x"],
                                   d["y"])
    print(f"products CSC from cache ({time.time()-t0:.0f}s)", flush=True)
else:
    from tch_geometric_tpu.data.ogb import synthetic_ogbn
    data = synthetic_ogbn("ogbn-products")
    graph = data.csc()
    indptr = np.asarray(graph.indptr)
    indices = np.asarray(graph.indices)
    x_np, y_np = np.asarray(data.x), np.asarray(data.y)
    np.savez(CACHE, indptr=indptr, indices=indices, x=x_np, y=y_np)
    print(f"synthetic products built ({time.time()-t0:.0f}s)", flush=True)

B = 512
model = GraphSAGE(hidden=256, out=47, num_layers=3)
key = jax.random.key(0)
rng = np.random.default_rng(0)
N = indptr.shape[0] - 1
seeds = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
labels = jnp.asarray(y_np[np.asarray(seeds)])
xi = build_interleaved_features(x_np, 1)


def run(tag, mesh, kwargs, gspec, dspec):
    pg = build_partitioned_graph(indptr, indices, 1)
    init_fn, train_step, _ = make_partitioned_trainer(
        model, [15, 10, 5], mesh, learning_rate=1e-2,
        capacity_factor=1.3, **kwargs)
    with mesh:
        gput = jax.device_put(pg, NamedSharding(mesh, gspec))
        xput = jax.device_put(jnp.asarray(xi), NamedSharding(mesh, dspec))
        sput = jax.device_put(seeds, NamedSharding(mesh, dspec))
        lput = jax.device_put(labels, NamedSharding(mesh, dspec))
        # TRUE host-fetch barriers on the big buffers: block_until_ready
        # on remote axon buffers is not a barrier, and the first timed
        # loop otherwise absorbs the async ~2 GB graph+feature transfer
        # (documented harness artifact, BASELINE.md round 4)
        int(np.asarray(gput.lindices[:1])[0])
        int(np.asarray(gput.ell[:1, :1]).ravel()[0])             if gput.ell is not None else None
        float(np.asarray(xput[:1, :1]).ravel()[0])
        t0 = time.time()
        state = init_fn(key, gput, xput, sput)
        state, loss, acc, ovf = train_step(state, key, gput, xput, sput,
                                           lput)
        float(np.asarray(loss))
        print(f"{tag}: compile+first {time.time()-t0:.0f}s", flush=True)
        K = 20
        ind = None
        for trial in range(2):        # second trial = steady state
            outs = []
            t0 = time.perf_counter()
            for _ in range(K):
                _s, loss, acc, ovf = train_step(state, key, gput, xput,
                                                sput, lput)
                outs.append(loss)
            float(np.asarray(outs[-1]))
            ind = (time.perf_counter() - t0) / K
            print(f"{tag}: trial {trial} device step {ind*1e3:.1f} ms, "
                  f"overflow {int(np.asarray(ovf).sum())}, "
                  f"loss {float(loss):.3f}", flush=True)
        return ind


flat = run("flat P=1", Mesh(np.array(jax.devices()[:1]), ("data",)),
           {}, P("data"), P("data"))
hier = run("hier (1,1)",
           Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dcn", "ici")),
           {"hier": ("dcn", "ici")}, P("ici"), P(("dcn", "ici")))
print(f"hier plan overhead at P=1: {(hier-flat)*1e3:+.1f} ms "
      f"({hier/flat:.3f}x)", flush=True)
