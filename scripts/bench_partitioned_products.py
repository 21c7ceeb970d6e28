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

t0 = time.time()
data = synthetic_ogbn("ogbn-products")
print(f"synthetic products: N={data.num_nodes} E={data.num_edges} "
      f"built {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
graph = data.csc()   # native CSC build (also warms the fixture cache)
indptr = np.asarray(graph.indptr)
indices = np.asarray(graph.indices)
print(f"CSC build: {time.time()-t0:.0f}s max_degree={graph.max_degree}",
      flush=True)

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
init_fn, train_step, _ = make_partitioned_trainer(
    model, [15, 10, 5], mesh, learning_rate=1e-3, capacity_factor=1.3)

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
    state, loss, acc, ovf = train_step(state, key, g_d, xi_d, seeds, lab)
    print("compile+step:", round(time.time() - t0, 1),
          "loss", float(loss), "overflow", int(ovf), flush=True)
    K = 10
    t0 = time.perf_counter()
    for _ in range(K):
        state, loss, acc, ovf = train_step(state, key, g_d, xi_d, seeds, lab)
    float(loss)
    dt = (time.perf_counter() - t0) / K
    print(f"partitioned products-scale train step (P={n_dev}): "
          f"{dt*1e3:.1f} ms -> {1/dt:.1f} minibatches/s  "
          f"loss={float(loss):.3f} overflow={int(ovf)}", flush=True)
