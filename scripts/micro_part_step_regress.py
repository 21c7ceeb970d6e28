"""Differential timing of the partitioned train step: current vs round-2.

Round 3 measured the products-scale partitioned step at ~1.79 s vs the
41 ms recorded in round 2 — this harness times ONE arxiv-scale partitioned
train step with the current ``parallel/dist_sampling.py`` so the
regression (or the compile-service pathology) can be bisected quickly:
run it, then ``cp /tmp/ds_r2.py tch_geometric_tpu/parallel/dist_sampling.py``
(extracted from the round-2 commit), run again, restore with
``git checkout -- tch_geometric_tpu/parallel/dist_sampling.py``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu_diff")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel.dist_sampling import (
    build_partitioned_graph, make_partitioned_trainer)
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features)

N = 169_343
E = N * 7
F = 128
B = 512

rng = np.random.default_rng(0)
dst = np.sort(rng.integers(0, N, E))
src = rng.integers(0, N, E)
indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int64)
pg = build_partitioned_graph(indptr, src.astype(np.int64), 1)
x = rng.normal(size=(N, F)).astype(np.float32)
xi = build_interleaved_features(x, 1)
labels = rng.integers(0, 40, N).astype(np.int32)

mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
model = GraphSAGE(hidden=256, out=40, num_layers=3)
init_fn, train_step, _ = make_partitioned_trainer(
    model, [15, 10, 5], mesh, learning_rate=1e-3, capacity_factor=1.3)

with mesh:
    sh = NamedSharding(mesh, P("data"))
    g_d = jax.device_put(pg, sh)
    xi_d = jax.device_put(jnp.asarray(xi), sh)
    seeds = jax.device_put(jnp.arange(B, dtype=jnp.int32), sh)
    lab = jax.device_put(jnp.asarray(labels[:B]), sh)
    key = jax.random.key(0)
    t0 = time.time()
    state = init_fn(key, g_d, xi_d, seeds)
    print(f"init: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    state, loss, acc, ovf = train_step(state, key, g_d, xi_d, seeds, lab)
    jax.block_until_ready(loss)
    print(f"compile+step: {time.time()-t0:.1f}s", flush=True)
    K = 20
    t0 = time.perf_counter()
    for _ in range(K):
        state, loss, acc, ovf = train_step(state, key, g_d, xi_d, seeds,
                                           lab)
    float(loss)
    dt = (time.perf_counter() - t0) / K
    print(f"arxiv-scale partitioned step: {dt*1e3:.1f} ms  "
          f"loss={float(loss):.3f} overflow={int(ovf)}", flush=True)
