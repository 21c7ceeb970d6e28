"""Fully distributed sampled training: adjacency AND features partitioned
across the mesh (parallel/dist_sampling.py) — the production setup when the
TOPOLOGY itself exceeds one chip (ogbn-papers100M-class graphs).

Each device owns the adjacency rows and feature rows of nodes
``v % P == dev``.  Every sampling hop routes frontier requests to their
owners via ``all_to_all``; owners sample their local rows with slot-uid
counter-based keys, so the sampled trees are bit-identical for any device
count.  Nothing graph-sized is replicated.

Runs on a virtual 8-device CPU mesh out of the box:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORM_NAME=cpu \
        python examples/train_partitioned.py
On a real TPU slice the same code shards over the physical chips.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if jax.device_count() < 2:  # fall back to the virtual mesh
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tch_geometric_tpu.data import Data
from tch_geometric_tpu.data.storage import to_csc
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel import (build_interleaved_features,
                                        build_partitioned_graph,
                                        make_partitioned_trainer)

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
data = Data.from_npz(os.path.join(FIX, "fakedataset.npz"))
labels = jnp.asarray(data.y)

n_dev = jax.device_count()
mesh = Mesh(np.array(jax.devices()), ("data",))

col_ptrs, row_indices, _perm = to_csc(np.asarray(data.edge_index),
                                      data.num_nodes)
pgraph = build_partitioned_graph(np.asarray(col_ptrs),
                                 np.asarray(row_indices), n_dev)
xi = build_interleaved_features(np.asarray(data.x), n_dev)

model = GraphSAGE(hidden=64, out=int(data.y.max()) + 1, num_layers=2)
init_fn, train_step, eval_step = make_partitioned_trainer(
    model, [10, 5], mesh, learning_rate=3e-3, capacity_factor=2.0)

with mesh:
    sh = NamedSharding(mesh, P("data"))
    g_d = jax.device_put(pgraph, sh)
    xi_d = jax.device_put(jnp.asarray(xi), sh)
    B = 16 * n_dev
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    seeds0 = jax.device_put(jnp.arange(B, dtype=jnp.int32), sh)
    state = init_fn(key, g_d, xi_d, seeds0)
    for step in range(40):
        seeds_np = rng.choice(data.num_nodes, B, replace=False)
        seeds = jax.device_put(jnp.asarray(seeds_np.astype(np.int32)), sh)
        lab = jax.device_put(labels[jnp.asarray(seeds_np)], sh)
        state, loss, acc, overflow = train_step(state, key, g_d, xi_d,
                                                seeds, lab)
        if step % 10 == 9:
            print(f"step {step}: loss {float(loss):.3f} acc {float(acc):.2f}"
                  f" overflow {int(overflow)}", flush=True)
    loss, acc = eval_step(state, key, g_d, xi_d, seeds0, labels[:B])
    rows = pgraph.rows_per_part
    print(f"eval: loss {float(loss):.3f} acc {float(acc):.2f} "
          f"({n_dev} devices; {rows} adjacency rows + "
          f"{xi.shape[0] // n_dev} feature rows per device)")
