"""Multislice (DCN) training with the HIERARCHICAL partitioned plan.

The round-5 `hier=(slice_axis, chip_axis)` mode of
`make_partitioned_trainer` runs over a 2-axis `(dcn, ici)` mesh:

* the graph topology is SLICE-REPLICATED — built with
  ``num_parts = chips_per_slice`` and sharded ``P("ici")``, so every
  sampling all_to_all rides the intra-slice ICI axis and DCN carries no
  sampling traffic at all;
* the feature table stays partitioned over ALL S*C devices
  (``P(("dcn", "ici"))``) and is fetched by ONE static slice-axis
  all_gather of each device's own shard plus an intra-slice routed
  exchange — (S-1) * ceil(N/P) * F bytes over DCN per step instead of
  per-request rows (~64x fewer at products scale; projected 2-slice
  weak-scaling efficiency 84-91% vs 31-46% for the flat plan,
  scripts/project_multichip.py).

Sampled trees and fetched rows are bit-identical to the flat plan
(uid-keyed draws), so this is a free swap on any multislice deployment:
the mesh shape IS the configuration.

Run (CPU, 2 virtual slices x 4 virtual chips):
  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/train_multislice_hier.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
if "XLA_FLAGS" not in os.environ:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax
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
# NOTE the env vars must be set BEFORE python starts (a site hook may
# pre-import jax); with a single visible device this degenerates to a
# (1, 1) mesh — still correct, just not exercising the hierarchy.
S = 2 if n_dev >= 2 else 1              # (virtual) slices
C = max(n_dev // S, 1)                  # chips per slice
mesh = Mesh(np.array(jax.devices()[: S * C]).reshape(S, C), ("dcn", "ici"))

col_ptrs, row_indices, _perm = to_csc(np.asarray(data.edge_index),
                                      data.num_nodes)
# topology: C parts, replicated across slices via the P("ici") sharding
pgraph = build_partitioned_graph(np.asarray(col_ptrs),
                                 np.asarray(row_indices), C)
# features: interleaved over ALL S*C devices — nothing replicated
xi = build_interleaved_features(np.asarray(data.x), S * C)

model = GraphSAGE(hidden=64, out=int(data.y.max()) + 1, num_layers=2)
init_fn, train_step, eval_step = make_partitioned_trainer(
    model, [10, 5], mesh, learning_rate=3e-3, capacity_factor=2.0,
    hier=("dcn", "ici"), exchange_dtype=jnp.bfloat16)

with mesh:
    both = NamedSharding(mesh, P(("dcn", "ici")))
    chip = NamedSharding(mesh, P("ici"))
    g_d = jax.device_put(pgraph, chip)
    xi_d = jax.device_put(jnp.asarray(xi), both)
    B = 8 * S * C
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    seeds0 = jax.device_put(jnp.arange(B, dtype=jnp.int32), both)
    state = init_fn(key, g_d, xi_d, seeds0)
    for step in range(40):
        seeds_np = rng.choice(data.num_nodes, B, replace=False)
        seeds = jax.device_put(jnp.asarray(seeds_np.astype(np.int32)), both)
        lab = jax.device_put(labels[jnp.asarray(seeds_np)], both)
        state, loss, acc, overflow = train_step(state, key, g_d, xi_d,
                                                seeds, lab)
        if step % 10 == 9:
            print(f"step {step}: loss {float(loss):.3f} acc {float(acc):.2f}"
                  f" overflow {int(overflow)}", flush=True)
    loss, acc = eval_step(state, key, g_d, xi_d, seeds0, labels[:B])
    print(f"eval: loss {float(loss):.3f} acc {float(acc):.2f} "
          f"({S} slices x {C} chips; topology {pgraph.rows_per_part} "
          f"rows/device replicated per slice, features "
          f"{xi.shape[0] // (S * C)} rows/device partitioned everywhere)")
