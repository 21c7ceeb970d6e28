"""Typed (HGT) training over a FULLY PARTITIONED heterogeneous graph.

The typed analogue of examples/train_partitioned.py: per-relation
adjacency AND per-type feature tables are sharded across the mesh;
each step runs the distributed HGT sampler (sharded fixed-point score
budgets, owner-routed budget updates, distributed score^2 top-k), a
two-all_to_all feature fetch per type, and the relation-typed HGT model
whose per-layer psum reassembles hidden states from per-device edge
blocks — one jitted step, nothing graph-sized replicated.

Reference surface this feeds: /root/reference/examples/hgt_sampling.py
(whose sampler exists to build batches for a downstream typed model).

Run (CPU, 8 virtual devices):
  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/hgt_partitioned.py
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

from tch_geometric_tpu.models.hgt import HGT
from tch_geometric_tpu.parallel.dist_hgt import build_partitioned_hetero
from tch_geometric_tpu.parallel.hgt_train import make_partitioned_hgt_trainer
from tch_geometric_tpu.parallel.multihost import put_partitioned
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features)
from tch_geometric_tpu.utils.types import rel_key

Pn = min(4, len(jax.devices()))
mesh = Mesh(np.array(jax.devices()[:Pn]), ("data",))

# a small synthetic 2-type / 3-relation graph
rng = np.random.default_rng(0)
node_counts = {"paper": 120, "author": 80}
edge_types = [("paper", "cites", "paper"), ("author", "writes", "paper"),
              ("paper", "rev_writes", "author")]
col_ptrs, row_indices = {}, {}
for (s, rel, d) in edge_types:
    r = rel_key((s, rel, d))
    E = 600
    src = rng.integers(0, node_counts[s], E)
    dst = np.sort(rng.integers(0, node_counts[d], E))
    col_ptrs[r] = np.searchsorted(dst, np.arange(node_counts[d] + 1))
    row_indices[r] = src.astype(np.int64)

rels = build_partitioned_hetero(col_ptrs, row_indices, edge_types, Pn,
                                node_counts=node_counts)
x_np = {t: rng.normal(size=(n, 16)).astype(np.float32)
        for t, n in node_counts.items()}
labels = rng.integers(0, 4, 16).astype(np.int32)
seeds = np.arange(16, dtype=np.int32)

rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in edge_types))
model = HGT(hidden=32, out=4, num_layers=2,
            node_types=tuple(sorted(node_counts)), rel_specs=rel_specs,
            out_type="paper", heads=2)
init_fn, train_step, eval_step = make_partitioned_hgt_trainer(
    model, edge_types, {t: [8, 8] for t in node_counts}, 2, node_counts,
    mesh, seed_type="paper", learning_rate=1e-2, capacity_factor=8.0)

key = jax.random.key(0)
with mesh:
    sh = NamedSharding(mesh, P("data"))
    rels_put = {r: put_partitioned(rels[r], mesh, P("data")) for r in rels}
    x_put = {t: jax.device_put(
        jnp.asarray(build_interleaved_features(x_np[t], Pn)), sh)
        for t in node_counts}
    state = init_fn(key, rels_put, x_put, seeds)
    for step in range(30):
        state, loss, acc, ovf = train_step(state, key, rels_put, x_put,
                                           seeds, labels)
        if step % 10 == 0:
            print(f"step {step:3d}  loss {float(loss):.4f}  "
                  f"acc {float(acc):.3f}  overflow {int(ovf)}")
    eloss, eacc = eval_step(state, key, rels_put, x_put, seeds, labels)
    print(f"final eval: loss {float(eloss):.4f}  acc {float(eacc):.3f}")
