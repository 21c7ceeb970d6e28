"""BASELINE config 5 sampler family over a partitioned topology.

Every sampler the reference offers, running DISTRIBUTED: the adjacency is
edge-partitioned across the mesh (each device owns rows of nodes
``v % P == dev``), and every hop/step routes requests to owner devices
through ``all_to_all`` exchanges.  Draws are keyed by global uids, so the
outputs are bit-identical for ANY device count — run this with
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
on a dev box or as-is on a TPU slice.

Mirrors the reference example sequence (neighbor sampling -> weighted ->
temporal -> walks; /root/reference/examples/neighbor_sampling.py,
random_walk.py) on the distributed API.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
import numpy as np
from jax.sharding import Mesh

from tch_geometric_tpu.data.io import load_karate_graph
from tch_geometric_tpu.data.storage import to_csc, to_csr
from tch_geometric_tpu.parallel import (
    build_partitioned_graph, dist_biased_tempo_random_walk,
    dist_budget_sample, dist_random_walk, dist_sample_neighbors,
    effective_edge_ts)
from tch_geometric_tpu.parallel.dist_hgt import (build_partitioned_hetero,
                                                 dist_hgt_sample)

P = min(len(jax.devices()), 8)
mesh = Mesh(np.array(jax.devices()[:P]), ("data",))
print(f"mesh: {P} devices ({jax.devices()[0].platform})")

x, y, edge_index = load_karate_graph()
cp, ri, _ = to_csc(np.asarray(edge_index), 34)
rp, ci, _ = to_csr(np.asarray(edge_index), 34)
key = jax.random.key(0)
seeds = np.arange(8, dtype=np.int32)

# -- distributed neighbor sampling (uniform + weighted + temporal) --------
g = build_partitioned_graph(np.asarray(cp), np.asarray(ri), P)
sample, ovf = dist_sample_neighbors(key, g, seeds, (4, 3), mesh,
                                    capacity_factor=4.0, num_rounds=2)
n_valid = int(np.asarray(sample.node_valid).sum())
print(f"neighbor [4,3]: {n_valid} sampled nodes, overflow "
      f"{int(np.asarray(ovf).sum())}")

rng = np.random.default_rng(0)
E = np.asarray(ri).shape[0]
gw = build_partitioned_graph(np.asarray(cp), np.asarray(ri), P,
                             edge_weights=rng.uniform(0.1, 5.0, E))
sample, _ = dist_sample_neighbors(key, gw, seeds, (4, 3), mesh,
                                  weighted=True, capacity_factor=4.0)
print(f"weighted: {int(np.asarray(sample.edge_valid).sum())} edges")

# -- distributed budget sampling ------------------------------------------
sample, _ = dist_budget_sample(key, g, seeds, (4, 3), mesh,
                               capacity_factor=4.0)
print(f"budget [4,3]: {int(np.asarray(sample.edge_valid).sum())} edges")

# -- distributed walks (node2vec + CTDNE) ---------------------------------
gwalk = build_partitioned_graph(np.asarray(rp), np.asarray(ci), P)
walks, _ = dist_random_walk(key, gwalk, seeds, 10, mesh, p=2.0, q=0.5,
                            capacity_factor=4.0)
print(f"node2vec walks: {np.asarray(walks).reshape(8, 11)[0]}")

ts = effective_edge_ts(np.asarray(ci), rng.integers(0, 100, len(np.asarray(ci))),
                       rng.integers(0, 100, 34))
gt = build_partitioned_graph(np.asarray(rp), np.asarray(ci), P,
                             edge_timestamps=ts)
walks, wts, _ = dist_biased_tempo_random_walk(
    key, gt, seeds, np.zeros(8, np.int32), 8, "exponential", mesh,
    capacity_factor=4.0)
print(f"CTDNE walks: {np.asarray(walks).reshape(8, 8)[0]}")

# -- distributed negative sampling ----------------------------------------
from tch_geometric_tpu.parallel.dist_negative import dist_negative_sample

w, acc, _ = dist_negative_sample(key, g, seeds, 5, 20, mesh,
                                 capacity_factor=4.0)
print(f"negative: {int(np.asarray(acc).sum())}/40 accepted non-edges")

# -- distributed HGT (homogeneous projection: 1 type, 1 relation) ---------
rels = build_partitioned_hetero({"v__r__v": np.asarray(cp)},
                                {"v__r__v": np.asarray(ri)},
                                [("v", "r", "v")], P,
                                node_counts={"v": 34})
(nodes, _ts2, valid, _r, _c, _e, ev), _ = dist_hgt_sample(
    key, rels, [("v", "r", "v")], {"v": seeds.astype(np.int64)},
    {"v": [8, 8]}, 2, mesh, node_counts={"v": 34}, capacity_factor=4.0)
print(f"HGT: {int(np.asarray(valid['v']).sum())} nodes, "
      f"{int(np.asarray(ev['v__r__v']).sum())} induced edges")
print("done — all samplers ran over the partitioned topology")
