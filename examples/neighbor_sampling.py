"""Raw-API neighbor sampling feeding GraphSAGE — the native analogue of
/root/reference/examples/neighbor_sampling.py (standard + weighted +
temporal), with the PyG ``filter_data``+``SAGEConv`` downstream replaced by
the built-in tree-forward GraphSAGE.

Run: python examples/neighbor_sampling.py  (add JAX_PLATFORM_NAME=cpu to
force CPU.)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import tch_geometric_tpu as tgt
from tch_geometric_tpu.data import Data, csc_graph_from_coo
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.sampling.neighbor import sample_neighbors

samples_per_node = 4
num_neighbors = [4, 3]

data = Data.from_npz(os.path.join(os.path.dirname(__file__), "..",
                                  "tests", "fixtures", "fakedataset.npz"))
col_ptrs, row_indices, perm = tgt.to_csc(data.edge_index, data.num_nodes)
graph = data.csc()

# --- Standard sampling (parity API) -----------------------------------
start = np.arange(8, dtype=np.int64)
samples, rows, cols, edge_index, layer_offsets = tgt.neighbor_sampling_homogenous(
    col_ptrs, row_indices, np.tile(start, samples_per_node), num_neighbors)
print("sampled", len(samples), "nodes,", len(rows), "edges")

# --- Device-native path: sample -> model, no host round trip ----------
model = GraphSAGE(hidden=32, out=32, num_layers=2)
sample = sample_neighbors(graph, np.tile(start, samples_per_node),
                          num_neighbors, key=jax.random.key(0))
x = jnp.asarray(data.x)[np.asarray(sample.nodes)]
params = model.init(jax.random.key(1), sample, x, method=GraphSAGE.tree_forward)
out = model.apply(params, sample, x, method=GraphSAGE.tree_forward)
print("GraphSAGE output:", out.shape)

# --- Weighted sampling -------------------------------------------------
weights = np.random.default_rng(0).random(row_indices.shape[0])
samples, *_ = tgt.neighbor_sampling_homogenous(
    col_ptrs, row_indices, np.tile(start, samples_per_node), num_neighbors,
    sampler=tgt.WeightedEdgeSampler(weights))
print("weighted:", len(samples), "nodes")

# --- Temporal filtering ------------------------------------------------
initial_ts = np.random.default_rng(1).integers(0, 5, start.shape[0] * samples_per_node)
timestamps = np.random.default_rng(2).integers(0, 5, row_indices.shape[0])
samples, rows, cols, eptr, offs = tgt.neighbor_sampling_homogenous(
    col_ptrs, row_indices, np.tile(start, samples_per_node), num_neighbors,
    filter=(tgt.TemporalEdgeFilter((0, 3), timestamps.astype(np.int64)),
            initial_ts.astype(np.int64)))
print("temporal:", len(samples), "nodes,", len(rows), "edges")
