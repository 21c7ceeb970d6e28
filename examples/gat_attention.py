"""Graph attention on the blocked edge layout.

The reference hands its sampled batches to PyG convs (GAT-style attention
included) — /root/reference/examples/neighbor_sampling.py:21-24.  Here the
whole attention path is native: per-edge SDDMM scores, an online
flash-attention-style edge softmax, and attention-weighted aggregation,
all scatter-free on the blocked-ELL layout (ops/attention_blocked.py), plus
the GAT/GATConv model consuming them.

Runs on CPU (interpret-mode kernels) or TPU as-is.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.data.io import load_karate_graph
from tch_geometric_tpu.models import GAT
from tch_geometric_tpu.ops import (attend_blocked, attend_blocked_fused,
                                   build_blocked)

interpret = jax.default_backend() != "tpu"
x, y, edge_index = load_karate_graph()
g = csc_graph_from_coo(edge_index, 34)
b = build_blocked(np.asarray(g.indptr), np.asarray(g.indices),
                  rows_per_block=128, chunk_edges=256)
xf = jnp.asarray(np.asarray(x, np.float32))

# transformer-style attention aggregation: composed vs fused kernels
out4 = attend_blocked(b, xf, xf, compute_dtype=jnp.float32,
                      interpret=interpret)
out2 = attend_blocked_fused(b, xf, xf, compute_dtype=jnp.float32,
                            interpret=interpret)
print(f"attend composed vs fused max diff: "
      f"{float(jnp.abs(out4 - out2).max()):.2e}")

# full-graph GAT model over the same adjacency
model = GAT(hidden=16, out=4, num_layers=2, heads=4)
params = model.init(jax.random.key(0), xf, g)
logits = model.apply(params, xf, g)
print(f"GAT full-graph logits: {logits.shape}, "
      f"finite={bool(jnp.isfinite(logits).all())}")
