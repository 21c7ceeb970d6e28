"""Link prediction with on-device negative sampling.

What the reference's negative sampler feeds (a downstream PyG
link-prediction model, /root/reference/examples/negative_sampling.py) —
here the whole pipeline is one jitted step: sample trees for the batch
edges' endpoints and the rejected corrupt destinations, GNN-encode,
dot-decode, masked BCE.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.data.io import load_karate_graph
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel import make_link_trainer

x, _y, edge_index = load_karate_graph()
g = csc_graph_from_coo(edge_index, 34)
xf = jnp.asarray(np.asarray(x, np.float32))
ei = np.asarray(edge_index)
rng = np.random.default_rng(0)
pick = rng.choice(ei.shape[1], 64)
src = jnp.asarray(ei[0, pick].astype(np.int32))
dst = jnp.asarray(ei[1, pick].astype(np.int32))

model = GraphSAGE(hidden=32, out=16, num_layers=2)
init_fn, train_step, eval_step = make_link_trainer(
    model, [4, 3], num_neg=4, learning_rate=1e-2)
key = jax.random.key(0)
state = init_fn(key, g, xf, src, dst)
_loss0, auc0 = eval_step(state, key, g, xf, src, dst)
for step in range(60):
    state, loss, auc = train_step(state, key, g, xf, src, dst)
print(f"ranking accuracy {float(auc0):.2f} -> {float(auc):.2f} "
      f"(loss {float(loss):.3f})")
