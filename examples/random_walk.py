"""node2vec walks + skip-gram training — analogue of
/root/reference/examples/random_walk.py, with PyG's Node2Vec module replaced
by the native one (walks sampled on device inside the train step)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import tch_geometric_tpu as tgt
from tch_geometric_tpu.data import Data
from tch_geometric_tpu.models import Node2Vec, make_node2vec_trainer

walk_length = 10
walks_per_node = 4
p, q = 1.0, 1.5

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
data = Data.from_npz(os.path.join(FIX, "fakedataset.npz"))
row_ptrs, col_indices, perm = tgt.to_csr(data.edge_index, data.num_nodes)

# Raw parity API: batched walks
start = np.arange(data.num_nodes, dtype=np.int64)
walks = tgt.random_walk(row_ptrs, col_indices,
                        np.tile(start, walks_per_node), walk_length, p, q)
print("walks:", walks.shape)

# Skip-gram training with on-device walks
model = Node2Vec(num_nodes=data.num_nodes, embedding_dim=32,
                 context_size=5, num_negative=2)
init_fn, train_step = make_node2vec_trainer(
    model, data.csr(), walk_length=walk_length, p=p, q=q, learning_rate=0.025)
key = jax.random.key(0)
starts = jnp.tile(jnp.arange(data.num_nodes), walks_per_node)
state = init_fn(key, starts)
for i in range(20):
    state, loss = train_step(state, key, starts)
    if i % 5 == 0:
        print(f"step {i}: loss {float(loss):.4f}")
emb = model.apply(state.params, jnp.arange(data.num_nodes))
print("embeddings:", emb.shape)
