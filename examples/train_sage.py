"""End-to-end sampled GraphSAGE training with metrics + checkpointing —
the full production loop (BASELINE config 1/3 shape): on-device sampling
inside the jitted step, JSON-lines metrics, orbax checkpoint/resume."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tch_geometric_tpu.data import Data
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel import make_sage_trainer
from tch_geometric_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from tch_geometric_tpu.utils.metrics import MetricsLogger

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
data = Data.from_npz(os.path.join(FIX, "fakedataset.npz"))
graph = data.csc()
x = jnp.asarray(data.x)
labels = jnp.asarray(data.y)
fanouts = [10, 5]
batch_size = 128

model = GraphSAGE(hidden=64, out=int(data.y.max()) + 1, num_layers=2)
init_fn, train_step, eval_step = make_sage_trainer(model, fanouts,
                                                   learning_rate=3e-3)
key = jax.random.key(0)
seeds0 = jnp.arange(batch_size)
state = init_fn(key, graph, x, seeds0)
metrics = MetricsLogger(stream=sys.stdout)

rng = np.random.default_rng(0)
edges_per_batch = batch_size * fanouts[0] * (1 + fanouts[1])
for step in range(30):
    seeds = jnp.asarray(rng.choice(data.num_nodes, batch_size, replace=False))
    state, loss, acc = train_step(state, key, graph, x, seeds, labels[seeds])
    if step % 10 == 0:
        metrics.step(step, edges=edges_per_batch, batch_size=batch_size,
                     loss=loss, acc=acc)

# checkpoint + resume round trip
ckpt_dir = tempfile.mkdtemp(prefix="tgt_ckpt_")
path = save_checkpoint(ckpt_dir, state, step=int(state.step))
restored = restore_checkpoint(ckpt_dir, state, step=int(state.step))
loss, acc = eval_step(restored, key, graph, x, seeds0, labels[seeds0])
print(f"restored eval: loss {float(loss):.3f} acc {float(acc):.2f}")
