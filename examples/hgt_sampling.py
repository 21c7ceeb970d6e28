"""HGT sampling (plain + temporal) — analogue of
/root/reference/examples/hgt_sampling.py, feeding the native HGT model."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tch_geometric_tpu.data import HeteroData
from tch_geometric_tpu.models import HGT
from tch_geometric_tpu.transforms import HGTSamplerTransform
from tch_geometric_tpu.utils.types import rel_key

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
data = HeteroData.from_npz(os.path.join(FIX, "fakeheterodataset.npz"))
for e in data.edge_types:
    data.edge_attrs[e] = {"timestamps": np.random.default_rng(0).integers(
        0, 5, data.edge_index[e].shape[1]).astype(np.int64)}

inputs = {"v0": np.arange(10, dtype=np.int64)}
inputs_timestamps = {"v0": np.random.default_rng(1).integers(0, 5, 10).astype(np.int64)}

transform = HGTSamplerTransform(data, num_samples=[8, 6])
batch1 = transform(inputs)
print("Sampled HGT:", {t: v.shape for t, v in batch1.x.items()})

transform = HGTSamplerTransform(data, num_samples=[8, 6], temporal=True)
batch2 = transform(inputs, inputs_timestamps, (0, 5))
print("Sampled Temporal HGT:", {t: v.shape for t, v in batch2.x.items()})

# Feed the sampled batch into the native HGT model.
rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in data.edge_types))
model = HGT(hidden=32, out=4, num_layers=2, node_types=data.node_types,
            rel_specs=rel_specs, out_type="v0")
feats = {t: jnp.asarray(v) for t, v in batch1.x.items()}
edges = {r: (jnp.asarray(ei[0]), jnp.asarray(ei[1]),
             jnp.ones(ei.shape[1], bool)) for r, ei in batch1.edge_index.items()}
params = model.init(jax.random.key(0), feats, edges)
out = model.apply(params, feats, edges)
print("HGT output:", out.shape)
