"""Transform-level sampling — analogue of
/root/reference/examples/neighbor_sampling_typed.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tch_geometric_tpu.data import Data, HeteroData
from tch_geometric_tpu.transforms import NeighborSamplerTransform

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

data = Data.from_npz(os.path.join(FIX, "fakedataset.npz"))
inputs = np.arange(10, dtype=np.int64)
transform = NeighborSamplerTransform(data, num_neighbors=[4, 3])
batch = transform(inputs)
print("Sampled Homogenous:", batch.x.shape, batch.edge_index.shape)

hdata = HeteroData.from_npz(os.path.join(FIX, "fakeheterodataset.npz"))
transform = NeighborSamplerTransform(hdata, num_neighbors=[4, 3])
batch = transform({"v0": inputs})
print("Sampled Heterogenous:", {t: v.shape for t, v in batch.x.items()})
