"""Negative sampling — analogue of
/root/reference/examples/negative_sampling.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tch_geometric_tpu.data import Data
from tch_geometric_tpu.transforms import NegativeSamplerTransform

FIX = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
data = Data.from_npz(os.path.join(FIX, "fakedataset.npz"))

inputs = np.arange(data.num_nodes, dtype=np.int64)
transform = NegativeSamplerTransform(data, 5, 5, inbound=False)
batch = transform(inputs)
print("negative batch:", batch.x.shape, batch.edge_index.shape)
