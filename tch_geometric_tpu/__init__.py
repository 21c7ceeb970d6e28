"""tch_geometric_tpu — a TPU-native GNN sampling + message-passing framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
egordm/tch-geometric (reference at /root/reference): homogeneous and
heterogeneous neighbor sampling with uniform/weighted samplers and 3-mode
temporal filters, temporal HGT sampling, per-node budget sampling, node2vec /
temporal / CTDNE-biased random walks, neighbor-aware negative sampling and
COO->CSC/CSR conversion — plus the downstream message-passing path
(SpMM/SDDMM kernels, GraphSAGE/HGT models) the reference delegates to PyG,
and multi-chip scaling over ``jax.sharding`` meshes.

Two API levels:

* **Reference-parity functions** (this module's top level, mirroring
  /root/reference/tch_geometric/tch_geometric.pyi): host arrays in, compact
  host arrays out — drop-in behavioral parity.
* **Device-native API** (submodules): jitted samplers returning padded
  fixed-shape pytrees that feed models with no host round-trip.
"""

from . import data, loader, models, ops, parallel, sampling, transforms, utils
from .data.storage import to_csc, to_csr, ind2ptr_np as ind2ptr
from .sampling.rng import seed as rng_reseed
from .sampling.neighbor import (
    neighbor_sampling_homogenous,
    sample_neighbors,
)
from .sampling.hetero_neighbor import (
    neighbor_sampling_heterogenous,
    sample_hetero_neighbors,
)
from .sampling.walks import (
    biased_tempo_random_walk,
    random_walk,
    tempo_random_walk,
)
from .sampling.hgt import hgt_sampling, sample_hgt
from .sampling.budget import budget_sampling, sample_budget
from .sampling.negative import (
    negative_sample_neighbors_heterogenous,
    negative_sample_neighbors_homogenous,
)
from .utils.config import (
    TEMPORAL_SAMPLE_DYNAMIC,
    TEMPORAL_SAMPLE_RELATIVE,
    TEMPORAL_SAMPLE_STATIC,
    EdgeSampler,
    TemporalEdgeFilter,
    UniformEdgeSampler,
    WeightedEdgeSampler,
    validate_mixeddata,
)

__version__ = "0.1.0"
