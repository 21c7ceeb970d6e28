from . import primitives, rng
from .neighbor import NeighborSample, compact_sample, neighbor_sampling_homogenous, sample_neighbors
from .hetero_neighbor import (
    HeteroNeighborSample,
    compact_hetero_sample,
    neighbor_sampling_heterogenous,
    sample_hetero_neighbors,
)
