"""Type stubs for the reference-parity API surface.

Mirrors /root/reference/tch_geometric/tch_geometric.pyi:12-146 — the same
11 functions with the same signatures and return shapes, so a user of the
reference can diff this file against theirs.  (Unlike the reference, the
real implementations carry these signatures natively; this stub is the
parity contract.)
"""
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

NodeType = str
RelType = str
EdgeType = Tuple[str, str, str]
LayerOffset = Tuple[int, int, int]
Array = np.ndarray

from .utils.config import EdgeSampler, TemporalEdgeFilter


def to_csc(row_col: Array, size: Union[int, Tuple[int, int]]
           ) -> Tuple[Array, Array, Array]: ...


def to_csr(row_col: Array, size: Union[int, Tuple[int, int]]
           ) -> Tuple[Array, Array, Array]: ...


def neighbor_sampling_homogenous(
    col_ptrs: Array,
    row_indices: Array,
    inputs: Array,
    num_neighbors: List[int],
    sampler: Optional[EdgeSampler] = ...,
    filter: Optional[Tuple[TemporalEdgeFilter, Array]] = ...,
) -> Tuple[Array, Array, Array, Array, List[LayerOffset]]: ...


def neighbor_sampling_heterogenous(
    node_types: List[NodeType],
    edge_types: List[EdgeType],
    col_ptrs: Dict[RelType, Array],
    row_indices: Dict[RelType, Array],
    inputs: Dict[NodeType, Array],
    num_neighbors: Dict[RelType, List[int]],
    num_hops: int,
    sampler: Optional[EdgeSampler] = ...,
    filter: Optional[Tuple[TemporalEdgeFilter, Dict[NodeType, Array]]] = ...,
) -> Tuple[Dict[NodeType, Array], Dict[RelType, Array],
           Dict[RelType, Array], Dict[RelType, Array],
           Dict[RelType, List[LayerOffset]]]: ...


def hgt_sampling(
    node_types: List[NodeType],
    edge_types: List[EdgeType],
    col_ptrs: Dict[RelType, Array],
    row_indices: Dict[RelType, Array],
    row_timestamps: Optional[Dict[RelType, Array]],
    inputs: Dict[NodeType, Array],
    input_timestamps: Optional[Dict[NodeType, Array]],
    num_samples: Dict[NodeType, List[int]],
    num_hops: int,
    timerange: Optional[Tuple[int, int]] = ...,
) -> Tuple[Dict[NodeType, Array], Dict[NodeType, Array],
           Dict[RelType, Array], Dict[RelType, Array],
           Dict[RelType, Array]]: ...


def budget_sampling(
    node_types: List[NodeType],
    edge_types: List[EdgeType],
    col_ptrs: Dict[RelType, Array],
    row_indices: Dict[RelType, Array],
    row_timestamps: Optional[Dict[RelType, Array]],
    inputs: Dict[NodeType, Array],
    input_timestamps: Optional[Dict[NodeType, Array]],
    num_neighbors: Dict[NodeType, List[int]],
    num_hops: int,
    window: Optional[Tuple[int, int]] = ...,
    forward: bool = ...,
    relative: bool = ...,
) -> Tuple[Dict[NodeType, Array], Dict[NodeType, Array],
           Dict[RelType, Array], Dict[RelType, Array],
           Dict[RelType, Array], Dict[RelType, List[LayerOffset]]]: ...


def random_walk(
    row_ptrs: Array,
    col_indices: Array,
    start: Array,
    walk_length: int,
    p: float = ...,
    q: float = ...,
) -> Array: ...


def tempo_random_walk(
    row_ptrs: Array,
    col_indices: Array,
    node_timestamps: Array,
    edge_timestamps: Array,
    start: Array,
    start_timestamps: Array,
    walk_length: int,
    window: Tuple[int, int],
) -> Tuple[Array, Array]: ...


def biased_tempo_random_walk(
    row_ptrs: Array,
    col_indices: Array,
    node_timestamps: Array,
    edge_timestamps: Array,
    start: Array,
    start_timestamps: Array,
    walk_length: int,
    walk_bias: str,
    forward: bool = ...,
    retry_count: int = ...,
) -> Tuple[Array, Array]: ...


def negative_sample_neighbors_homogenous(
    row_ptrs: Array,
    col_indices: Array,
    graph_size: Tuple[int, int],
    inputs: Array,
    num_neg: int,
    try_count: int,
) -> Tuple[Array, Array, Array, int]: ...


def negative_sample_neighbors_heterogenous(
    node_types: List[NodeType],
    edge_types: List[EdgeType],
    row_ptrs: Dict[RelType, Array],
    col_indices: Dict[RelType, Array],
    sizes: Dict[RelType, Tuple[int, int]],
    inputs: Dict[NodeType, Array],
    num_neg: int,
    try_count: int,
    inbound: bool = ...,
) -> Tuple[Dict[NodeType, Array], Dict[RelType, Array],
           Dict[RelType, Array], Dict[NodeType, int]]: ...


def rng_reseed(value: int) -> object: ...
