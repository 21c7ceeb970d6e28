"""Transform-level API: dataset-wrapped callable samplers.

The reference's examples import ``tch_geometric.transforms.{
NeighborSamplerTransform, HGTSamplerTransform, NegativeSamplerTransform}``
(examples/neighbor_sampling_typed.py:5, hgt_sampling.py:5-6,
negative_sampling.py:5) — modules that do not exist in its shipped package
(SURVEY §2.4); they document the intended high-level surface.  This module
implements that surface coherently: a transform wraps a ``Data``/
``HeteroData`` object, precomputes CSC/CSR + perm once, and is callable on
input-node batches, returning a filtered batch (features gathered, local-id
COO, original-order edge attributes via perm — the role PyG ``filter_data``
plays in examples/neighbor_sampling.py:21-24).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .data.dataset import Data, HeteroData
from .sampling import rng as _rng
from .sampling.hetero_neighbor import compact_hetero_sample, sample_hetero_neighbors
from .sampling.hgt import compact_hgt_sample, sample_hgt
from .sampling.negative import (
    negative_sample_neighbors_heterogenous,
    negative_sample_neighbors_homogenous,
)
from .sampling.neighbor import compact_sample, sample_neighbors
from .utils.config import EdgeSampler
from .utils.types import NodeType, RelType, rel_key


@dataclass
class Batch:
    """Homogeneous sampled batch (the ``filter_data`` output analogue)."""

    x: np.ndarray                 # (n, F) gathered features
    edge_index: np.ndarray        # (2, e) local-id COO
    n_id: np.ndarray              # (n,) global node ids
    e_id: np.ndarray              # (e,) original COO edge ids (-1 = none)
    y: Optional[np.ndarray] = None
    layer_offsets: Optional[List[Tuple[int, int, int]]] = None
    edge_attrs: Dict[str, np.ndarray] = field(default_factory=dict)


@dataclass
class HeteroBatch:
    x: Dict[NodeType, np.ndarray]
    edge_index: Dict[RelType, np.ndarray]
    n_id: Dict[NodeType, np.ndarray]
    e_id: Dict[RelType, np.ndarray]
    y: Dict[NodeType, np.ndarray] = field(default_factory=dict)
    node_timestamps: Dict[NodeType, np.ndarray] = field(default_factory=dict)
    layer_offsets: Dict[RelType, list] = field(default_factory=dict)


class NeighborSamplerTransform:
    """GraphSAGE-style neighbor sampling over Data or HeteroData."""

    def __init__(self, data: Union[Data, HeteroData],
                 num_neighbors: Union[List[int], Dict],
                 sampler: Optional[EdgeSampler] = None,
                 filter: Optional[tuple] = None,
                 num_hops: Optional[int] = None):
        self.data = data
        self.num_neighbors = num_neighbors
        self.sampler = sampler
        self.filter = filter
        self.hetero = isinstance(data, HeteroData)
        if self.hetero:
            self.graphs = {rel_key(e): data.csc(e) for e in data.edge_types}
            if isinstance(num_neighbors, list):
                self.num_neighbors = {rel_key(e): list(num_neighbors)
                                      for e in data.edge_types}
            self.num_hops = num_hops or len(next(iter(self.num_neighbors.values())))
        else:
            self.graph = data.csc()

    def __call__(self, inputs, key=None):
        if key is None:
            key = _rng.next_key()
        if self.hetero:
            return self._call_hetero(inputs, key)
        inputs = np.asarray(inputs)
        out = sample_neighbors(self.graph, inputs, self.num_neighbors,
                               key=key, sampler=self.sampler, filter=self.filter)
        samples, rows, cols, eptr, offs = compact_sample(out)
        perm = np.asarray(self.graph.perm)
        e_id = perm[eptr]
        batch = Batch(
            x=self.data.x[samples],
            edge_index=np.stack([rows, cols]),
            n_id=samples,
            e_id=e_id,
            y=None if self.data.y is None else self.data.y[samples],
            layer_offsets=offs,
            edge_attrs={k: v[e_id] for k, v in self.data.edge_attrs.items()},
        )
        return batch

    def _call_hetero(self, inputs, key):
        data: HeteroData = self.data
        inputs = {t: np.asarray(v) for t, v in inputs.items()}
        out = sample_hetero_neighbors(
            self.graphs, data.edge_types, inputs, self.num_neighbors,
            self.num_hops, node_types=data.node_types, key=key,
            sampler=self.sampler, filter=self.filter)
        samples, rows, cols, eptr, offs = compact_hetero_sample(out)
        e_id = {}
        edge_index = {}
        for e in data.edge_types:
            r = rel_key(e)
            perm = np.asarray(data.csc(e).perm)
            e_id[r] = perm[eptr[r]]
            edge_index[r] = np.stack([rows[r], cols[r]])
        return HeteroBatch(
            x={t: data.x[t][samples[t]] for t in samples},
            edge_index=edge_index,
            n_id=samples,
            e_id=e_id,
            y={t: data.y[t][samples[t]] for t in data.y if t in samples},
            layer_offsets=offs,
        )


class HGTSamplerTransform:
    """Budget-based (temporal) HGT sampling over HeteroData
    (examples/hgt_sampling.py:23-30 surface)."""

    def __init__(self, data: HeteroData, num_samples: Union[List[int], Dict],
                 num_hops: Optional[int] = None, temporal: bool = False):
        self.data = data
        if isinstance(num_samples, list):
            num_samples = {t: list(num_samples) for t in data.node_types}
        self.num_samples = num_samples
        self.num_hops = num_hops or len(next(iter(num_samples.values())))
        self.temporal = temporal
        self.graphs = {rel_key(e): data.csc(e) for e in data.edge_types}

    def __call__(self, inputs, input_timestamps=None, timerange=None, key=None):
        if key is None:
            key = _rng.next_key()
        data = self.data
        edge_ts = None
        if self.temporal:
            edge_ts = {}
            for e in data.edge_types:
                attrs = data.edge_attrs.get(e, {})
                if "timestamps" in attrs:
                    perm = np.asarray(data.csc(e).perm)
                    edge_ts[rel_key(e)] = np.asarray(
                        attrs["timestamps"])[perm].astype(np.int64)
        out = sample_hgt(
            self.graphs, data.edge_types,
            {t: np.asarray(v) for t, v in inputs.items()},
            self.num_samples, self.num_hops,
            node_counts=data.node_counts,
            edge_timestamps=edge_ts,
            input_timestamps=None if input_timestamps is None else
            {t: np.asarray(v) for t, v in input_timestamps.items()},
            timerange=timerange, node_types=data.node_types, key=key)
        nodes, ts, rows, cols, eptr = compact_hgt_sample(out)
        edge_index = {}
        e_id = {}
        for e in data.edge_types:
            r = rel_key(e)
            perm = np.asarray(data.csc(e).perm)
            edge_index[r] = np.stack([rows[r], cols[r]])
            e_id[r] = perm[eptr[r]]
        return HeteroBatch(
            x={t: data.x[t][nodes[t]] for t in nodes},
            edge_index=edge_index,
            n_id=nodes,
            e_id=e_id,
            y={t: data.y[t][nodes[t]] for t in data.y if t in nodes},
            node_timestamps=ts,
        )


class NegativeSamplerTransform:
    """Neighbor-aware negative sampling over Data or HeteroData
    (examples/negative_sampling.py surface)."""

    def __init__(self, data: Union[Data, HeteroData], num_neg: int,
                 try_count: int, inbound: bool = False):
        self.data = data
        self.num_neg = num_neg
        self.try_count = try_count
        self.inbound = inbound
        self.hetero = isinstance(data, HeteroData)

    def __call__(self, inputs, key=None):
        if key is None:
            key = _rng.next_key()
        if self.hetero:
            data: HeteroData = self.data
            rp = {rel_key(e): np.asarray(data.csr(e).indptr)
                  for e in data.edge_types}
            ci = {rel_key(e): np.asarray(data.csr(e).indices)
                  for e in data.edge_types}
            sizes = {rel_key(e): data.size(e) for e in data.edge_types}
            samples, rows, cols, counts = negative_sample_neighbors_heterogenous(
                data.node_types, data.edge_types, rp, ci, sizes,
                {t: np.asarray(v) for t, v in inputs.items()},
                self.num_neg, self.try_count, self.inbound, key=key)
            edge_index = {r: np.stack([rows[r], cols[r]]) for r in rows}
            return HeteroBatch(
                x={t: data.x[t][samples[t]] for t in samples},
                edge_index=edge_index,
                n_id=samples,
                e_id={r: np.full(rows[r].shape, -1, np.int64) for r in rows},
            )
        data: Data = self.data
        g = data.csr()
        samples, rows, cols, count = negative_sample_neighbors_homogenous(
            np.asarray(g.indptr), np.asarray(g.indices),
            (data.num_nodes, data.num_nodes), np.asarray(inputs),
            self.num_neg, self.try_count, key=key)
        return Batch(
            x=data.x[samples],
            edge_index=np.stack([rows, cols]),
            n_id=samples,
            e_id=np.full(rows.shape, -1, np.int64),
            y=None if data.y is None else data.y[samples],
        )
