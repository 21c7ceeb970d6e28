"""Lightweight graph data containers (the PyG ``Data``/``HeteroData``
analogues the transform API wraps).

The reference's examples operate on PyG datasets and feed sampler outputs
through ``filter_data`` (examples/neighbor_sampling.py:21-24).  These
containers carry the same payload — node features, labels, COO edges, edge
attributes — as host numpy plus cached device-side CSC/CSR structures, so
transforms can sample on device and gather features without PyG.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

from ..utils.types import EdgeType, NodeType, RelType, rel_key
from .graph import CscGraph, CsrGraph
from .storage import csc_graph_from_coo, csr_graph_from_coo


@dataclass
class Data:
    """Homogeneous graph: x (N, F), optional y (N,), edge_index (2, E),
    optional per-edge attrs keyed by name (original COO order)."""

    x: np.ndarray
    edge_index: np.ndarray
    y: Optional[np.ndarray] = None
    edge_attrs: Dict[str, np.ndarray] = field(default_factory=dict)

    _csc: Optional[CscGraph] = field(default=None, repr=False)
    _csr: Optional[CsrGraph] = field(default=None, repr=False)

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])

    def csc(self) -> CscGraph:
        if self._csc is None:
            self._csc = csc_graph_from_coo(self.edge_index, self.num_nodes)
        return self._csc

    def csr(self) -> CsrGraph:
        if self._csr is None:
            self._csr = csr_graph_from_coo(self.edge_index, self.num_nodes)
        return self._csr

    @staticmethod
    def from_npz(path: str) -> "Data":
        d = np.load(path)
        return Data(x=d["x"].astype(np.float32),
                    y=d["y"].astype(np.int64) if "y" in d.files else None,
                    edge_index=d["edge_index"].astype(np.int64))


@dataclass
class HeteroData:
    """Heterogeneous graph: per-type features, per-edge-type COO."""

    x: Dict[NodeType, np.ndarray]
    edge_index: Dict[EdgeType, np.ndarray]
    y: Dict[NodeType, np.ndarray] = field(default_factory=dict)
    edge_attrs: Dict[EdgeType, Dict[str, np.ndarray]] = field(default_factory=dict)

    _csc: Dict[RelType, CscGraph] = field(default_factory=dict, repr=False)
    _csr: Dict[RelType, CsrGraph] = field(default_factory=dict, repr=False)

    @property
    def node_types(self):
        return sorted(self.x.keys())

    @property
    def edge_types(self):
        return sorted(self.edge_index.keys())

    def num_nodes(self, t: NodeType) -> int:
        return int(self.x[t].shape[0])

    @property
    def node_counts(self) -> Dict[NodeType, int]:
        return {t: self.num_nodes(t) for t in self.x}

    def size(self, e: EdgeType) -> Tuple[int, int]:
        return (self.num_nodes(e[0]), self.num_nodes(e[2]))

    def csc(self, e: EdgeType) -> CscGraph:
        r = rel_key(e)
        if r not in self._csc:
            self._csc[r] = csc_graph_from_coo(self.edge_index[e], self.size(e))
        return self._csc[r]

    def csr(self, e: EdgeType) -> CsrGraph:
        r = rel_key(e)
        if r not in self._csr:
            self._csr[r] = csr_graph_from_coo(self.edge_index[e], self.size(e))
        return self._csr[r]

    @staticmethod
    def from_npz(path: str) -> "HeteroData":
        """io.rs:21-65 key scheme: node_{t}_x / edge_{s-r-d}_edge_index."""
        d = np.load(path)
        x: Dict[str, np.ndarray] = {}
        y: Dict[str, np.ndarray] = {}
        ei: Dict[EdgeType, np.ndarray] = {}
        for k in d.files:
            if k.startswith("node_") and k.endswith("_x"):
                x[k[5:-2]] = d[k].astype(np.float32)
            elif k.startswith("node_") and k.endswith("_y"):
                y[k[5:-2]] = d[k].astype(np.int64)
            elif k.startswith("edge_") and k.endswith("_edge_index"):
                s, r, t = k[5:-11].split("-")
                ei[(s, r, t)] = d[k].astype(np.int64)
        return HeteroData(x=x, y=y, edge_index=ei)
