"""OGB dataset loaders (gated) + scale-matched synthetic stand-ins.

The OGB package and network egress are unavailable in the build image, so
:func:`load_ogbn` uses the real ``ogb`` package when importable and
otherwise raises with instructions; :func:`synthetic_ogbn` generates
scale-matched power-law graphs (node/edge counts and feature dims of the
real datasets) for benchmarking the BASELINE configs without downloads.
"""
from __future__ import annotations

import numpy as np

from .dataset import Data

# (num_nodes, num_edges, feat_dim, num_classes) of the real datasets
OGBN_SPECS = {
    "ogbn-arxiv": (169_343, 1_166_243, 128, 40),
    "ogbn-products": (2_449_029, 61_859_140, 100, 47),
    "ogbn-mag-paper": (736_389, 5_416_271, 128, 349),
}


def load_ogbn(name: str, root: str = "data/ogb") -> Data:
    """Load a real OGB node-property dataset (requires the ogb package +
    downloaded data)."""
    try:
        from ogb.nodeproppred import NodePropPredDataset
    except ImportError as e:
        raise ImportError(
            "the 'ogb' package is not installed in this environment; use "
            "tch_geometric_tpu.data.ogb.synthetic_ogbn(name) for a "
            "scale-matched synthetic stand-in") from e
    ds = NodePropPredDataset(name=name, root=root)
    g, labels = ds[0]
    return Data(x=g["node_feat"].astype(np.float32),
                edge_index=g["edge_index"].astype(np.int64),
                y=labels.reshape(-1).astype(np.int64))


def synthetic_ogbn(name: str, *, seed: int = 0,
                   scale: float = 1.0) -> Data:
    """Scale-matched synthetic stand-in: power-law-ish degree profile via
    preferential-attachment-style sampling, matching node/edge counts and
    feature dims of the named dataset (optionally down-scaled)."""
    n, e, f, c = OGBN_SPECS[name]
    n = max(int(n * scale), 1000)
    e = max(int(e * scale), 10 * n)
    rng = np.random.default_rng(seed)
    # heavy-tailed source popularity: zipf-like via pareto ranks
    pop = (1.0 / (np.arange(n) + 10.0)) ** 0.8
    pop /= pop.sum()
    src = rng.choice(n, size=e, p=pop)
    dst = rng.integers(0, n, size=e)
    x = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, c, size=n).astype(np.int64)
    return Data(x=x, edge_index=np.stack([src, dst]).astype(np.int64), y=y)
