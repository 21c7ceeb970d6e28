"""GraphSAGE — the downstream model the reference delegates to PyG.

Two execution paths:

* **Sampled-tree path** (``method=tree_forward``): consumes a padded
  ``NeighborSample`` directly on device.  Because every hop is a static
  ``(frontier, fanout)`` block, neighbor aggregation is ``reshape + masked
  mean`` — pure dense VPU work followed by MXU matmuls, no scatter/gather at
  all.  This is the sampling->training path with no host round-trip
  (BASELINE north star), replacing PyG's ``filter_data`` + ``SAGEConv``
  (examples/neighbor_sampling.py:21-24).
* **Full-graph path** (``__call__``): CSR SpMM aggregation per layer, for
  inference / the edges-per-second benchmark.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.graph import SparseGraph
from ..ops.spmm import spmm
from ..sampling.neighbor import NeighborSample


# torch.nn.Linear default init (kaiming_uniform(a=sqrt(5)) = U(±1/sqrt(fan_in)),
# bias U(±1/sqrt(fan_in))) — the init the reference's downstream PyG models
# get.  Measured on planted-label tasks (scripts/bench_accuracy.py): flax's
# default lecun_normal + zero bias converges markedly slower under dropout
# (stalls at 0.24 vs 0.30 val at equal epochs), so parity requires parity of
# init, not just of math.
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                     "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class SAGEConv(nn.Module):
    """out = W_self x + W_neigh agg(x_neighbors)  (+bias)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_self, x_agg):
        w_self = nn.Dense(self.features, use_bias=self.use_bias,
                          dtype=self.dtype, name="lin_self",
                          kernel_init=torch_kernel_init,
                          bias_init=torch_bias_init(x_self.shape[-1]))
        w_neigh = nn.Dense(self.features, use_bias=False,
                           dtype=self.dtype, name="lin_neigh",
                           kernel_init=torch_kernel_init)
        return w_self(x_self) + w_neigh(x_agg)


def tree_neighbor_mean(h: jax.Array, valid: jax.Array,
                       sample: NeighborSample, depth: int) -> jax.Array:
    """Masked mean of depth+1 children for each depth-``depth`` slot.

    Children of frontier slot i are slots ``base + i*k .. +k`` — static slot
    arithmetic, so this is a reshape + masked mean (no scatter)."""
    k = sample.fanouts[depth]
    lo, hi = sample.node_base[depth], sample.node_base[depth + 1]
    clo, chi = sample.node_base[depth + 1], sample.node_base[depth + 2]
    B = hi - lo
    child_h = h[clo:chi].reshape(B, k, -1)
    child_m = valid[clo:chi].reshape(B, k, 1).astype(child_h.dtype)
    s = (child_h * child_m).sum(axis=1)
    cnt = child_m.sum(axis=1)
    return s / jnp.maximum(cnt, 1.0)


class GraphSAGE(nn.Module):
    """Multi-layer GraphSAGE with mean aggregation.

    ``dropout`` (applied to hidden activations between layers, train only)
    matches the downstream PyG usage the reference delegates to — sampled
    GNN training overfits without it on small labeled graphs."""

    hidden: int
    out: int
    num_layers: int
    dtype: Optional[jnp.dtype] = None
    dropout: float = 0.0

    def setup(self):
        feats = [self.hidden] * (self.num_layers - 1) + [self.out]
        self.convs = [SAGEConv(f, dtype=self.dtype, name=f"conv{i}")
                      for i, f in enumerate(feats)]
        self.drop = nn.Dropout(rate=self.dropout)

    def _act(self, h, i, deterministic):
        if i < self.num_layers - 1:
            h = nn.relu(h)
            if self.dropout > 0.0:
                h = self.drop(h, deterministic=deterministic)
        return h

    def __call__(self, x, graph: SparseGraph, *, deterministic: bool = True):
        """Full-graph forward: x (N, F), CSC in-neighbor adjacency."""
        h = x
        for i, conv in enumerate(self.convs):
            agg = spmm(graph, h, agg="mean")
            h = conv(h, agg)
            h = self._act(h, i, deterministic)
        return h

    def blocked_forward(self, x, blocked, compute_dtype=jnp.bfloat16):
        """Full-graph forward over a (Segmented)BlockedCsr layout.

        The production inference path: the scatter-free MXU SpMM kernel per
        layer; pass a ``SegmentedBlockedCsr`` for graphs where the (E, F)
        gathered intermediate would not fit HBM (e.g. ogbn-products,
        F=256 -> ~16 GB unsegmented), or a ``HotSplitCsr``/``HotSplitSeg``
        (``build_blocked_hot{,_segmented}``) on power-law graphs — the
        hub-deduped compact-table split runs ~1.25x above the plain
        kernel's per-access wall at products scale (BASELINE.md)."""
        from ..ops.spmm_blocked import (HotSplitCsr, HotSplitSeg,
                                        SegmentedBlockedCsr)
        from ..ops.spmm_pallas import (spmm_blocked_auto,
                                       spmm_blocked_segmented,
                                       spmm_hot_split,
                                       spmm_hot_split_segmented)
        h = x
        for i, conv in enumerate(self.convs):
            if isinstance(blocked, HotSplitSeg):
                agg = spmm_hot_split_segmented(
                    blocked, h, agg="mean", compute_dtype=compute_dtype,
                    out_dtype=h.dtype)
            elif isinstance(blocked, HotSplitCsr):
                agg = spmm_hot_split(
                    blocked, h, agg="mean",
                    compute_dtype=compute_dtype).astype(h.dtype)
            elif isinstance(blocked, SegmentedBlockedCsr):
                agg = spmm_blocked_segmented(blocked, h, agg="mean",
                                             compute_dtype=compute_dtype,
                                             out_dtype=h.dtype)
            else:
                agg = spmm_blocked_auto(
                    blocked, h, agg="mean",
                    compute_dtype=compute_dtype).astype(h.dtype)
            h = conv(h, agg)
            h = self._act(h, i, True)
        return h

    def tree_forward(self, sample: NeighborSample, x, *,
                     deterministic: bool = True):
        """Sampled-batch forward: x (N_total, F) per-slot features.

        Layer j updates slots at depths 0..num_hops-1-j from depths one
        deeper; returns seed-node logits (num_seeds, out)."""
        assert sample.num_hops >= self.num_layers, (
            "need at least as many sampled hops as conv layers")
        h = x
        valid = sample.node_valid
        for j, conv in enumerate(self.convs):
            keep_depths = sample.num_hops - j  # depths 0..keep_depths-1 updated
            # per-depth aggregation is cheap VPU reshape+mean; the conv
            # matmuls are batched across depths into ONE (n_keep, F) matmul
            # pair — per-depth matmuls (85k/7.7k/512 rows) underutilize the
            # MXU and triple dispatch count (measured on the products-scale
            # step).  Equivalent because conv weights are shared per layer.
            aggs = jnp.concatenate(
                [tree_neighbor_mean(h, valid, sample, d)
                 for d in range(keep_depths)], axis=0)
            n_keep = sample.node_base[keep_depths]
            h = conv(h[:n_keep], aggs)
            h = self._act(h, j, deterministic)
        num_seeds = sample.node_base[1]
        return h[:num_seeds]
