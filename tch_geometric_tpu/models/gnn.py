"""GCN, GAT and GIN — additional message-passing model families.

All consume the same graph containers as GraphSAGE: full-graph CSR/CSC via
SpMM/SDDMM, and padded tree samples via dense reshape attention (GAT) /
normalized mean (GCN) / masked child sum into an MLP (GIN).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.graph import SparseGraph
from ..ops.segment import csr_row_ids, segment_softmax, segment_sum
from ..ops.spmm import spmm
from ..sampling.neighbor import NeighborSample
from .sage import torch_bias_init, torch_kernel_init


def tree_child_counts(sample: NeighborSample) -> jax.Array:
    """Valid-child count per tree slot (0 for the deepest layer's slots) —
    the sampled-subtree degree used for GCN normalization on tree batches."""
    parts = []
    for d in range(sample.num_hops):
        k = sample.fanouts[d]
        clo, chi = sample.node_base[d + 1], sample.node_base[d + 2]
        parts.append(sample.node_valid[clo:chi]
                     .reshape(-1, k).sum(axis=1).astype(jnp.int32))
    n_total = sample.node_base[sample.num_hops + 1]
    deepest = n_total - sample.node_base[sample.num_hops]
    parts.append(jnp.zeros((deepest,), jnp.int32))
    return jnp.concatenate(parts)


class GCNConv(nn.Module):
    """Symmetric-normalized graph convolution: D^-1/2 A D^-1/2 X W.

    Pass ``graph`` for the full-graph path, or ``sample`` (+``keep_depths``)
    for a padded-tree batch — normalization then uses the sampled-subtree
    degrees (valid-child counts), the tree analogue of PyG's
    NeighborLoader-sampled GCN."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, graph: Optional[SparseGraph] = None, *,
                 add_self_loops: bool = True,
                 sample: Optional[NeighborSample] = None,
                 keep_depths: Optional[int] = None,
                 child_counts: Optional[jax.Array] = None):
        w = nn.Dense(self.features, use_bias=True, dtype=self.dtype,
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(x.shape[-1]))
        h = w(x)
        if sample is not None:
            # child_counts: pass tree_child_counts(sample) in from the
            # caller when applying several layers — it only depends on the
            # sample, not the layer
            cnt = (child_counts if child_counts is not None
                   else tree_child_counts(sample))[: h.shape[0]]
            if add_self_loops:
                norm_cnt = cnt + 1
            else:
                norm_cnt = jnp.maximum(cnt, 1)
            inv_sqrt = jax.lax.rsqrt(norm_cnt.astype(h.dtype))
            hn = h * inv_sqrt[:, None]
            outs = []
            for d in range(keep_depths):
                k = sample.fanouts[d]
                lo, hi = sample.node_base[d], sample.node_base[d + 1]
                clo, chi = sample.node_base[d + 1], sample.node_base[d + 2]
                child = hn[clo:chi].reshape(hi - lo, k, -1)
                cm = sample.node_valid[clo:chi].reshape(hi - lo, k, 1)
                outs.append((child * cm.astype(h.dtype)).sum(axis=1))
            n_keep = sample.node_base[keep_depths]
            agg = jnp.concatenate(outs, axis=0) * inv_sqrt[:n_keep, None]
            if add_self_loops:
                agg = agg + h[:n_keep] * (inv_sqrt[:n_keep] ** 2)[:, None]
            return agg
        deg = graph.degree(jnp.arange(graph.num_ptr_nodes))
        if add_self_loops:
            norm_deg = deg + 1
        else:
            norm_deg = jnp.maximum(deg, 1)
        inv_sqrt = jax.lax.rsqrt(norm_deg.astype(h.dtype))
        # normalize source side, aggregate, normalize dst side
        agg = spmm(graph, h * inv_sqrt[: h.shape[0], None], agg="sum")
        out = agg * inv_sqrt[:, None]
        if add_self_loops:
            out = out + h * (inv_sqrt ** 2)[:, None]
        return out


class GATConv(nn.Module):
    """Multi-head graph attention (GATv1-style additive logits)."""

    features: int
    heads: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, graph: Optional[SparseGraph] = None, blocked=None,
                 *, sample: Optional[NeighborSample] = None,
                 keep_depths: Optional[int] = None):
        """``blocked``: optional ``BlockedCsr`` of the same adjacency — routes
        attention through the scatter-free Pallas path
        (ops/attention_blocked.py) instead of XLA segment ops.
        ``sample`` (+``keep_depths``): padded-tree batch — dense per-depth
        attention over the fanout axis (``tree_attention``), no scatter."""
        H = self.heads
        d = self.features // H
        assert self.features % H == 0
        w = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     kernel_init=torch_kernel_init)
        h = w(x).reshape(-1, H, d)
        a_src = self.param("a_src", nn.initializers.lecun_normal(), (H, d))
        a_dst = self.param("a_dst", nn.initializers.lecun_normal(), (H, d))

        if sample is not None:
            hf = h.reshape(-1, H * d)
            outs = [self.tree_attention(hf, sample.node_valid, sample,
                                        dd, a_src, a_dst)
                    for dd in range(keep_depths)]
            return jnp.concatenate(outs, axis=0)

        alpha_src = (h * a_src[None]).sum(-1)           # (N, H)
        alpha_dst = (h * a_dst[None]).sum(-1)
        if blocked is not None:
            # Round-4: the HEAD-PACKED one-kernel one-gather GAT
            # (gat_attend_blocked_packed) measures 2.0x FASTER than the
            # composed multihead pipeline at E=4.2M, H=4, d=32 (81% of the
            # 1-gather floor) — it fixes the round-3 flash-GAT negative
            # result (2.6x slower: per-head skinny matmuls + H-fold stat
            # passes) by riding every per-edge select on the MXU as NT
            # matmuls and doing ONE full-width weighted contraction.
            from ..ops.attention_blocked import gat_attend_blocked_packed
            # GATv1's alpha_src IS a linear projection of h, so the kernel
            # recomputes it in-kernel from the exactly-256-byte-aligned
            # feature gather (the gather engine's only fast row width —
            # widened rows cost ~3x per access, BASELINE.md round 4)
            out = gat_attend_blocked_packed(
                blocked, h, None, alpha_dst, alpha_src_vec=a_src,
                compute_dtype=jnp.float32 if self.dtype is None else self.dtype,
                interpret=jax.default_backend() != "tpu")
            return out.reshape(-1, self.features)

        E = graph.num_edges
        rows = csr_row_ids(graph.indptr, E)             # dst per edge
        logits = jax.nn.leaky_relu(
            alpha_src[graph.indices] + alpha_dst[rows], 0.2)   # (E, H)
        att = segment_softmax(logits, rows, graph.num_ptr_nodes)
        msg = h[graph.indices] * att[..., None]         # (E, H, d)
        out = segment_sum(msg, rows, graph.num_ptr_nodes)
        return out.reshape(-1, self.features)

    @staticmethod
    def tree_attention(h, valid, sample: NeighborSample, depth: int,
                       a_src, a_dst):
        """Dense attention over a padded tree layer: (B, k) children —
        softmax over the fanout axis, no scatter."""
        k = sample.fanouts[depth]
        lo, hi = sample.node_base[depth], sample.node_base[depth + 1]
        clo, chi = sample.node_base[depth + 1], sample.node_base[depth + 2]
        B = hi - lo
        H, d = a_src.shape
        hd = h[lo:hi].reshape(B, H, d)
        hc = h[clo:chi].reshape(B, k, H, d)
        mask = valid[clo:chi].reshape(B, k)
        logits = jax.nn.leaky_relu(
            (hc * a_src[None, None]).sum(-1)
            + (hd * a_dst[None]).sum(-1)[:, None, :], 0.2)     # (B, k, H)
        # -1e9 (not -inf): parents with zero valid children would softmax
        # all--inf rows into nans that leak through jnp.where's gradient
        logits = jnp.where(mask[..., None], logits, -1e9)
        att = jax.nn.softmax(logits, axis=1)
        att = jnp.where(mask[..., None], att, 0.0)
        return (hc * att[..., None]).sum(axis=1).reshape(B, H * d)


class GINConv(nn.Module):
    """Graph Isomorphism Network layer: ``MLP((1+eps)·h_v + Σ_u h_u)``.

    Sum aggregation (the injective choice from the GIN paper) over the
    full graph (CSR SpMM) or a padded tree batch (masked child sum — the
    same scatter-free depth sweep as GCNConv).  ``eps`` is learnable,
    initialized to 0 (PyG ``train_eps=True`` semantics)."""

    features: int
    hidden: Optional[int] = None          # MLP hidden width (default feats)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, graph: Optional[SparseGraph] = None, *,
                 sample: Optional[NeighborSample] = None,
                 keep_depths: Optional[int] = None):
        eps = self.param("eps", nn.initializers.zeros, ())
        if sample is not None:
            outs = []
            for d in range(keep_depths):
                k = sample.fanouts[d]
                lo, hi = sample.node_base[d], sample.node_base[d + 1]
                clo, chi = sample.node_base[d + 1], sample.node_base[d + 2]
                child = x[clo:chi].reshape(hi - lo, k, -1)
                cm = sample.node_valid[clo:chi].reshape(hi - lo, k, 1)
                outs.append((child * cm.astype(x.dtype)).sum(axis=1))
            n_keep = sample.node_base[keep_depths]
            agg = jnp.concatenate(outs, axis=0)
            h = (1.0 + eps) * x[:n_keep] + agg
        else:
            agg = spmm(graph, x, agg="sum")
            h = (1.0 + eps) * x + agg
        width = self.hidden if self.hidden is not None else self.features
        h = nn.Dense(width, dtype=self.dtype, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(h.shape[-1]))(h)
        h = nn.relu(h)
        return nn.Dense(self.features, dtype=self.dtype,
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(width))(h)


class GIN(nn.Module):
    hidden: int
    out: int
    num_layers: int
    dtype: Optional[jnp.dtype] = None
    dropout: float = 0.0

    def setup(self):
        feats = [self.hidden] * (self.num_layers - 1) + [self.out]
        self.convs = [GINConv(f, hidden=self.hidden, dtype=self.dtype,
                              name=f"GINConv_{i}")
                      for i, f in enumerate(feats)]
        self.drop = nn.Dropout(rate=self.dropout)

    def _act(self, h, i, deterministic):
        if i < self.num_layers - 1:
            h = nn.relu(h)
            if self.dropout > 0.0:
                h = self.drop(h, deterministic=deterministic)
        return h

    def __call__(self, x, graph: SparseGraph, *, deterministic: bool = True):
        h = x
        for i, conv in enumerate(self.convs):
            h = conv(h, graph)
            h = self._act(h, i, deterministic)
        return h

    def tree_forward(self, sample: NeighborSample, x, *,
                     deterministic: bool = True):
        """Sampled-tree forward (see GraphSAGE.tree_forward): returns
        seed-node logits (num_seeds, out)."""
        assert sample.num_hops >= self.num_layers
        h = x
        for j, conv in enumerate(self.convs):
            h = conv(h, sample=sample, keep_depths=sample.num_hops - j)
            h = self._act(h, j, deterministic)
        return h[: sample.node_base[1]]


class GCN(nn.Module):
    hidden: int
    out: int
    num_layers: int
    dtype: Optional[jnp.dtype] = None
    dropout: float = 0.0

    def setup(self):
        feats = [self.hidden] * (self.num_layers - 1) + [self.out]
        self.convs = [GCNConv(f, dtype=self.dtype, name=f"GCNConv_{i}")
                      for i, f in enumerate(feats)]
        self.drop = nn.Dropout(rate=self.dropout)

    def _act(self, h, i, deterministic):
        if i < self.num_layers - 1:
            h = nn.relu(h)
            if self.dropout > 0.0:
                h = self.drop(h, deterministic=deterministic)
        return h

    def __call__(self, x, graph: SparseGraph, *, deterministic: bool = True):
        h = x
        for i, conv in enumerate(self.convs):
            h = conv(h, graph)
            h = self._act(h, i, deterministic)
        return h

    def tree_forward(self, sample: NeighborSample, x, *,
                     deterministic: bool = True):
        """Sampled-tree forward (see GraphSAGE.tree_forward): returns
        seed-node logits (num_seeds, out)."""
        assert sample.num_hops >= self.num_layers
        counts = tree_child_counts(sample)
        h = x
        for j, conv in enumerate(self.convs):
            h = conv(h, sample=sample, keep_depths=sample.num_hops - j,
                     child_counts=counts)
            h = self._act(h, j, deterministic)
        return h[: sample.node_base[1]]


class GAT(nn.Module):
    hidden: int
    out: int
    num_layers: int
    heads: int = 4
    dtype: Optional[jnp.dtype] = None
    dropout: float = 0.0

    def setup(self):
        convs = []
        for i in range(self.num_layers):
            f = self.out if i == self.num_layers - 1 else self.hidden
            heads = 1 if i == self.num_layers - 1 else self.heads
            convs.append(GATConv(max(f, heads), heads=heads, dtype=self.dtype,
                                 name=f"GATConv_{i}"))
        self.convs = convs
        self.drop = nn.Dropout(rate=self.dropout)

    def _act(self, h, i, deterministic):
        if i < self.num_layers - 1:
            h = nn.elu(h)
            if self.dropout > 0.0:
                h = self.drop(h, deterministic=deterministic)
        return h

    def __call__(self, x, graph: SparseGraph, *, deterministic: bool = True):
        h = x
        for i, conv in enumerate(self.convs):
            h = conv(h, graph)
            h = self._act(h, i, deterministic)
        return h

    def tree_forward(self, sample: NeighborSample, x, *,
                     deterministic: bool = True):
        """Sampled-tree forward via dense per-depth attention (no scatter);
        returns seed-node logits (num_seeds, out)."""
        assert sample.num_hops >= self.num_layers
        h = x
        for j, conv in enumerate(self.convs):
            h = conv(h, sample=sample, keep_depths=sample.num_hops - j)
            h = self._act(h, j, deterministic)
        return h[: sample.node_base[1]]
