"""Golden model tests: torch-CPU dense-math implementations of each model
family, fed the SAME flax weights, must reproduce our forwards allclose.

This is the "per-layer activations allclose vs golden model" target from
BASELINE.md — the golden side is written independently with dense adjacency
tensors in torch (no shared code with the JAX implementation), so it
catches layout/normalization/masking bugs the invariant validators can't.
Reference analogue: the reference has no model code (delegates to PyG,
/root/reference/examples/neighbor_sampling.py:23-24); these tests pin our
replacement's numerics instead.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import tch_geometric_tpu as tgt
from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.models import GCN, GAT, GraphSAGE
from tch_geometric_tpu.sampling.neighbor import sample_neighbors


def dense_in_adj(edge_index, n):
    """A[dst, src] = edge count (matches CSC in-neighbor aggregation)."""
    A = torch.zeros((n, n), dtype=torch.float64)
    for s, d in zip(*np.asarray(edge_index)):
        A[int(d), int(s)] += 1.0
    return A


def t(x):
    return torch.from_numpy(np.asarray(x).astype(np.float64))


@pytest.fixture(scope="module")
def karate_graph():
    x, y, edge_index = tgt.data.load_karate_graph()
    g = csc_graph_from_coo(edge_index, 34)
    return np.asarray(x, dtype=np.float32), edge_index, g


def test_sage_full_graph_matches_torch(karate_graph):
    x_np, edge_index, g = karate_graph
    n = 34
    model = GraphSAGE(hidden=16, out=4, num_layers=2)
    params = model.init(jax.random.key(0), jnp.asarray(x_np), g)
    ours = np.asarray(model.apply(params, jnp.asarray(x_np), g))

    A = dense_in_adj(edge_index, n)
    deg = A.sum(dim=1, keepdim=True).clamp(min=1.0)
    h = t(x_np)
    p = params["params"]
    for i in range(2):
        conv = p[f"conv{i}"]
        agg = (A @ h) / deg
        h = (h @ t(conv["lin_self"]["kernel"]) + t(conv["lin_self"]["bias"])
             + agg @ t(conv["lin_neigh"]["kernel"]))
        if i < 1:
            h = torch.relu(h)
    np.testing.assert_allclose(ours, h.numpy(), rtol=1e-4, atol=1e-4)


def test_sage_tree_forward_matches_torch(karate_graph):
    x_np, edge_index, g = karate_graph
    seeds = np.array([0, 1, 4, 5, 8, 11, 20, 33])
    sample = sample_neighbors(g, seeds, [4, 3], key=jax.random.key(7),
                              sampler=tgt.UniformEdgeSampler(False))
    model = GraphSAGE(hidden=16, out=4, num_layers=2)
    xg = jnp.asarray(x_np)[jnp.clip(sample.nodes, 0, 33)]
    xg = jnp.where(sample.node_valid[:, None], xg, 0.0)
    params = model.init(jax.random.key(1), sample, xg,
                        method=GraphSAGE.tree_forward)
    ours = np.asarray(model.apply(params, sample, xg,
                                  method=GraphSAGE.tree_forward))

    # torch golden: explicit per-slot loops over the padded tree
    base = [int(b) for b in sample.node_base]
    fanouts = [int(k) for k in sample.fanouts]
    valid = np.asarray(sample.node_valid)
    h = t(np.asarray(xg))
    p = params["params"]
    num_hops = len(fanouts)
    for j in range(2):
        conv = p[f"conv{j}"]
        keep = num_hops - j
        n_keep = base[keep]
        agg = torch.zeros((n_keep, h.shape[1]), dtype=torch.float64)
        for d in range(keep):
            k = fanouts[d]
            for slot in range(base[d], base[d + 1]):
                c0 = base[d + 1] + (slot - base[d]) * k
                kids = [c for c in range(c0, c0 + k) if valid[c]]
                if kids:
                    agg[slot] = h[kids].mean(dim=0)
        h = (h[:n_keep] @ t(conv["lin_self"]["kernel"])
             + t(conv["lin_self"]["bias"])
             + agg @ t(conv["lin_neigh"]["kernel"]))
        if j < 1:
            h = torch.relu(h)
    np.testing.assert_allclose(ours[: len(seeds)], h[: len(seeds)].numpy(),
                               rtol=1e-4, atol=1e-4)


def test_gcn_matches_torch(karate_graph):
    x_np, edge_index, g = karate_graph
    n = 34
    model = GCN(hidden=16, out=4, num_layers=2)
    params = model.init(jax.random.key(0), jnp.asarray(x_np), g)
    ours = np.asarray(model.apply(params, jnp.asarray(x_np), g))

    A = dense_in_adj(edge_index, n)
    deg = A.sum(dim=1)                     # in-degree per dst (indptr degree)
    inv_sqrt = (deg + 1.0).rsqrt()         # add_self_loops=True
    h = t(x_np)
    p = params["params"]
    for i in range(2):
        dense = p[f"GCNConv_{i}"]["Dense_0"]
        hw = h @ t(dense["kernel"]) + t(dense["bias"])
        agg = A @ (hw * inv_sqrt[:, None])
        h = agg * inv_sqrt[:, None] + hw * (inv_sqrt ** 2)[:, None]
        if i < 1:
            h = torch.relu(h)
    np.testing.assert_allclose(ours, h.numpy(), rtol=1e-4, atol=1e-4)


def test_gat_matches_torch(karate_graph):
    x_np, edge_index, g = karate_graph
    n = 34
    model = GAT(hidden=16, out=4, num_layers=2, heads=4)
    params = model.init(jax.random.key(0), jnp.asarray(x_np), g)
    ours = np.asarray(model.apply(params, jnp.asarray(x_np), g))

    A = dense_in_adj(edge_index, n) > 0    # bool mask (dst, src)
    h = t(x_np)
    p = params["params"]
    for i in range(2):
        conv = p[f"GATConv_{i}"]
        H, d = np.asarray(conv["a_src"]).shape
        hw = (h @ t(conv["Dense_0"]["kernel"])).reshape(n, H, d)
        a_src, a_dst = t(conv["a_src"]), t(conv["a_dst"])
        al_s = (hw * a_src[None]).sum(-1)  # (N, H)
        al_d = (hw * a_dst[None]).sum(-1)
        # logits[i, j, h] over existing edges j -> i
        logits = torch.nn.functional.leaky_relu(
            al_s[None, :, :] + al_d[:, None, :], 0.2)   # (dst, src, H)
        logits = torch.where(A[:, :, None], logits,
                             torch.tensor(-torch.inf, dtype=torch.float64))
        att = torch.softmax(logits, dim=1)
        att = torch.where(A[:, :, None], att, torch.zeros((), dtype=torch.float64))
        out = torch.einsum("ijh,jhd->ihd", att, hw).reshape(n, H * d)
        h = out
        if i < 1:
            h = torch.nn.functional.elu(h)
    np.testing.assert_allclose(ours, h.numpy(), rtol=1e-3, atol=1e-3)
