"""HGT sampling, budget sampling, and negative sampling tests.

Mirrors /root/reference/src/algo/hgt_sampling.rs:356-429,
budget_sampling.rs:401-499, negative_sampling.rs:146-233.
"""
import jax
import numpy as np
import pytest

import tch_geometric_tpu as tgt
from tch_geometric_tpu.data import to_csc, to_csr
from tch_geometric_tpu.utils.types import rel_key

from validators import csc_has_edge


@pytest.fixture(scope="module")
def hetero_graphs(fake_hetero):
    xs, coo = fake_hetero
    node_counts = {t: x.shape[0] for t, x in xs.items()}
    csc_p, csc_i, csr_p, csr_i, sizes = {}, {}, {}, {}, {}
    for e, edge_index in coo.items():
        r = rel_key(e)
        size = (node_counts[e[0]], node_counts[e[2]])
        cp, ci, _ = to_csc(edge_index, size)
        rp, rci, _ = to_csr(edge_index, size)
        csc_p[r], csc_i[r] = cp, ci
        csr_p[r], csr_i[r] = rp, rci
        sizes[r] = size
    return xs, coo, node_counts, csc_p, csc_i, csr_p, csr_i, sizes


def test_hgt_sampling(hetero_graphs):
    xs, coo, node_counts, csc_p, csc_i, *_ = hetero_graphs
    node_types = sorted(xs)
    edge_types = sorted(coo)
    inputs = {t: np.array([0, 1, 4, 5], dtype=np.int64) for t in node_types}
    num_samples = {t: [20, 15] for t in node_types}
    nodes, ts, rows, cols, eptr = tgt.hgt_sampling(
        node_types, edge_types, csc_p, csc_i, None, inputs, None,
        num_samples, 2, None, key=jax.random.key(0), node_counts=node_counts)
    # Every type should have seeds + sampled nodes, and sampled nodes unique.
    for t in node_types:
        assert nodes[t][:4].tolist() == [0, 1, 4, 5]
        assert len(nodes[t]) > 4, t
        assert len(set(nodes[t].tolist())) == len(nodes[t]), "HGT dedups nodes"
        assert len(nodes[t]) <= 4 + 20 + 15
    # Every reconstructed edge must exist in the original graph.
    n_edges = 0
    for e in coo:
        r = rel_key(e)
        src, _, dst = e
        for j, i, ep in zip(rows[r], cols[r], eptr[r]):
            v, w = nodes[src][j], nodes[dst][i]
            assert csc_has_edge(csc_p[r], csc_i[r], w, v)
            assert csc_i[r][ep] == v
            n_edges += 1
    assert n_edges > 0


def test_hgt_temporal(hetero_graphs):
    xs, coo, node_counts, csc_p, csc_i, *_ = hetero_graphs
    node_types = sorted(xs)
    edge_types = sorted(coo)
    rng_np = np.random.default_rng(0)
    row_ts = {rel_key(e): rng_np.integers(0, 7, csc_i[rel_key(e)].shape[0]).astype(np.int64)
              for e in coo}
    inputs = {t: np.array([0, 1, 4, 5], dtype=np.int64) for t in node_types}
    input_ts = {t: rng_np.integers(0, 7, 4).astype(np.int64) for t in node_types}
    num_samples = {t: [10, 10] for t in node_types}
    timerange = (2, 5)
    nodes, ts, rows, cols, eptr = tgt.hgt_sampling(
        node_types, edge_types, csc_p, csc_i, row_ts, inputs, input_ts,
        num_samples, 2, timerange, key=jax.random.key(1),
        node_counts=node_counts)
    # All sampled (non-seed) node timestamps within the timerange or NaN.
    for t in node_types:
        for v, vt in zip(nodes[t][4:], ts[t][4:]):
            assert vt == -1 or (2 <= vt < 5), (t, v, vt)


def test_budget_sampling(hetero_graphs):
    xs, coo, node_counts, csc_p, csc_i, *_ = hetero_graphs
    node_types = sorted(xs)
    edge_types = sorted(coo)
    inputs = {t: np.array([0, 1, 4, 5], dtype=np.int64) for t in node_types}
    num_neighbors = {t: [3, 4] for t in node_types}
    nodes, ts, rows, cols, eptr, offs = tgt.budget_sampling(
        node_types, edge_types, csc_p, csc_i, None, inputs, None,
        num_neighbors, 2, key=jax.random.key(2), node_counts=node_counts)
    n_edges = 0
    for e in coo:
        r = rel_key(e)
        src, _, dst = e
        for j, i, ep in zip(rows[r], cols[r], eptr[r]):
            v, w = nodes[src][j], nodes[dst][i]
            assert csc_has_edge(csc_p[r], csc_i[r], w, v)
            assert csc_i[r][ep] == v
            n_edges += 1
    assert n_edges > 0
    # Real layer offsets (reference quirk fixed): monotone, plausible.
    for r, off in offs.items():
        assert len(off) == 2
        for (s, e_, d) in off:
            assert s >= 0 and e_ >= 0 and d >= 0


def test_budget_sampling_temporal(hetero_graphs):
    # rs:401-499: window (0,2), backward, non-relative.
    xs, coo, node_counts, csc_p, csc_i, *_ = hetero_graphs
    node_types = sorted(xs)
    edge_types = sorted(coo)
    rng_np = np.random.default_rng(3)
    row_ts = {rel_key(e): rng_np.integers(0, 7, csc_i[rel_key(e)].shape[0]).astype(np.int64)
              for e in coo}
    inputs = {t: np.array([0, 1, 4, 5], dtype=np.int64) for t in node_types}
    input_ts = {t: rng_np.integers(0, 7, 4).astype(np.int64) for t in node_types}
    num_neighbors = {t: [3, 4] for t in node_types}
    nodes, ts, rows, cols, eptr, offs = tgt.budget_sampling(
        node_types, edge_types, csc_p, csc_i, row_ts, inputs, input_ts,
        num_neighbors, 2, window=(0, 2), forward=False, relative=False,
        key=jax.random.key(3), node_counts=node_counts)
    # Every sampled edge satisfies the backward window vs its dst's state:
    # -(v_ts - w_ts) in [0, 2) unless either is NaN.  With relative=False the
    # dst's stored ts IS its state (mutate returns v_t).
    for e in coo:
        r = rel_key(e)
        src, _, dst = e
        for j, i, ep in zip(rows[r], cols[r], eptr[r]):
            w_t = ts[dst][i]
            raw = row_ts[r][ep]
            v_t = w_t if raw == -1 else raw
            if w_t == -1 or v_t == -1:
                continue
            assert 0 <= -(v_t - w_t) < 2, (v_t, w_t)


def test_negative_sampling_homogenous(karate):
    # negative_sampling.rs:146-171: all sampled pairs are non-edges.
    x, _y, edge_index = karate
    n = 34
    row_ptrs, col_indices, _ = to_csr(edge_index, n)
    edge_set = set(map(tuple, edge_index.T.tolist()))
    inputs = np.arange(n)
    samples, rows, cols, sample_count = tgt.negative_sample_neighbors_homogenous(
        row_ptrs, col_indices, (n, n), inputs, 10, 5, key=jax.random.key(4))
    assert sample_count == n
    assert samples[:n].tolist() == inputs.tolist()
    assert len(rows) > 0
    for i, j in zip(rows, cols):
        v, w = samples[i], samples[j]
        assert (v, w) not in edge_set
        assert v != w


def test_negative_sampling_heterogenous(hetero_graphs):
    xs, coo, node_counts, _cp, _ci, csr_p, csr_i, sizes = hetero_graphs
    node_types = sorted(xs)
    edge_types = sorted(coo)
    edge_sets = {rel_key(e): set(map(tuple, coo[e].T.tolist())) for e in coo}
    inputs = {t: np.array([0, 1, 4, 5], dtype=np.int64) for t in node_types}
    samples, rows, cols, sample_count = tgt.negative_sample_neighbors_heterogenous(
        node_types, edge_types, csr_p, csr_i, sizes, inputs, 3, 10, False,
        key=jax.random.key(5))
    total = 0
    for e in coo:
        r = rel_key(e)
        src, _, dst = e
        for i, j in zip(rows[r], cols[r]):
            v = inputs[src][i]
            w = samples[dst][j]
            assert (v, w) not in edge_sets[r]
            total += 1
    assert total > 0


def test_budget_paths_head_at_seed(hetero_graphs):
    # budget_sampling.rs:488-493: every reconstructed path head is a seed.
    from validators import samples_to_heteropaths
    from tch_geometric_tpu.utils.types import rel_key
    xs, coo, node_counts, csc_p, csc_i, *_ = hetero_graphs
    node_types = sorted(xs)
    edge_types = sorted(coo)
    inputs = {t: np.array([0, 1, 4, 5], dtype=np.int64) for t in node_types}
    nodes, ts, rows, cols, eptr, offs = tgt.budget_sampling(
        node_types, edge_types, csc_p, csc_i, None, inputs, None,
        {t: [3, 4] for t in node_types}, 2, key=jax.random.key(11),
        node_counts=node_counts)
    etm = {rel_key(e): e for e in edge_types}
    paths = samples_to_heteropaths(nodes, rows, cols, etm)
    assert paths
    for path in paths:
        head_type, head_ptr = path[0]
        assert head_ptr < len(inputs[head_type]), (path[0], "head not a seed")
