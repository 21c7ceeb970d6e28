"""Random walk tests, mirroring /root/reference/src/algo/random_walk.rs:291-437."""
import jax
import numpy as np
import pytest

import tch_geometric_tpu as tgt
from tch_geometric_tpu.data import to_csr


@pytest.fixture(scope="module")
def karate_csr(karate):
    _x, _y, edge_index = karate
    row_ptrs, col_indices, perm = to_csr(edge_index, 34)
    edge_set = set(map(tuple, edge_index.T.tolist()))
    return row_ptrs, col_indices, edge_set


def test_random_walk_validity(karate_csr):
    # rs:301-331: walk[0] == start; consecutive pairs are edges.
    row_ptrs, col_indices, edge_set = karate_csr
    start = np.array([0, 1, 2, 3])
    walks = tgt.random_walk(row_ptrs, col_indices, start, 10, 1.0, 1.5,
                            key=jax.random.key(0))
    assert walks.shape == (4, 11)
    for i, head in enumerate(start):
        walk = walks[i]
        assert walk[0] == head
        for prev, curr in zip(walk, walk[1:]):
            if curr == -1:
                break
            assert (prev, curr) in edge_set, (prev, curr)


def test_random_walk_p_q_bias(karate_csr):
    # Large p, tiny q => strongly prefers distance-2 moves (DFS-like):
    # returning to the previous node should be rare.
    row_ptrs, col_indices, edge_set = karate_csr
    start = np.tile(np.arange(34), 30)
    walks = tgt.random_walk(row_ptrs, col_indices, start, 6, 20.0, 0.05,
                            key=jax.random.key(1))
    backtracks = total = 0
    for walk in walks:
        for a, b, c in zip(walk, walk[1:], walk[2:]):
            if c == -1:
                break
            total += 1
            backtracks += int(a == c)
    assert total > 0
    assert backtracks / total < 0.12, backtracks / total


def test_tempo_random_walk(karate_csr):
    # rs:334-383: timestamps within [start+0, start+2) or NaN.
    row_ptrs, col_indices, edge_set = karate_csr
    rng_np = np.random.default_rng(0)
    node_ts = rng_np.integers(-1, 5, 34).astype(np.int64)
    edge_ts = rng_np.integers(-1, 5, col_indices.shape[0]).astype(np.int64)
    start = np.array([0, 1, 2, 3])
    start_ts = np.array([0, -1, 2, 3], dtype=np.int64)
    walks, walk_ts = tgt.tempo_random_walk(
        row_ptrs, col_indices, node_ts, edge_ts, start, start_ts,
        10, (0, 2), key=jax.random.key(2))
    assert walks.shape == (4, 10) and walk_ts.shape == (4, 10)
    for i, head in enumerate(start):
        assert walks[i, 0] == head
        head_ts = start_ts[i]
        for ts in walk_ts[i]:
            if ts == -1 or head_ts == -1:
                continue
            assert head_ts + 0 <= ts < head_ts + 2, (head_ts, ts)


def test_biased_tempo_walk_forward_monotone(karate_csr):
    # rs:386-437: with exponential bias all non-NaN timestamps along a walk
    # are >= the head timestamp (forward in time).
    row_ptrs, col_indices, edge_set = karate_csr
    rng_np = np.random.default_rng(1)
    node_ts = rng_np.integers(-1, 5, 34).astype(np.int64)
    edge_ts = rng_np.integers(-1, 5, col_indices.shape[0]).astype(np.int64)
    start = np.array([0, 1, 2, 3])
    start_ts = np.array([0, -1, 2, 3], dtype=np.int64)
    walks, walk_ts = tgt.biased_tempo_random_walk(
        row_ptrs, col_indices, node_ts, edge_ts, start, start_ts,
        10, "exponential", True, 10, key=jax.random.key(3))
    assert walks.shape == (4, 10)
    for i in range(4):
        assert walks[i, 0] == start[i]
        head_ts = start_ts[i]
        for ts in walk_ts[i]:
            if ts == -1 or head_ts == -1:
                continue
            assert ts >= head_ts


@pytest.mark.parametrize("bias", ["uniform", "linear"])
def test_biased_tempo_walk_other_biases(karate_csr, bias):
    row_ptrs, col_indices, edge_set = karate_csr
    rng_np = np.random.default_rng(2)
    node_ts = rng_np.integers(0, 5, 34).astype(np.int64)
    edge_ts = rng_np.integers(0, 5, col_indices.shape[0]).astype(np.int64)
    start = np.array([0, 5, 10])
    start_ts = np.zeros(3, dtype=np.int64)
    walks, walk_ts = tgt.biased_tempo_random_walk(
        row_ptrs, col_indices, node_ts, edge_ts, start, start_ts,
        8, bias, True, 5, key=jax.random.key(4))
    # Walk edges must be real edges when both endpoints are valid.
    for i in range(3):
        for a, b in zip(walks[i], walks[i][1:]):
            if a == -1 or b == -1:
                break
            assert (a, b) in edge_set


def test_walk_determinism(karate_csr):
    row_ptrs, col_indices, _ = karate_csr
    start = np.array([0, 1, 2, 3])
    w1 = tgt.random_walk(row_ptrs, col_indices, start, 8, key=jax.random.key(9))
    w2 = tgt.random_walk(row_ptrs, col_indices, start, 8, key=jax.random.key(9))
    assert np.array_equal(w1, w2)


def test_node2vec_ell_matches_plain(karate_csr):
    """The ELL carried-row walk must be bit-identical to the gather +
    binary-search path (same RNG sequence, same accept decisions)."""
    from tch_geometric_tpu.data.graph import make_graph
    from tch_geometric_tpu.sampling.walks import _random_walk_impl

    row_ptrs, col_indices, _ = karate_csr
    n = row_ptrs.shape[0] - 1
    g_ell = make_graph(row_ptrs, col_indices, num_src=n,
                       num_dst=n, ell_table=True)
    g_plain = make_graph(row_ptrs, col_indices, num_src=n,
                         num_dst=n, ell_table=False, window_table=False)
    assert g_ell.ell is not None and g_plain.ell is None
    start = jax.numpy.arange(8)
    for p, q in ((2.0, 0.5), (1.0, 1.0), (0.25, 4.0)):
        a = _random_walk_impl(jax.random.key(3), g_ell, start, 12,
                              jax.numpy.float32(p), jax.numpy.float32(q), 8)
        b = _random_walk_impl(jax.random.key(3), g_plain, start, 12,
                              jax.numpy.float32(p), jax.numpy.float32(q), 8)
        assert np.array_equal(np.asarray(a), np.asarray(b)), (p, q)
