"""Distributed random walks over a partitioned topology (parallel/dist_walks).

Every walk family pins (a) device-count invariance — P=1, P=2, P=4 produce
bit-identical walks — and (b) the reference's walk invariants
(random_walk.rs tests): walk[0] == start, consecutive pairs are edges,
temporal admissibility along the walk.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from tch_geometric_tpu.data.io import load_karate_graph
from tch_geometric_tpu.data.storage import to_csr
from tch_geometric_tpu.parallel.dist_sampling import build_partitioned_graph
from tch_geometric_tpu.parallel.dist_walks import (
    dist_biased_tempo_random_walk, dist_random_walk, dist_tempo_random_walk,
    effective_edge_ts)
from tch_geometric_tpu.utils.types import NAN_TIMESTAMP


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


@pytest.fixture(scope="module")
def karate_csr():
    _x, _y, edge_index = load_karate_graph()
    row_ptrs, col_indices, _perm = to_csr(np.asarray(edge_index), 34)
    return np.asarray(row_ptrs), np.asarray(col_indices)


def _has_edge(indptr, indices, u, v):
    return v in indices[indptr[u]: indptr[u + 1]]


@pytest.mark.parametrize("ell_table", [True, False])
def test_node2vec_invariance_and_validity(karate_csr, ell_table):
    indptr, indices = karate_csr
    start = np.arange(8, dtype=np.int32)
    key = jax.random.key(3)
    results = {}
    for Pn in (1, 2, 4):
        g = build_partitioned_graph(indptr, indices, Pn, ell_table=ell_table)
        walks, ovf = dist_random_walk(key, g, start, 10, _mesh(Pn),
                                      p=2.0, q=0.5, capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        results[Pn] = np.asarray(walks).reshape(8, 11)
    for Pn in (2, 4):
        np.testing.assert_array_equal(results[1], results[Pn])
    w = results[1]
    assert np.all(w[:, 0] == start)          # rs test: walk starts at start
    for i in range(8):
        for l in range(10):
            if w[i, l + 1] < 0:
                break
            assert _has_edge(indptr, indices, w[i, l], w[i, l + 1])


@pytest.mark.parametrize("ell_table", [True, False])
def test_tempo_walk_invariance_and_window(karate_csr, ell_table):
    indptr, indices = karate_csr
    E = indices.shape[0]
    rng = np.random.default_rng(0)
    edge_ts = rng.integers(0, 100, E).astype(np.int64)
    node_ts = rng.integers(0, 100, 34).astype(np.int64)
    ts_eff = effective_edge_ts(indices, edge_ts, node_ts)
    start = np.arange(8, dtype=np.int32)
    start_ts = np.zeros(8, dtype=np.int32)
    key = jax.random.key(5)
    win = (0, 60)
    results = {}
    for Pn in (1, 2, 4):
        g = build_partitioned_graph(indptr, indices, Pn,
                                    edge_timestamps=ts_eff,
                                    ell_table=ell_table)
        walks, ts, ovf = dist_tempo_random_walk(
            key, g, start, start_ts, 8, win, _mesh(Pn), capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        results[Pn] = (np.asarray(walks).reshape(8, 8),
                       np.asarray(ts).reshape(8, 8))
    for Pn in (2, 4):
        np.testing.assert_array_equal(results[1][0], results[Pn][0])
        np.testing.assert_array_equal(results[1][1], results[Pn][1])
    w, t = results[1]
    assert np.all(w[:, 0] == start)
    # admissibility: every stepped-to timestamp is NaN or in [0, 60)
    stepped = t[:, 1:]
    ok = (stepped == NAN_TIMESTAMP) | ((stepped >= 0) & (stepped < 60))
    assert np.all(ok)


@pytest.mark.parametrize("bias", ["uniform", "linear", "exponential"])
def test_ctdne_invariance_and_monotone_time(karate_csr, bias):
    indptr, indices = karate_csr
    E = indices.shape[0]
    rng = np.random.default_rng(7)
    edge_ts = rng.integers(0, 1000, E).astype(np.int64)
    node_ts = rng.integers(0, 1000, 34).astype(np.int64)
    ts_eff = effective_edge_ts(indices, edge_ts, node_ts)
    start = np.arange(8, dtype=np.int32)
    start_ts = np.zeros(8, dtype=np.int32)
    key = jax.random.key(9)
    results = {}
    for Pn in (1, 2, 4):
        g = build_partitioned_graph(indptr, indices, Pn,
                                    edge_timestamps=ts_eff)
        walks, ts, ovf = dist_biased_tempo_random_walk(
            key, g, start, start_ts, 6, bias, _mesh(Pn), retry_count=3,
            capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        results[Pn] = (np.asarray(walks).reshape(8, 6),
                       np.asarray(ts).reshape(8, 6))
    for Pn in (2, 4):
        np.testing.assert_array_equal(results[1][0], results[Pn][0])
        np.testing.assert_array_equal(results[1][1], results[Pn][1])
    w, t = results[1]
    # completed walks: start at start, consecutive pairs are edges, and the
    # forward-in-time invariant holds (non-NaN ts never decreases)
    for i in range(8):
        if np.all(w[i] >= 0):
            assert w[i, 0] == start[i]
            cur = 0
            for l in range(5):
                assert _has_edge(indptr, indices, w[i, l], w[i, l + 1])
                if t[i, l + 1] != NAN_TIMESTAMP:
                    assert t[i, l + 1] >= cur
                    cur = t[i, l + 1]


def test_ctdne_default_rounds_law_equivalence(karate_csr):
    """The auto default (``None`` -> 2 at P>1; compile-pathology workaround
    at P==1, BASELINE.md round-3 note) is law-preserving: outputs are
    bit-identical to ``num_rounds=1`` because draws are keyed by request
    uid, not by the round that carried the request."""
    import inspect
    from tch_geometric_tpu.parallel.dist_sampling import resolve_num_rounds
    from tch_geometric_tpu.parallel.dist_walks import (
        dist_biased_tempo_random_walk as f)
    assert inspect.signature(f).parameters["num_rounds"].default is None
    assert resolve_num_rounds(None, 2) == 2

    indptr, indices = karate_csr
    E = indices.shape[0]
    rng = np.random.default_rng(3)
    edge_ts = rng.integers(0, 1000, E).astype(np.int64)
    node_ts = rng.integers(0, 1000, 34).astype(np.int64)
    ts_eff = effective_edge_ts(indices, edge_ts, node_ts)
    start = np.arange(8, dtype=np.int32)
    start_ts = np.zeros(8, dtype=np.int32)
    key = jax.random.key(11)
    g = build_partitioned_graph(indptr, indices, 2, edge_timestamps=ts_eff)
    outs = {}
    for nr in (1, 2):
        walks, ts, ovf = dist_biased_tempo_random_walk(
            key, g, start, start_ts, 6, "exponential", _mesh(2),
            retry_count=3, capacity_factor=8.0, num_rounds=nr)
        assert int(np.asarray(ovf).sum()) == 0
        outs[nr] = (np.asarray(walks), np.asarray(ts))
    np.testing.assert_array_equal(outs[1][0], outs[2][0])
    np.testing.assert_array_equal(outs[1][1], outs[2][1])


def test_node2vec_p_q_bias_direction(karate_csr):
    """Return-heavy (p small) walks revisit the previous node far more often
    than exploration-heavy (q small) walks — the rejection rule works
    through the distributed protocol."""
    indptr, indices = karate_csr
    Pn = 4
    g = build_partitioned_graph(indptr, indices, Pn)
    start = np.tile(np.arange(8, dtype=np.int32), 8)  # 64 walks
    key = jax.random.key(1)

    def backtrack_rate(p, q):
        walks, _ = dist_random_walk(key, g, start, 12, _mesh(Pn), p=p, q=q,
                                    capacity_factor=8.0)
        w = np.asarray(walks).reshape(64, 13)
        back = total = 0
        for i in range(64):
            for l in range(2, 13):
                if w[i, l] < 0:
                    break
                total += 1
                back += w[i, l] == w[i, l - 2]
        return back / max(total, 1)

    assert backtrack_rate(0.25, 4.0) > backtrack_rate(4.0, 0.25) + 0.1
