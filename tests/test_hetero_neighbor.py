"""Heterogeneous neighbor sampling tests, mirroring
/root/reference/src/algo/neighbor_sampling.rs:573-648."""
import jax
import numpy as np
import pytest

import tch_geometric_tpu as tgt
from tch_geometric_tpu.data import to_csc
from tch_geometric_tpu.utils.types import rel_key

from validators import validate_neighbor_samples


@pytest.fixture(scope="module")
def hetero_csc(fake_hetero):
    xs, coo = fake_hetero
    node_counts = {t: x.shape[0] for t, x in xs.items()}
    col_ptrs, row_indices = {}, {}
    for e, edge_index in coo.items():
        r = rel_key(e)
        cp, ri, _perm = to_csc(edge_index, (node_counts[e[0]], node_counts[e[2]]))
        col_ptrs[r] = cp
        row_indices[r] = ri
    return xs, coo, node_counts, col_ptrs, row_indices


def _sample(hetero_csc, key=0, **kw):
    xs, coo, node_counts, col_ptrs, row_indices = hetero_csc
    node_types = sorted(xs.keys())
    edge_types = sorted(coo.keys())
    inputs = {t: np.array([0, 1, 4, 5], dtype=np.int64) for t in node_types}
    num_neighbors = {rel_key(e): [4, 3] for e in edge_types}
    return tgt.neighbor_sampling_heterogenous(
        node_types, edge_types, col_ptrs, row_indices, inputs,
        num_neighbors, num_hops=2, key=jax.random.key(key),
        node_counts=node_counts, **kw)


def test_hetero_uniform(hetero_csc):
    xs, coo, node_counts, col_ptrs, row_indices = hetero_csc
    samples, rows, cols, eptr, offsets = _sample(hetero_csc)
    assert set(samples.keys()) == set(xs.keys())
    for e in coo:
        r = rel_key(e)
        src, _, dst = e
        validate_neighbor_samples(
            col_ptrs[r], row_indices[r],
            samples[src], samples[dst],
            rows[r], cols[r], offsets[r], [4, 3])
    # seeds preserved at the head of each type's list
    for t in xs:
        assert samples[t][:4].tolist() == [0, 1, 4, 5]
    # some sampling actually happened
    assert sum(len(v) for v in rows.values()) > 0


def test_hetero_weighted(hetero_csc):
    xs, coo, node_counts, col_ptrs, row_indices = hetero_csc
    rng_np = np.random.default_rng(0)
    weights = {rel_key(e): rng_np.uniform(0.1, 3.0, row_indices[rel_key(e)].shape[0])
               for e in coo}
    samples, rows, cols, eptr, offsets = _sample(
        hetero_csc, sampler=tgt.WeightedEdgeSampler(weights))
    for e in coo:
        r = rel_key(e)
        src, _, dst = e
        validate_neighbor_samples(
            col_ptrs[r], row_indices[r], samples[src], samples[dst],
            rows[r], cols[r], offsets[r], [4, 3])


def test_hetero_temporal(hetero_csc):
    xs, coo, node_counts, col_ptrs, row_indices = hetero_csc
    rng_np = np.random.default_rng(1)
    ts = {rel_key(e): rng_np.integers(0, 5, row_indices[rel_key(e)].shape[0]).astype(np.int64)
          for e in coo}
    init = {t: rng_np.integers(0, 5, 4).astype(np.int64) for t in xs}
    filt = tgt.TemporalEdgeFilter((0, 2), ts, mode=tgt.TEMPORAL_SAMPLE_STATIC)
    samples, rows, cols, eptr, offsets = _sample(
        hetero_csc, filter=(filt, init))
    for e in coo:
        r = rel_key(e)
        for ep in eptr[r]:
            assert 0 <= ts[r][ep] <= 2


def test_hetero_eptr_points_at_edge(hetero_csc):
    xs, coo, node_counts, col_ptrs, row_indices = hetero_csc
    samples, rows, cols, eptr, offsets = _sample(hetero_csc, key=3)
    for e in coo:
        r = rel_key(e)
        src, _, dst = e
        for j, i, ep in zip(rows[r], cols[r], eptr[r]):
            assert row_indices[r][ep] == samples[src][j]
            w = samples[dst][i]
            assert col_ptrs[r][w] <= ep < col_ptrs[r][w + 1]


def test_hetero_subset_inputs(hetero_csc):
    # Only one node type seeded (the typical loader case).
    xs, coo, node_counts, col_ptrs, row_indices = hetero_csc
    node_types = sorted(xs.keys())
    edge_types = sorted(coo.keys())
    inputs = {"v0": np.array([0, 1, 2], dtype=np.int64)}
    num_neighbors = {rel_key(e): [3, 2] for e in edge_types}
    samples, rows, cols, eptr, offsets = tgt.neighbor_sampling_heterogenous(
        node_types, edge_types, col_ptrs, row_indices, inputs,
        num_neighbors, num_hops=2, key=jax.random.key(5),
        node_counts=node_counts)
    assert samples["v0"][:3].tolist() == [0, 1, 2]
    for e in coo:
        r = rel_key(e)
        src, _, dst = e
        validate_neighbor_samples(
            col_ptrs[r], row_indices[r], samples[src], samples[dst],
            rows[r], cols[r], offsets[r], [3, 2])
