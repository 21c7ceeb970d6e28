"""Homogeneous neighbor sampling: invariant tests mirroring the reference's
(/root/reference/src/algo/neighbor_sampling.rs:437-570)."""
import jax
import numpy as np
import pytest

import tch_geometric_tpu as tgt
from tch_geometric_tpu.data import csc_graph_from_coo, to_csc
from tch_geometric_tpu.sampling.neighbor import compact_sample, sample_neighbors

from validators import samples_to_paths, validate_neighbor_samples


@pytest.fixture(scope="module")
def karate_csc(karate):
    _x, _y, edge_index = karate
    col_ptrs, row_indices, perm = to_csc(edge_index, 34)
    graph = csc_graph_from_coo(edge_index, 34)
    return col_ptrs, row_indices, graph


INPUTS = [0, 1, 4, 5]
FANOUTS = [4, 3]


def _run_and_validate(karate_csc, key=0, **kw):
    col_ptrs, row_indices, graph = karate_csc
    out = sample_neighbors(graph, np.array(INPUTS), FANOUTS,
                           key=jax.random.key(key), **kw)
    samples, rows, cols, eptr, layer_offsets = compact_sample(out)
    validate_neighbor_samples(col_ptrs, row_indices, samples, samples,
                              rows, cols, layer_offsets, FANOUTS)
    assert samples[: len(INPUTS)].tolist() == INPUTS
    return col_ptrs, row_indices, samples, rows, cols, eptr, layer_offsets


def test_uniform_without_replacement(karate_csc):
    _run_and_validate(karate_csc, sampler=tgt.UniformEdgeSampler(False))


def test_uniform_with_replacement(karate_csc):
    # rs:437-464 uses UnweightedSampler::<true>
    col_ptrs, row_indices, samples, rows, cols, eptr, offs = _run_and_validate(
        karate_csc, sampler=tgt.UniformEdgeSampler(True))
    # with replacement: every seed has full fanout in layer 0 (karate has no
    # isolated nodes among inputs)
    counts = np.bincount(cols, minlength=len(samples))
    assert all(counts[i] == FANOUTS[0] for i in range(len(INPUTS)))


def test_weighted(karate_csc):
    col_ptrs, row_indices, graph = karate_csc
    rng = np.random.default_rng(0)
    weights = rng.uniform(0.2, 5.0, size=row_indices.shape[0])
    _run_and_validate(karate_csc, sampler=tgt.WeightedEdgeSampler(weights))


def test_eptr_consistency(karate_csc):
    # The emitted global edge ptr must point at the (dst, src) pair it claims.
    col_ptrs, row_indices, samples, rows, cols, eptr, offs = _run_and_validate(
        karate_csc)
    for j, i, e in zip(rows, cols, eptr):
        assert row_indices[e] == samples[j]
        # e must lie in dst's CSC window
        w = samples[i]
        assert col_ptrs[w] <= e < col_ptrs[w + 1]


def test_temporal_static(karate_csc):
    # rs:498-537: static window on edge timestamps
    col_ptrs, row_indices, graph = karate_csc
    rng = np.random.default_rng(1)
    ts = rng.integers(0, 4, size=row_indices.shape[0]).astype(np.int64)
    input_ts = np.array([0, 1, 2, 3], dtype=np.int64)
    filt = tgt.TemporalEdgeFilter((0, 2), ts, mode=tgt.TEMPORAL_SAMPLE_STATIC)
    out = sample_neighbors(graph, np.array(INPUTS), FANOUTS,
                           key=jax.random.key(3),
                           sampler=tgt.UniformEdgeSampler(False),
                           filter=(filt, input_ts))
    samples, rows, cols, eptr, offs = compact_sample(out)
    validate_neighbor_samples(col_ptrs, row_indices, samples, samples,
                              rows, cols, offs, FANOUTS)
    for e in eptr:
        assert 0 <= ts[e] <= 2


def test_temporal_relative_backward(karate_csc):
    # rs:539-569: relative window backward in time: along every path,
    # start_t - 2 <= t <= start_t where start_t is the root's timestamp.
    col_ptrs, row_indices, graph = karate_csc
    rng = np.random.default_rng(2)
    ts = rng.integers(0, 4, size=row_indices.shape[0]).astype(np.int64)
    input_ts = np.array([0, 1, 2, 3], dtype=np.int64)
    filt = tgt.TemporalEdgeFilter((0, 2), ts, forward=False,
                                  mode=tgt.TEMPORAL_SAMPLE_RELATIVE)
    out = sample_neighbors(graph, np.array(INPUTS), FANOUTS,
                           key=jax.random.key(4),
                           sampler=tgt.UniformEdgeSampler(False),
                           filter=(filt, input_ts))
    samples, rows, cols, eptr, offs = compact_sample(out)
    validate_neighbor_samples(col_ptrs, row_indices, samples, samples,
                              rows, cols, offs, FANOUTS)
    for _path, edges in samples_to_paths(rows, cols, eptr, samples, INPUTS):
        if edges:
            start_t = input_ts[cols[edges[0]]]
            for edge_idx in edges:
                t = ts[eptr[edge_idx]]
                assert start_t - 2 <= t <= start_t


def test_temporal_dynamic(karate_csc):
    # DYNAMIC mode: each step's window is relative to the previous edge's
    # timestamp (state := edge ts, rs:69-76).
    col_ptrs, row_indices, graph = karate_csc
    rng = np.random.default_rng(5)
    ts = rng.integers(0, 6, size=row_indices.shape[0]).astype(np.int64)
    input_ts = np.array([2, 3, 2, 3], dtype=np.int64)
    filt = tgt.TemporalEdgeFilter((0, 1), ts, forward=True,
                                  mode=tgt.TEMPORAL_SAMPLE_DYNAMIC)
    out = sample_neighbors(graph, np.array(INPUTS), FANOUTS,
                           key=jax.random.key(5),
                           sampler=tgt.UniformEdgeSampler(False),
                           filter=(filt, input_ts))
    samples, rows, cols, eptr, offs = compact_sample(out)
    for _path, edges in samples_to_paths(rows, cols, eptr, samples, INPUTS):
        state = None
        for edge_idx in edges:
            i = cols[edge_idx]
            if state is None:
                state = input_ts[i] if i < len(INPUTS) else None
            t = ts[eptr[edge_idx]]
            if state is not None:
                assert 0 <= t - state <= 1
            state = t


def test_determinism_same_key(karate_csc):
    a = _run_and_validate(karate_csc, key=7)
    b = _run_and_validate(karate_csc, key=7)
    for x, y in zip(a[2:6], b[2:6]):
        assert np.array_equal(x, y)


def test_different_keys_differ(karate_csc):
    a = _run_and_validate(karate_csc, key=8)
    b = _run_and_validate(karate_csc, key=9)
    assert not all(np.array_equal(x, y) for x, y in zip(a[2:6], b[2:6]))


def test_parity_entrypoint(karate, karate_csc):
    _x, _y, edge_index = karate
    col_ptrs, row_indices, _ = karate_csc
    samples, rows, cols, eptr, offs = tgt.neighbor_sampling_homogenous(
        col_ptrs, row_indices, np.array(INPUTS), FANOUTS,
        key=jax.random.key(11))
    validate_neighbor_samples(col_ptrs, row_indices, samples, samples,
                              rows, cols, offs, FANOUTS)


def test_window_fast_path_matches_scalar_gather():
    """The aligned-window id fetch must be bit-identical to the per-edge
    scalar gather it replaces (same positions, same ids), including windows
    near the end of `indices` where trailing table rows are clipped."""
    from tch_geometric_tpu.data.graph import make_graph

    rng = np.random.default_rng(3)
    N, E = 500, 4000
    ei = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)])
    col_ptrs, row_indices, _ = to_csc(ei, N)
    g_ell = make_graph(col_ptrs, row_indices, num_src=N, num_dst=N,
                       ell_table=True)
    g_win = make_graph(col_ptrs, row_indices, num_src=N, num_dst=N,
                       ell_table=False, window_table=True)
    g_plain = make_graph(col_ptrs, row_indices, num_src=N, num_dst=N,
                         ell_table=False, window_table=False)
    assert g_ell.ell is not None
    assert g_win.ell is None and g_win.indices_win is not None
    assert g_plain.ell is None and g_plain.indices_win is None

    # include the last nodes so windows touch the end of `indices`
    seeds = np.concatenate([rng.integers(0, N, 32), np.arange(N - 8, N)])
    # With replacement all three engines share `replacement_positions`
    # draws, so outputs must be bit-identical.
    outs = [sample_neighbors(g, seeds, [5, 3], key=jax.random.key(2),
                             sampler=tgt.UniformEdgeSampler(True))
            for g in (g_ell, g_win, g_plain)]
    ref = outs[-1]
    valid = np.asarray(ref.node_valid)
    for a in outs[:-1]:
        assert np.array_equal(np.asarray(a.node_valid), valid)
        assert np.array_equal(np.asarray(a.nodes)[valid],
                              np.asarray(ref.nodes)[valid])
        assert np.array_equal(np.asarray(a.eptr), np.asarray(ref.eptr))

    # Without replacement the ELL engine uses the loop-free lane-ranking
    # k-subset (uniform_lane_topk) instead of Floyd — distributionally
    # equivalent, not bit-equal.  Window-table vs plain still share Floyd
    # draws bit-for-bit.  The ELL output must satisfy the draw-independent
    # invariants: hop-1 valid counts equal min(deg(seed), k), every emitted
    # (eptr, neighbor) pair is a real edge, and positions are distinct per
    # frontier node (without-replacement property).
    o_ell, o_win, o_plain = [
        sample_neighbors(g, seeds, [5, 3], key=jax.random.key(2),
                         sampler=tgt.UniformEdgeSampler(False))
        for g in (g_ell, g_win, g_plain)]
    valid = np.asarray(o_plain.node_valid)
    assert np.array_equal(np.asarray(o_win.node_valid), valid)
    assert np.array_equal(np.asarray(o_win.nodes)[valid],
                          np.asarray(o_plain.nodes)[valid])
    assert np.array_equal(np.asarray(o_win.eptr), np.asarray(o_plain.eptr))
    ev = np.asarray(o_ell.edge_valid)
    eptr = np.asarray(o_ell.eptr)
    nodes = np.asarray(o_ell.nodes)
    rows_l = np.asarray(o_ell.rows)
    cols_l = np.asarray(o_ell.cols)
    assert np.array_equal(row_indices[eptr[ev]], nodes[rows_l[ev]])
    for c in np.unique(cols_l[ev]):
        sel = eptr[ev][cols_l[ev] == c]
        assert len(np.unique(sel)) == len(sel)
    # hop-1: per-seed valid child count == min(deg(seed), 5)
    deg = np.diff(col_ptrs)[seeds]
    hop1 = np.asarray(o_ell.node_valid)[
        o_ell.node_base[1]: o_ell.node_base[2]].reshape(len(seeds), 5)
    assert np.array_equal(hop1.sum(1), np.minimum(deg, 5))

    # Weighted sampling: the ELL windowed-values engine draws its Gumbel
    # noise on a (B, max_degree) layout, so positions differ from the
    # chunked window engine (distributionally equivalent, not bit-equal).
    # window-table vs plain still share the chunked engine bit-for-bit;
    # the ELL output must satisfy the edge-validity invariant.
    w = np.abs(rng.normal(size=row_indices.shape[0])).astype(np.float64) + 0.1
    sampler = tgt.WeightedEdgeSampler(w)
    o_ell, o_win, o_plain = [
        sample_neighbors(g, seeds, [5, 3], key=jax.random.key(2),
                         sampler=sampler)
        for g in (g_ell, g_win, g_plain)]
    assert np.array_equal(np.asarray(o_win.eptr), np.asarray(o_plain.eptr))
    ev = np.asarray(o_ell.edge_valid)
    eptr = np.asarray(o_ell.eptr)[ev]
    nodes = np.asarray(o_ell.nodes)
    rows_l = np.asarray(o_ell.rows)[ev]
    assert np.array_equal(row_indices[eptr], nodes[rows_l])


def test_ell_weighted_engine_bias_and_filter():
    """The ELL windowed-values engine (weights/timestamps via aligned row
    windows) must reproduce the weighted distribution and temporal masks."""
    from tch_geometric_tpu.data.graph import make_graph

    # Regular graph: every node has exactly deg in-edges, edge 0 weighted
    # 10x -> single-draw share should be 10/(10 + deg - 1).
    N, deg = 4000, 8
    col_ptrs = np.arange(N + 1) * deg
    row_indices = np.tile(np.arange(deg), N) + 1  # arbitrary src ids
    g = make_graph(col_ptrs, row_indices, num_src=deg + 1, num_dst=N,
                   ell_table=True)
    assert g.ell is not None
    w = np.ones(N * deg); w[np.arange(N) * deg] = 10.0
    out = sample_neighbors(g, np.arange(N), [1], key=jax.random.key(6),
                           sampler=tgt.WeightedEdgeSampler(w))
    eptr = np.asarray(out.eptr)
    share = float((eptr % deg == 0).mean())
    assert abs(share - 10 / 17) < 0.04, share

    # Temporal STATIC filter: only edges with ts in [0, 3] admissible ->
    # every sampled edge position must be in the first 4 of each window.
    ts = np.tile(np.arange(deg), N).astype(np.int64)
    filt = tgt.TemporalEdgeFilter((0, 3), ts, forward=True,
                                  mode=tgt.TEMPORAL_SAMPLE_STATIC)
    out = sample_neighbors(g, np.arange(N), [2], key=jax.random.key(7),
                           filter=(filt, np.zeros(N, np.int64)))
    ev = np.asarray(out.edge_valid)
    assert ev.any()
    assert (np.asarray(out.eptr)[ev] % deg <= 3).all()
