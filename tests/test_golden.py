"""Golden seed-matched tests (SURVEY §4 / §7.3).

A pure-NumPy re-implementation of each sampler's algorithmic structure,
consuming the SAME counter-based jax.random keys, must reproduce the jitted
device program EXACTLY.  This validates the layout/slot machinery and key
discipline independently of the lax.scan/jit implementation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.sampling import primitives, rng
from tch_geometric_tpu.sampling.neighbor import compact_sample, sample_neighbors
from tch_geometric_tpu.utils.config import UniformEdgeSampler


def golden_floyd(key, deg, k):
    """NumPy mirror of primitives.floyd_sample."""
    deg = np.asarray(deg, dtype=np.int32)
    B = deg.shape[0]
    chosen = np.full((B, k), -1, np.int32)
    for i in range(k):
        j = deg - (k - i)
        hi = np.maximum(j + 1, 1)
        t = np.asarray(jax.random.randint(
            jax.random.fold_in(key, i), (B,), 0, jnp.asarray(hi),
            dtype=jnp.int32))
        hit = (chosen == t[:, None]).any(-1)
        chosen[:, i] = np.where(hit, j, t)
    iota = np.arange(k, dtype=np.int32)
    take_all = (deg <= k)[:, None]
    pos = np.where(take_all, np.broadcast_to(iota, (B, k)), chosen)
    valid = np.where(take_all, iota[None] < deg[:, None], deg[:, None] > 0)
    return np.where(valid, pos, 0), valid


def test_golden_floyd_matches_device():
    key = jax.random.key(42)
    deg = jnp.array([0, 1, 3, 5, 10, 100, 7, 50])
    pos_d, val_d = primitives.floyd_sample(key, deg, 6)
    pos_g, val_g = golden_floyd(key, np.asarray(deg), 6)
    assert np.array_equal(np.asarray(pos_d), pos_g)
    assert np.array_equal(np.asarray(val_d), val_g)


def golden_neighbor_sample(key, col_ptrs, row_indices, seeds, fanouts):
    """NumPy mirror of the uniform-with-replacement multi-hop sampler:
    same per-hop fold_in keys, same randint draws, same slot layout."""
    col_ptrs = np.asarray(col_ptrs)
    row_indices = np.asarray(row_indices)
    E = row_indices.shape[0]
    samples = [np.asarray(seeds, dtype=np.int64)]
    valid = [np.ones(len(seeds), bool)]
    rows, cols, eptrs, evalid = [], [], [], []
    node_base = [0, len(seeds)]
    for ell, k in enumerate(fanouts):
        frontier = samples[ell]
        fvalid = valid[ell]
        B = frontier.shape[0]
        hop_key = rng.fold(key, ell)
        fc = np.clip(frontier, 0, col_ptrs.shape[0] - 2)
        starts = col_ptrs[fc]
        deg = np.where(fvalid, col_ptrs[fc + 1] - starts, 0).astype(np.int32)
        hi = np.maximum(deg, 1)[:, None]
        posd = np.asarray(jax.random.randint(
            hop_key, (B, k), 0, jnp.asarray(hi), dtype=jnp.int32))
        v_ok = np.broadcast_to((deg > 0)[:, None], posd.shape)
        posd = np.where(v_ok, posd, 0)
        eptr = np.clip(starts[:, None] + posd, 0, max(E - 1, 0))
        nbr = row_indices[eptr]
        slot = node_base[ell + 1] + (np.arange(B)[:, None] * k + np.arange(k)[None])
        col = node_base[ell] + np.arange(B)[:, None]
        samples.append(nbr.reshape(-1))
        valid.append(v_ok.reshape(-1))
        rows.append(slot.reshape(-1))
        cols.append(np.broadcast_to(col, (B, k)).reshape(-1))
        eptrs.append(eptr.reshape(-1))
        evalid.append(v_ok.reshape(-1))
        node_base.append(node_base[-1] + B * k)
    nodes = np.concatenate(samples)
    nvalid = np.concatenate(valid)
    new_idx = np.cumsum(nvalid) - 1
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    eptrs = np.concatenate(eptrs)
    ev = np.concatenate(evalid)
    return (nodes[nvalid], new_idx[rows[ev]], new_idx[cols[ev]], eptrs[ev])


def test_golden_neighbor_sampling_matches_device(karate):
    _x, _y, edge_index = karate
    graph = csc_graph_from_coo(edge_index, 34)
    seeds = np.array([0, 1, 4, 5])
    fanouts = [4, 3]
    key = jax.random.key(123)
    out = sample_neighbors(graph, seeds, fanouts, key=key,
                           sampler=UniformEdgeSampler(with_replacement=True))
    samples_d, rows_d, cols_d, eptr_d, _offs = compact_sample(out)
    samples_g, rows_g, cols_g, eptr_g = golden_neighbor_sample(
        key, graph.indptr, graph.indices, seeds, fanouts)
    assert np.array_equal(samples_d, samples_g)
    assert np.array_equal(rows_d, rows_g)
    assert np.array_equal(cols_d, cols_g)
    assert np.array_equal(eptr_d, eptr_g)


def test_golden_cpp_wor_and_weighted_invariants(karate):
    """Extended C++ oracles: without-replacement draws are DISTINCT edges
    of the right row; weighted reservoir returns valid edges; the node2vec
    oracle's steps are all real out-edges."""
    from tch_geometric_tpu import native
    if not native.available():
        pytest.skip("native unavailable")
    from tch_geometric_tpu.data.storage import to_csr
    _x, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    cp = np.asarray(g.indptr, dtype=np.int64)
    ri = np.asarray(g.indices, dtype=np.int64)
    E = ri.shape[0]
    seeds = np.arange(8)

    s, rows, cols, eptr = native.neighbor_sample_golden(
        cp, ri, seeds, np.array([4, 3]), seed=7, with_replacement=False)
    per_parent = {}
    for j, i, e in zip(rows, cols, eptr):
        assert ri[e] == s[j]
        assert cp[s[i]] <= e < cp[s[i] + 1]
        per_parent.setdefault(i, []).append(e)
    for es in per_parent.values():
        assert len(es) == len(set(es)), "reservoir drew a duplicate edge"

    w = np.random.default_rng(0).uniform(0.1, 5.0, E)
    s, rows, cols, eptr = native.neighbor_sample_golden(
        cp, ri, seeds, np.array([4, 3]), seed=7, weights=w)
    for j, i, e in zip(rows, cols, eptr):
        assert ri[e] == s[j]
        assert cp[s[i]] <= e < cp[s[i] + 1]

    rp, ci, _ = to_csr(np.asarray(edge_index), 34)
    rp, ci = np.asarray(rp), np.asarray(ci)
    walks = native.random_walk_golden(rp, ci, seeds, 10, p=2.0, q=0.5,
                                      seed=3)
    assert (walks[:, 0] == seeds).all()
    for i in range(8):
        for l in range(10):
            if walks[i, l + 1] < 0:
                break
            u, v = walks[i, l], walks[i, l + 1]
            assert v in ci[rp[u]: rp[u + 1]]


def test_weighted_law_agreement_device_vs_cpp(karate):
    """LAW-level agreement: the device Gumbel-top-k weighted sampler and
    the C++ A-Chao weighted reservoir produce matching per-edge marginal
    inclusion frequencies on a hub row (k=2 of its in-edges, weights 8:1),
    within Monte-Carlo tolerance — the distributional-equivalence evidence
    SURVEY §7.3 calls for (bit-exactness across different RNGs is not
    defined)."""
    from tch_geometric_tpu import native
    if not native.available():
        pytest.skip("native unavailable")
    from tch_geometric_tpu.sampling.neighbor import sample_neighbors
    from tch_geometric_tpu.utils.config import WeightedEdgeSampler
    _x, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    cp = np.asarray(g.indptr, dtype=np.int64)
    ri = np.asarray(g.indices, dtype=np.int64)
    E = ri.shape[0]
    hub = int(np.argmax(np.diff(cp)))
    deg = int(cp[hub + 1] - cp[hub])
    w = np.ones(E)
    w[cp[hub]: cp[hub] + 2] = 8.0                    # two heavy edges
    seeds = np.array([hub])
    R = 1500
    counts_cpp = np.zeros(deg)
    for t in range(R):
        _s, _r, _c, eptr = native.neighbor_sample_golden(
            cp, ri, seeds, np.array([2]), seed=1000 + t, weights=w)
        for e in eptr:
            counts_cpp[e - cp[hub]] += 1
    counts_dev = np.zeros(deg)
    sampler = WeightedEdgeSampler(weights=w.astype(np.float32))
    for t in range(0, R, 250):   # device draws are batched: 250 seeds/call
        out = sample_neighbors(g, np.full(250, hub), [2],
                               key=jax.random.key(t), sampler=sampler)
        ev = np.asarray(out.edge_valid)
        for e in np.asarray(out.eptr)[ev]:
            counts_dev[e - cp[hub]] += 1
    f_cpp = counts_cpp / counts_cpp.sum()
    f_dev = counts_dev / counts_dev.sum()
    # heavy edges dominate in both; marginals agree within MC noise
    assert f_cpp[:2].sum() > 0.4 and f_dev[:2].sum() > 0.4
    np.testing.assert_allclose(f_cpp, f_dev, atol=0.04)


def test_golden_cpp_sampler_invariants(karate):
    """The native C++ golden sampler obeys the same invariants."""
    from tch_geometric_tpu import native
    if not native.available():
        pytest.skip("native unavailable")
    _x, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    cp = np.asarray(g.indptr)
    ri = np.asarray(g.indices)
    samples, rows, cols, eptr = native.neighbor_sample_golden(
        cp, ri, np.array([0, 1, 4, 5]), np.array([4, 3]), seed=99)
    for j, i, e in zip(rows, cols, eptr):
        assert ri[e] == samples[j]
        w = samples[i]
        assert cp[w] <= e < cp[w + 1]
