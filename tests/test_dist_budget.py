"""Distributed budget sampling over a partitioned topology (dist_budget).

Pins device-count invariance (P=1 == P=2 == P=4 bit-identical trees), the
reference's budget invariants (every sampled edge exists; per-node output
bounded by fanout; <=50-candidate cap), and temporal-filter admissibility
(budget_sampling.rs:13-38 runtime filter)."""
import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from tch_geometric_tpu.data.io import load_karate_graph
from tch_geometric_tpu.data.storage import to_csc
from tch_geometric_tpu.parallel.dist_budget import dist_budget_sample
from tch_geometric_tpu.parallel.dist_sampling import build_partitioned_graph
from tch_geometric_tpu.utils.types import NAN_TIMESTAMP


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


@pytest.fixture(scope="module")
def karate_csc():
    _x, _y, edge_index = load_karate_graph()
    col_ptrs, row_indices, _perm = to_csc(np.asarray(edge_index), 34)
    return np.asarray(col_ptrs), np.asarray(row_indices)


def _layers(sample, arrays_by_dev):
    out = []
    nb = sample.node_base
    for l in range(len(nb) - 1):
        out.append(np.concatenate(
            [a[nb[l]: nb[l + 1]] for a in arrays_by_dev]))
    return np.concatenate(out)


@pytest.mark.parametrize("ell_table", [True, False])
def test_budget_device_count_invariance(karate_csc, ell_table):
    indptr, indices = karate_csc
    seeds = np.arange(8, dtype=np.int32)
    key = jax.random.key(13)
    results = {}
    for Pn in (1, 2, 4):
        g = build_partitioned_graph(indptr, indices, Pn, ell_table=ell_table)
        sample, ovf = dist_budget_sample(key, g, seeds, (4, 3), _mesh(Pn),
                                         capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        n = _layers(sample, list(np.asarray(sample.nodes)))
        v = _layers(sample, list(np.asarray(sample.node_valid)))
        results[Pn] = (np.where(v, n, -1), v)
    for Pn in (2, 4):
        np.testing.assert_array_equal(results[1][0], results[Pn][0])
        np.testing.assert_array_equal(results[1][1], results[Pn][1])


def test_budget_edges_exist_and_distinct(karate_csc):
    """Budget invariants: sampled edges exist (eptr resolves in the dst's
    CSC window to the src node) and a node's k draws are DISTINCT edges
    (without-replacement selection from the candidate budget)."""
    indptr, indices = karate_csc
    Pn = 4
    g = build_partitioned_graph(indptr, indices, Pn)
    seeds = np.arange(8, dtype=np.int32)
    sample, _ = dist_budget_sample(jax.random.key(1), g, seeds, (4, 3),
                                   _mesh(Pn), capacity_factor=8.0)
    nodes = np.asarray(sample.nodes)
    rows = np.asarray(sample.rows)
    cols = np.asarray(sample.cols)
    eptr = np.asarray(sample.eptr)
    ev = np.asarray(sample.edge_valid)
    for d in range(Pn):
        per_col = {}
        for r, c, e, ok in zip(rows[d], cols[d], eptr[d], ev[d]):
            if not ok:
                continue
            src, dst = nodes[d][r], nodes[d][c]
            assert indptr[dst] <= e < indptr[dst + 1]
            assert indices[e] == src
            per_col.setdefault((c,), []).append(e)
        for es in per_col.values():
            assert len(es) == len(set(es)), "duplicate edge within a node"


def test_budget_full_coverage_small_degree(karate_csc):
    """k >= deg (and deg <= 50): every in-edge of the seed appears exactly
    once — the budget holds the whole row and uniform top-k must exhaust."""
    indptr, indices = karate_csc
    Pn = 4
    g = build_partitioned_graph(indptr, indices, Pn)
    seeds = np.arange(32, dtype=np.int32)
    k = 20
    sample, _ = dist_budget_sample(jax.random.key(0), g, seeds, (k,),
                                   _mesh(Pn), capacity_factor=8.0)
    nodes = np.asarray(sample.nodes)
    valid = np.asarray(sample.node_valid)
    B0 = 32 // Pn
    for d in range(Pn):
        for i in range(B0):
            v = seeds[d * B0 + i]
            got = nodes[d][B0 + i * k: B0 + (i + 1) * k]
            ok = valid[d][B0 + i * k: B0 + (i + 1) * k]
            expect = np.sort(indices[indptr[v]: indptr[v + 1]])
            np.testing.assert_array_equal(np.sort(got[ok]), expect)


@pytest.mark.parametrize("relative", [False, True])
def test_budget_temporal_filter(karate_csc, relative):
    """Runtime filter: only candidates with delta in [lo, hi) survive; the
    carried state is the edge ts (default) or frozen root ts (relative)."""
    indptr, indices = karate_csc
    E = indices.shape[0]
    rng = np.random.default_rng(3)
    ts = rng.integers(0, 100, E).astype(np.int64)
    Pn = 4
    g = build_partitioned_graph(indptr, indices, Pn, edge_timestamps=ts)
    seeds = np.arange(8, dtype=np.int32)
    seed_ts = np.full(8, 50, dtype=np.int32)
    sample, ovf = dist_budget_sample(
        jax.random.key(2), g, seeds, (20,), _mesh(Pn),
        input_timestamps=seed_ts, window=(0, 30), forward=True,
        relative=relative, capacity_factor=8.0)
    assert int(np.asarray(ovf).sum()) == 0
    eptr = np.asarray(sample.eptr)
    ev = np.asarray(sample.edge_valid)
    st = np.asarray(sample.node_state)
    rows = np.asarray(sample.rows)
    # forward filter: d = v_ts - state in [0, 30) -> v_ts in [50, 80)
    got = ts[eptr[ev]]
    assert np.all((got >= 50) & (got < 80))
    for d in range(Pn):
        for r, e, ok in zip(rows[d], eptr[d], ev[d]):
            if ok:
                expect = 50 if relative else ts[e]
                assert st[d][r] == expect


# ---------------------------------------------------------------------------
# typed (heterogeneous) distributed budget sampling
# ---------------------------------------------------------------------------

def _hetero_fixture():
    from tch_geometric_tpu.data.io import load_fake_hetero_graph
    from tch_geometric_tpu.data.storage import to_csc
    from tch_geometric_tpu.utils.types import rel_key
    xs, edge_idx = load_fake_hetero_graph()
    node_counts = {t: int(x.shape[0]) for t, x in xs.items()}
    edge_types = sorted(edge_idx.keys())
    cp, ri = {}, {}
    for e in edge_types:
        r = rel_key(e)
        a, b, _ = to_csc(np.asarray(edge_idx[e]),
                         (node_counts[e[0]], node_counts[e[2]]))
        cp[r], ri[r] = np.asarray(a), np.asarray(b)
    return node_counts, edge_types, cp, ri


def test_hetero_budget_device_count_invariance():
    from tch_geometric_tpu.parallel.dist_budget import (
        dist_budget_sample_hetero)
    from tch_geometric_tpu.parallel.dist_hgt import build_partitioned_hetero
    node_counts, edge_types, cp, ri = _hetero_fixture()
    types = sorted(node_counts)
    inputs = {types[0]: np.arange(8, dtype=np.int64)}
    num_neighbors = {t: [3, 2] for t in types}
    key = jax.random.key(31)
    results = {}
    for Pn in (1, 2, 4):
        rels = build_partitioned_hetero(cp, ri, edge_types, Pn,
                                        node_counts=node_counts)
        (nodes, nts, nv, rows, cols, eptr, ev), ovf = \
            dist_budget_sample_hetero(
                key, rels, edge_types, inputs, num_neighbors, 2, _mesh(Pn),
                capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        res = {}
        for t in nodes:
            # reassemble global per-hop segments from per-device blocks
            v = np.concatenate([np.asarray(nv[t][d]) for d in range(Pn)])
            n = np.concatenate([np.asarray(nodes[t][d]) for d in range(Pn)])
            # per-device layouts interleave; compare SETS per type of
            # (node, state) among valid entries plus total counts
            st = np.concatenate([np.asarray(nts[t][d]) for d in range(Pn)])
            res[t] = (int(v.sum()),
                      sorted(map(tuple, np.stack([n[v], st[v]], 1).tolist())))
        for r in eptr:
            e = np.concatenate([np.asarray(ev[r][d]) for d in range(Pn)])
            ep = np.concatenate([np.asarray(eptr[r][d]) for d in range(Pn)])
            res[r] = sorted(ep[e].tolist())
        results[Pn] = res
    for Pn in (2, 4):
        assert results[1] == results[Pn], f"P={Pn} differs"


def test_hetero_budget_edges_exist():
    from tch_geometric_tpu.parallel.dist_budget import (
        dist_budget_sample_hetero)
    from tch_geometric_tpu.parallel.dist_hgt import build_partitioned_hetero
    from tch_geometric_tpu.utils.types import rel_key
    node_counts, edge_types, cp, ri = _hetero_fixture()
    types = sorted(node_counts)
    inputs = {types[0]: np.arange(8, dtype=np.int64)}
    Pn = 4
    rels = build_partitioned_hetero(cp, ri, edge_types, Pn,
                                    node_counts=node_counts)
    (nodes, _nts, nv, rows, cols, eptr, ev), _ = dist_budget_sample_hetero(
        jax.random.key(1), rels, edge_types, inputs,
        {t: [3, 2] for t in types}, 2, _mesh(Pn), capacity_factor=8.0)
    for e in edge_types:
        r = rel_key(e)
        src_t, dst_t = e[0], e[2]
        ip, rin = cp[r], ri[r]
        for d in range(Pn):
            for rr, cc, ee, ok in zip(np.asarray(rows[r][d]),
                                      np.asarray(cols[r][d]),
                                      np.asarray(eptr[r][d]),
                                      np.asarray(ev[r][d])):
                if not ok:
                    continue
                src = np.asarray(nodes[src_t][d])[rr]
                dst = np.asarray(nodes[dst_t][d])[cc]
                assert ip[dst] <= ee < ip[dst + 1]
                assert rin[ee] == src
