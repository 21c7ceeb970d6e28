"""Distributed heterogeneous neighbor sampling (parallel/dist_hetero).

Pins device-count invariance (multiset-identical typed pools + edge sets
for P=1/2/4 — per-device layouts interleave relations, so sets are the
invariant), the reference hetero invariants (every emitted edge exists in
its relation; src/dst resolve through the typed pools), and per-relation
weighted sampling through the typed path.
"""
import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from tch_geometric_tpu.data.io import load_fake_hetero_graph
from tch_geometric_tpu.data.storage import to_csc
from tch_geometric_tpu.parallel.dist_hetero import dist_hetero_neighbor_sample
from tch_geometric_tpu.parallel.dist_hgt import build_partitioned_hetero
from tch_geometric_tpu.utils.types import rel_key


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


@pytest.fixture(scope="module")
def hetero():
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


def test_hetero_neighbor_device_count_invariance(hetero):
    node_counts, edge_types, cp, ri = hetero
    types = sorted(node_counts)
    inputs = {types[0]: np.arange(8, dtype=np.int64)}
    nn = {rel_key(e): [3, 2] for e in edge_types}
    key = jax.random.key(41)
    results = {}
    for Pn in (1, 2, 4):
        rels = build_partitioned_hetero(cp, ri, edge_types, Pn,
                                        node_counts=node_counts)
        (nodes, nts, nv, rows, cols, eptr, ev), ovf = \
            dist_hetero_neighbor_sample(key, rels, edge_types, inputs, nn,
                                        2, _mesh(Pn), capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        res = {}
        for t in nodes:
            v = np.concatenate([np.asarray(nv[t][d]) for d in range(Pn)])
            n = np.concatenate([np.asarray(nodes[t][d]) for d in range(Pn)])
            res[t] = (int(v.sum()), sorted(n[v].tolist()))
        for r in eptr:
            e = np.concatenate([np.asarray(ev[r][d]) for d in range(Pn)])
            ep = np.concatenate([np.asarray(eptr[r][d]) for d in range(Pn)])
            res[r] = sorted(ep[e].tolist())
        results[Pn] = res
    for Pn in (2, 4):
        assert results[1] == results[Pn], f"P={Pn} differs"


def test_hetero_neighbor_edges_exist(hetero):
    node_counts, edge_types, cp, ri = hetero
    types = sorted(node_counts)
    inputs = {types[0]: np.arange(8, dtype=np.int64)}
    nn = {rel_key(e): [3, 2] for e in edge_types}
    Pn = 4
    rels = build_partitioned_hetero(cp, ri, edge_types, Pn,
                                    node_counts=node_counts)
    (nodes, _nts, nv, rows, cols, eptr, ev), _ = \
        dist_hetero_neighbor_sample(jax.random.key(2), rels, edge_types,
                                    inputs, nn, 2, _mesh(Pn),
                                    capacity_factor=8.0)
    for e in edge_types:
        r = rel_key(e)
        src_t, dst_t = e[0], e[2]
        ip, rin = cp[r], ri[r]
        total = 0
        for d in range(Pn):
            for rr, cc, ee, ok in zip(np.asarray(rows[r][d]),
                                      np.asarray(cols[r][d]),
                                      np.asarray(eptr[r][d]),
                                      np.asarray(ev[r][d])):
                if not ok:
                    continue
                total += 1
                src = np.asarray(nodes[src_t][d])[rr]
                dst = np.asarray(nodes[dst_t][d])[cc]
                assert np.asarray(nv[src_t][d])[rr]
                assert np.asarray(nv[dst_t][d])[cc]
                assert ip[dst] <= ee < ip[dst + 1]
                assert rin[ee] == src


def test_hetero_neighbor_weighted_relation(hetero):
    """A relation with one dominant-weight edge per dst row must sample
    only heavy edges at k=1 when flagged weighted."""
    node_counts, edge_types, cp, ri = hetero
    types = sorted(node_counts)
    e0 = edge_types[0]
    r0 = rel_key(e0)
    rng = np.random.default_rng(7)
    E = ri[r0].shape[0]
    w = np.full((E,), 1e-25)
    heavy = []
    ip = cp[r0]
    for v in range(len(ip) - 1):
        if ip[v + 1] > ip[v]:
            heavy.append(ip[v] + rng.integers(ip[v + 1] - ip[v]))
    heavy = np.asarray(heavy)
    w[heavy] = 1.0
    Pn = 2
    rels = build_partitioned_hetero(cp, ri, edge_types, Pn,
                                    node_counts=node_counts)
    # rebuild r0 with weights
    from tch_geometric_tpu.parallel.dist_sampling import (
        build_partitioned_graph)
    rels[r0] = build_partitioned_graph(cp[r0], ri[r0], Pn, edge_weights=w)
    inputs = {e0[2]: np.arange(8, dtype=np.int64)}   # seeds in r0's dst type
    nn = {rel_key(e): ([1, 1] if rel_key(e) == r0 else [0, 0])
          for e in edge_types}
    (nodes, _nts, _nv, rows, cols, eptr, ev), _ = \
        dist_hetero_neighbor_sample(jax.random.key(5), rels, edge_types,
                                    inputs, nn, 2, _mesh(Pn),
                                    weighted={r0}, capacity_factor=8.0)
    got = np.concatenate([np.asarray(eptr[r0][d])[np.asarray(ev[r0][d])]
                          for d in range(Pn)])
    assert got.size and np.all(np.isin(got, heavy)), "non-heavy edge sampled"


def test_hetero_neighbor_temporal_filter(hetero):
    """VERDICT r3 item 5: the distributed typed path's TemporalEdgeFilter.

    STATIC mode: with per-rel edge timestamps and k >= max degree, every
    sampled edge's timestamp falls in the window and EXACTLY the
    admissible in-edges of each seed are returned; results are
    P-invariant.  RELATIVE mode: admissibility is relative to each seed's
    input timestamp."""
    from tch_geometric_tpu.utils.config import (TEMPORAL_SAMPLE_RELATIVE,
                                                TEMPORAL_SAMPLE_STATIC)

    node_counts, edge_types, cp, ri = hetero
    types = sorted(node_counts)
    e0 = edge_types[0]
    r0 = rel_key(e0)
    rng = np.random.default_rng(11)
    ts = {r: rng.integers(0, 100, ri[r].shape[0]).astype(np.int64)
          for r in ri}
    inputs = {e0[2]: np.arange(8, dtype=np.int64)}   # seeds in r0's dst type
    k = 24                                           # >= fakehetero max deg
    nn = {rel_key(e): ([k] if rel_key(e) == r0 else [0])
          for e in edge_types}

    results = {}
    for Pn in (1, 2, 4):
        rels = build_partitioned_hetero(cp, ri, edge_types, Pn,
                                        edge_timestamps=ts,
                                        node_counts=node_counts)
        (nodes, _nts, _nv, rows, cols, eptr, ev), ovf = \
            dist_hetero_neighbor_sample(
                jax.random.key(9), rels, edge_types, inputs, nn, 1,
                _mesh(Pn), filter=((0, 50), True, TEMPORAL_SAMPLE_STATIC),
                capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        got = np.concatenate([np.asarray(eptr[r0][d])[np.asarray(ev[r0][d])]
                              for d in range(Pn)])
        assert got.size
        assert np.all((ts[r0][got] >= 0) & (ts[r0][got] <= 50))
        results[Pn] = sorted(got.tolist())
    for Pn in (2, 4):
        assert results[1] == results[Pn], f"P={Pn} differs"
    # exactness: k >= deg -> the admissible edge SET of the seeds
    ip = cp[r0]
    admissible = np.concatenate([
        np.arange(ip[v], ip[v + 1]) for v in range(8)])
    admissible = admissible[(ts[r0][admissible] >= 0)
                            & (ts[r0][admissible] <= 50)]
    assert results[1] == sorted(admissible.tolist())

    # RELATIVE: window (-10, 10) around each seed's own timestamp
    seed_ts = rng.integers(20, 80, 8).astype(np.int64)
    rels = build_partitioned_hetero(cp, ri, edge_types, 2,
                                    edge_timestamps=ts,
                                    node_counts=node_counts)
    (nodes, _nts, _nv, rows, cols, eptr, ev), ovf = \
        dist_hetero_neighbor_sample(
            jax.random.key(9), rels, edge_types, inputs, nn, 1, _mesh(2),
            input_timestamps={e0[2]: seed_ts},
            filter=((-10, 10), True, TEMPORAL_SAMPLE_RELATIVE),
            capacity_factor=8.0)
    assert int(np.asarray(ovf).sum()) == 0
    # per-device blocks cover seeds [d*4, (d+1)*4); hop edges are laid out
    # seed-major with k lanes per (seed, rel) slot
    for d in range(2):
        ee = np.asarray(eptr[r0][d]).reshape(4, k)
        vv = np.asarray(ev[r0][d]).reshape(4, k)
        for i in range(4):
            root = seed_ts[d * 4 + i]
            got = ee[i][vv[i]]
            lo, hi = root - 10, root + 10
            assert np.all((ts[r0][got] - root >= -10)
                          & (ts[r0][got] - root <= 10)), (d, i)
