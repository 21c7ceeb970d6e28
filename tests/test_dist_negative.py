"""Distributed negative sampling over a partitioned topology
(parallel/dist_negative).

Pins (a) device-count invariance — P=1, P=2, P=4 produce bit-identical
(w, accepted) — and (b) the reference's negative-sampling invariant
(negative_sampling.rs:167-170): every accepted pair is a NON-edge and not
a self-loop, in the probe direction selected by ``inbound``.
"""
import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from tch_geometric_tpu.data.io import load_karate_graph
from tch_geometric_tpu.data.storage import to_csr
from tch_geometric_tpu.parallel.dist_negative import dist_negative_sample
from tch_geometric_tpu.parallel.dist_sampling import build_partitioned_graph


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
@pytest.mark.parametrize("inbound", [False, True])
def test_invariance_and_nonedge(karate_csr, ell_table, inbound):
    indptr, indices = karate_csr
    inputs = np.arange(8, dtype=np.int32)
    key = jax.random.key(7)
    num_neg, try_count = 5, 20
    results = {}
    for Pn in (1, 2, 4):
        g = build_partitioned_graph(indptr, indices, Pn, ell_table=ell_table)
        w, acc, ovf = dist_negative_sample(
            key, g, inputs, num_neg, try_count, _mesh(Pn), inbound=inbound,
            capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        results[Pn] = (np.asarray(w).reshape(8, num_neg),
                       np.asarray(acc).reshape(8, num_neg))
    for Pn in (2, 4):
        np.testing.assert_array_equal(results[1][0], results[Pn][0])
        np.testing.assert_array_equal(results[1][1], results[Pn][1])

    w, acc = results[1]
    assert acc.sum() > 0          # karate is sparse: negatives are plentiful
    for i in range(8):
        for n in range(num_neg):
            if not acc[i, n]:
                continue
            ww = int(w[i, n])
            assert ww != int(inputs[i])
            u, v = ((ww, int(inputs[i])) if inbound
                    else (int(inputs[i]), ww))
            assert not _has_edge(indptr, indices, u, v)


def test_hetero_invariance_and_nonedge():
    """Typed distributed negative sampling: P=1/2/4 bit-identical, accepted
    pairs are non-edges in the CHOSEN relation (negative_sampling.rs:50-131
    semantics: per-input uniform outgoing relation + rejection in its dst
    space)."""
    from tch_geometric_tpu.data.io import load_fake_hetero_graph
    from tch_geometric_tpu.data.storage import to_csr
    from tch_geometric_tpu.parallel.dist_hgt import build_partitioned_hetero
    from tch_geometric_tpu.parallel.dist_negative import (
        dist_negative_sample_hetero)
    from tch_geometric_tpu.utils.types import rel_key

    xs, edge_idx = load_fake_hetero_graph()
    node_counts = {t: int(x.shape[0]) for t, x in xs.items()}
    edge_types = sorted(edge_idx.keys())
    rp, ci = {}, {}
    csr_np = {}
    for e in edge_types:
        r = rel_key(e)
        a, b, _ = to_csr(np.asarray(edge_idx[e]),
                         (node_counts[e[0]], node_counts[e[2]]))
        rp[r], ci[r] = np.asarray(a), np.asarray(b)
        csr_np[r] = (rp[r], ci[r])
    types = sorted(node_counts)
    inputs = {types[0]: np.arange(8, dtype=np.int64)}
    key = jax.random.key(11)
    num_neg, try_count = 4, 10
    results = {}
    for Pn in (1, 2, 4):
        rels = build_partitioned_hetero(rp, ci, edge_types, Pn,
                                        node_counts=node_counts)
        w, acc, rc, ovf = dist_negative_sample_hetero(
            key, rels, edge_types, inputs, num_neg, try_count, _mesh(Pn),
            node_counts=node_counts, capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        results[Pn] = {t: (np.asarray(w[t]).reshape(-1, num_neg),
                           np.asarray(acc[t]).reshape(-1, num_neg),
                           np.asarray(rc[t]).reshape(-1, num_neg))
                       for t in w}
    for Pn in (2, 4):
        for t in results[1]:
            for a, b2 in zip(results[1][t], results[Pn][t]):
                np.testing.assert_array_equal(a, b2)

    # accepted pairs are non-edges of the chosen relation
    t0 = types[0]
    t_rels = [(rel_key(e), e[2]) for e in edge_types if e[0] == t0]
    w, acc, rc = results[1][t0]
    assert acc.sum() > 0
    for i in range(8):
        for n in range(num_neg):
            if not acc[i, n]:
                continue
            r, _dst = t_rels[int(rc[i, n])]
            indptr, indices = csr_np[r]
            assert int(w[i, n]) != i   # numeric self-loop guard (rs parity)
            assert not _has_edge(indptr, indices, i, int(w[i, n]))


def test_accept_rate_matches_density():
    """On a dense-ish random graph the accept rate over single trials must
    track 1 - density (each candidate is uniform over nodes)."""
    rng = np.random.default_rng(1)
    N = 64
    dense = rng.random((N, N)) < 0.5
    np.fill_diagonal(dense, False)
    src, dst = np.nonzero(dense)
    order = np.argsort(src, kind="stable")
    indices = dst[order].astype(np.int64)
    indptr = np.searchsorted(src[order], np.arange(N + 1)).astype(np.int64)
    inputs = np.arange(32, dtype=np.int32)
    g = build_partitioned_graph(indptr, indices, 2, ell_table=False)
    w, acc, ovf = dist_negative_sample(
        jax.random.key(0), g, inputs, 64, 1, _mesh(2), capacity_factor=8.0)
    assert int(np.asarray(ovf).sum()) == 0
    rate = float(np.asarray(acc).mean())
    assert 0.35 < rate < 0.62     # ~1 - density - 1/N self-loop mass


@pytest.mark.slow
def test_partitioned_link_trainer_invariance(karate_csr):
    """Distributed link-prediction training: loss trajectories and ranking
    accuracy agree across P=1/2/4 to float precision (the sampled trees
    and negatives are bit-identical by uid keying; cross-device psum
    reduction order contributes ~1e-7), and training improves ranking."""
    import jax.numpy as jnp
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.parallel.link_train import (
        make_partitioned_link_trainer)
    from tch_geometric_tpu.parallel.multihost import put_partitioned
    from tch_geometric_tpu.parallel.sharded_features import (
        build_interleaved_features)
    from jax.sharding import PartitionSpec as P

    indptr, indices = karate_csr
    rng_np = np.random.default_rng(0)
    x = rng_np.normal(size=(34, 16)).astype(np.float32)
    src = np.empty(8, np.int32)
    dst = np.empty(8, np.int32)
    for i in range(8):
        u = rng_np.integers(0, 34)
        while indptr[u + 1] == indptr[u]:
            u = rng_np.integers(0, 34)
        src[i] = u
        dst[i] = indices[rng_np.integers(indptr[u], indptr[u + 1])]

    key = jax.random.key(0)
    results = {}
    for Pn in (1, 2, 4):
        mesh = _mesh(Pn)
        g = build_partitioned_graph(indptr, indices, Pn)
        xi = build_interleaved_features(x, Pn)
        model = GraphSAGE(hidden=16, out=8, num_layers=2)
        init_fn, train_step, eval_step = make_partitioned_link_trainer(
            model, [3, 2], mesh, num_neg=2, try_count=8,
            learning_rate=1e-2, capacity_factor=8.0)
        with mesh:
            gput = put_partitioned(g, mesh, P("data"))
            xput = put_partitioned(np.asarray(xi), mesh, P("data"))
            sput = put_partitioned(jnp.asarray(src), mesh, P("data"))
            dput = put_partitioned(jnp.asarray(dst), mesh, P("data"))
            state = init_fn(key, gput, xput, sput, dput)
            losses = []
            for _ in range(5):
                state, loss, ovf = train_step(state, key, gput, xput,
                                              sput, dput)
                losses.append(float(loss))
                assert int(np.asarray(ovf).sum()) == 0
            eloss, rank = eval_step(state, key, gput, xput, sput, dput)
        results[Pn] = (losses, float(eloss), float(rank))
    for Pn in (2, 4):
        np.testing.assert_allclose(results[1][0], results[Pn][0],
                                   rtol=1e-5)
        np.testing.assert_allclose(results[1][1], results[Pn][1], rtol=1e-5)
        np.testing.assert_allclose(results[1][2], results[Pn][2], rtol=1e-5)
    assert results[1][0][-1] < results[1][0][0]      # training moves
