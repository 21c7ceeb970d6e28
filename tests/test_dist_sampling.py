"""Distributed sampling over a partitioned topology (parallel/dist_sampling).

The SURVEY §7.3 frontier-ownership protocol: adjacency rows live only on
their owner device, every hop routes requests via all_to_all, owners sample
locally with slot-uid counter-based keys.  Pins the headline property: the
sampled trees are BIT-IDENTICAL for any device count.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.data.io import load_karate_graph
from tch_geometric_tpu.data.storage import to_csc
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel.dist_sampling import (
    build_partitioned_graph, dist_sample_neighbors, make_partitioned_trainer)
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


@pytest.fixture(scope="module")
def karate_csc():
    _x, _y, edge_index = load_karate_graph()
    col_ptrs, row_indices, _perm = to_csc(np.asarray(edge_index), 34)
    return np.asarray(col_ptrs), np.asarray(row_indices)


def test_partition_roundtrip(karate_csc):
    indptr, indices = karate_csc
    Pn = 4
    g = build_partitioned_graph(indptr, indices, Pn)
    Np = g.rows_per_part
    ldeg = np.asarray(g.ldeg)
    lstart = np.asarray(g.lstart)
    gstart = np.asarray(g.gstart)
    lind = np.asarray(g.lindices)
    for v in range(34):
        p, j = v % Pn, v // Pn
        row = p * Np + j
        d = indptr[v + 1] - indptr[v]
        assert ldeg[row] == d
        assert gstart[row] == indptr[v]
        got = lind[p * g.local_edge_cap + lstart[row]:
                   p * g.local_edge_cap + lstart[row] + d]
        np.testing.assert_array_equal(got, indices[indptr[v]: indptr[v] + d])
    # ELL rows agree too (karate max degree fits the 64-lane width)
    assert g.ell is not None
    ell = np.asarray(g.ell)
    for v in range(34):
        p, j = v % Pn, v // Pn
        row = ell[p * Np + j]
        d = indptr[v + 1] - indptr[v]
        assert row[-2] == d and row[-1] == indptr[v]
        np.testing.assert_array_equal(row[:d], indices[indptr[v]:indptr[v] + d])


def _layers(sample, arrays_by_dev):
    """Reassemble global per-layer blocks from per-device blocks."""
    out = []
    nb = sample.node_base
    for l in range(len(nb) - 1):
        out.append(np.concatenate(
            [a[nb[l]: nb[l + 1]] for a in arrays_by_dev]))
    return np.concatenate(out)


@pytest.mark.parametrize("ell_table", [True, False])
@pytest.mark.parametrize("with_replacement", [False, True])
def test_device_count_invariance(karate_csc, ell_table, with_replacement):
    """P=1, P=2, P=4 produce bit-identical sample trees."""
    indptr, indices = karate_csc
    seeds = np.arange(8, dtype=np.int32)
    key = jax.random.key(7)
    results = {}
    for Pn in (1, 2, 4):
        g = build_partitioned_graph(indptr, indices, Pn,
                                    ell_table=ell_table)
        sample, ovf = dist_sample_neighbors(
            key, g, seeds, (4, 3), _mesh(Pn),
            with_replacement=with_replacement, capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        nodes = np.asarray(sample.nodes)
        valid = np.asarray(sample.node_valid)
        eptr = np.asarray(sample.eptr)
        evalid = np.asarray(sample.edge_valid)
        # reassemble global layers from the per-device blocks
        n = _layers(sample, list(nodes))
        v = _layers(sample, list(valid))
        results[Pn] = (np.where(v, n, -1), v,
                       eptr.reshape(-1), evalid.reshape(-1))
    for Pn in (2, 4):
        np.testing.assert_array_equal(results[1][0], results[Pn][0])
        np.testing.assert_array_equal(results[1][1], results[Pn][1])


def test_sampled_edges_exist(karate_csc):
    """Reference invariants (neighbor_sampling.rs:370-401): every emitted
    edge exists in the graph, eptr lies in the dst's CSC window and resolves
    to the src node."""
    indptr, indices = karate_csc
    Pn = 4
    g = build_partitioned_graph(indptr, indices, Pn)
    seeds = np.arange(8, dtype=np.int32)
    sample, _ = dist_sample_neighbors(
        jax.random.key(3), g, seeds, (4, 3), _mesh(Pn), capacity_factor=8.0)
    nodes = np.asarray(sample.nodes)
    rows = np.asarray(sample.rows)
    cols = np.asarray(sample.cols)
    eptr = np.asarray(sample.eptr)
    evalid = np.asarray(sample.edge_valid)
    for d in range(Pn):
        for r, c, e, ok in zip(rows[d], cols[d], eptr[d], evalid[d]):
            if not ok:
                continue
            src, dst = nodes[d][r], nodes[d][c]
            assert indptr[dst] <= e < indptr[dst + 1]
            assert indices[e] == src


def test_full_coverage_when_k_ge_deg(karate_csc):
    """k >= max_degree without replacement must return EVERY in-neighbor of
    every seed exactly once — exactness of the owner-side k-subset."""
    indptr, indices = karate_csc
    Pn = 4
    g = build_partitioned_graph(indptr, indices, Pn)
    seeds = np.arange(32, dtype=np.int32)
    k = 20  # karate max in-degree is below this
    sample, _ = dist_sample_neighbors(
        jax.random.key(0), g, seeds, (k,), _mesh(Pn), capacity_factor=8.0)
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


def test_overflow_diagnostic(karate_csc):
    indptr, indices = karate_csc
    Pn = 8
    g = build_partitioned_graph(indptr, indices, Pn)
    seeds = np.arange(32, dtype=np.int32)
    _, ovf = dist_sample_neighbors(
        jax.random.key(1), g, seeds, (8, 8), _mesh(Pn),
        capacity_factor=0.25)
    assert int(np.asarray(ovf).sum()) > 0


def test_multi_round_routing_skewed_frontier(karate_csc):
    """A frontier concentrated on ONE owner (every seed is the same hub —
    the power-law worst case) overflows a tight single-round capacity but
    loses NOTHING with retry rounds, and the retried tree is bit-identical
    to the P=1 tree (draws are uid-keyed, round-independent)."""
    indptr, indices = karate_csc
    hub = int(np.argmax(np.diff(indptr)))          # highest-degree node
    seeds = np.full((8,), hub, dtype=np.int32)
    key = jax.random.key(11)

    # single tight round: capacity ceil(0.5 * 2 / 4) = 1 < 2 requests/owner
    g4 = build_partitioned_graph(indptr, indices, 4)
    _, ovf1 = dist_sample_neighbors(key, g4, seeds, (4, 3), _mesh(4),
                                    capacity_factor=0.5, num_rounds=1)
    assert int(np.asarray(ovf1).sum()) > 0

    results = {}
    for Pn in (1, 2, 4):
        g = build_partitioned_graph(indptr, indices, Pn)
        sample, ovf = dist_sample_neighbors(
            key, g, seeds, (4, 3), _mesh(Pn),
            capacity_factor=0.5, num_rounds=16)
        assert int(np.asarray(ovf).sum()) == 0, f"loss at P={Pn} with retries"
        n = _layers(sample, list(np.asarray(sample.nodes)))
        v = _layers(sample, list(np.asarray(sample.node_valid)))
        results[Pn] = (np.where(v, n, -1), v)
    for Pn in (2, 4):
        np.testing.assert_array_equal(results[1][0], results[Pn][0])
        np.testing.assert_array_equal(results[1][1], results[Pn][1])


@pytest.mark.slow
def test_halo_gather_multi_round():
    """halo_gather with every request aimed at owner 0: a tight capacity
    drops rows in one round, retry rounds recover every row exactly."""
    import functools
    from jax import shard_map
    from tch_geometric_tpu.parallel.sharded_features import halo_gather

    Pn, Np, F = 4, 8, 16
    mesh = _mesh(Pn)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(Pn * Np, F)).astype(np.float32)
    # global ids owned by device 0 only: ids % 4 == 0
    ids = (4 * rng.integers(0, Np, size=(Pn, 6))).astype(np.int32)

    def run(num_rounds):
        @functools.partial(
            shard_map, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=(P("data"), P("data")))
        def f(x_shard, ids_local):
            out, ovf = halo_gather(x_shard, ids_local[0], axis="data",
                                   num_parts=Pn, capacity=2,
                                   num_rounds=num_rounds)
            return out[None], ovf[None]
        with mesh:
            xs = jax.device_put(
                x, NamedSharding(mesh, P("data")))
            il = jax.device_put(ids, NamedSharding(mesh, P("data")))
            return f(xs, il)

    out1, ovf1 = run(1)
    assert int(np.asarray(ovf1).sum()) > 0          # 6 requests > capacity 2
    out3, ovf3 = run(3)                              # 3 * 2 covers all 6
    assert int(np.asarray(ovf3).sum()) == 0
    # interleaved table: global row g lives at shard (g % P), local g // P
    # -> x was built dense, so expected row of global id g is x[...]
    for d in range(Pn):
        for j, gid in enumerate(ids[d]):
            owner, local = gid % Pn, gid // Pn
            np.testing.assert_allclose(np.asarray(out3)[d, j],
                                       x[owner * Np + local])


@pytest.mark.slow
def test_partitioned_trainer_karate():
    x_np, y, edge_index = load_karate_graph()
    col_ptrs, row_indices, _perm = to_csc(np.asarray(edge_index), 34)
    Pn = 8
    g = build_partitioned_graph(np.asarray(col_ptrs),
                                np.asarray(row_indices), Pn)
    mesh = _mesh(Pn)
    xi = jnp.asarray(build_interleaved_features(np.asarray(x_np), Pn))
    labels = jnp.asarray(y)
    model = GraphSAGE(hidden=32, out=int(y.max()) + 1, num_layers=2)
    # karate is tiny/hub-heavy -> generous capacity (cf. sharded test)
    init_fn, train_step, eval_step = make_partitioned_trainer(
        model, [4, 3], mesh, learning_rate=1e-2, capacity_factor=6.0)

    with mesh:
        data_sh = NamedSharding(mesh, P("data"))
        gput = jax.device_put(g, data_sh)
        xi = jax.device_put(xi, data_sh)
        seeds = jax.device_put(jnp.arange(32, dtype=jnp.int32), data_sh)
        lab = jax.device_put(labels[:32], data_sh)
        key = jax.random.key(0)
        state = init_fn(key, gput, xi, seeds)
        for _ in range(60):
            state, loss, acc, overflow = train_step(state, key, gput, xi,
                                                    seeds, lab)
        assert int(overflow) == 0
        loss, acc = eval_step(state, key, gput, xi, seeds, lab)
        assert float(acc) >= 0.85, (float(loss), float(acc))


@pytest.mark.parametrize("ell_table", [True, False])
def test_weighted_dist_sampling(karate_csc, ell_table):
    """Weighted distributed sampling: a dominant-weight edge per node must
    win k=1 draws; trees are device-count invariant.  ell_table=False covers
    the chunked window engine (rows beyond the ELL width)."""
    indptr, indices = karate_csc
    E = indices.shape[0]
    rng = np.random.default_rng(5)
    # per dst row: one in-edge gets weight 1, the rest ~1e-25 (log gap ~58
    # dwarfs Gumbel noise) -> k=1 must select the heavy edge
    w = np.full((E,), 1e-25)
    heavy = np.array([indptr[v] + rng.integers(indptr[v + 1] - indptr[v])
                      for v in range(34) if indptr[v + 1] > indptr[v]])
    w[heavy] = 1.0
    seeds = np.arange(8, dtype=np.int32)
    results = {}
    for Pn in (1, 2, 4):
        g = build_partitioned_graph(indptr, indices, Pn, edge_weights=w,
                                    ell_table=ell_table)
        sample, ovf = dist_sample_neighbors(
            jax.random.key(2), g, seeds, (1, 1), _mesh(Pn), weighted=True,
            capacity_factor=8.0)
        assert int(np.asarray(ovf).sum()) == 0
        eptr = np.asarray(sample.eptr)
        ev = np.asarray(sample.edge_valid)
        assert np.all(np.isin(eptr[ev], heavy)), "non-heavy edge sampled"
        # reassemble global per-layer edge blocks using THIS mesh's layout
        eb = sample.edge_base
        masked = np.where(ev, eptr, -1)
        results[Pn] = np.concatenate([
            np.concatenate([masked[d][eb[l]: eb[l + 1]]
                            for d in range(Pn)])
            for l in range(len(eb) - 1)])
    for Pn in (2, 4):
        np.testing.assert_array_equal(results[1], results[Pn])


@pytest.mark.parametrize("ell_table", [True, False])
def test_temporal_dist_sampling(karate_csc, ell_table):
    """STATIC temporal filter: only in-window edges are sampled; with
    k >= degree, EXACTLY the admissible edges are returned.  DYNAMIC mode
    carries the sampled edge timestamp as the child state."""
    from tch_geometric_tpu.utils.config import (TEMPORAL_SAMPLE_DYNAMIC,
                                                TEMPORAL_SAMPLE_STATIC)
    indptr, indices = karate_csc
    E = indices.shape[0]
    rng = np.random.default_rng(9)
    ts = rng.integers(0, 100, E).astype(np.int64)
    seeds = np.arange(8, dtype=np.int32)
    Pn = 4
    g = build_partitioned_graph(indptr, indices, Pn, edge_timestamps=ts,
                                ell_table=ell_table)

    k = 20
    sample, ovf = dist_sample_neighbors(
        jax.random.key(4), g, seeds, (k,), _mesh(Pn),
        filter=(((0, 50), True, TEMPORAL_SAMPLE_STATIC), None),
        capacity_factor=8.0)
    assert int(np.asarray(ovf).sum()) == 0
    eptr = np.asarray(sample.eptr)
    ev = np.asarray(sample.edge_valid)
    assert np.all((ts[eptr[ev]] >= 0) & (ts[eptr[ev]] <= 50))
    # exactness: k >= deg -> every admissible in-edge appears exactly once
    B0 = 8 // Pn
    for d in range(Pn):
        for i in range(B0):
            v = seeds[d * B0 + i]
            sl = slice(B0 * 1 + 0, None)  # edges of hop 0 are all edges
            got = eptr[d][i * k: (i + 1) * k]
            ok = ev[d][i * k: (i + 1) * k]
            admissible = np.arange(indptr[v], indptr[v + 1])
            admissible = admissible[(ts[admissible] >= 0)
                                    & (ts[admissible] <= 50)]
            np.testing.assert_array_equal(np.sort(got[ok]), admissible)

    # DYNAMIC: child state == sampled edge timestamp
    sample, _ = dist_sample_neighbors(
        jax.random.key(4), g, seeds, (4, 3), _mesh(Pn),
        filter=(((-100, 100), True, TEMPORAL_SAMPLE_DYNAMIC), None),
        capacity_factor=8.0)
    nodes_state = np.asarray(sample.node_state)
    eptr = np.asarray(sample.eptr)
    rows = np.asarray(sample.rows)
    ev = np.asarray(sample.edge_valid)
    for d in range(Pn):
        for r, e, ok in zip(rows[d], eptr[d], ev[d]):
            if ok:
                assert nodes_state[d][r] == ts[e]


@pytest.mark.slow
def test_temporal_weighted_partitioned_trainer_invariance():
    """VERDICT r3 item 4: weighted + temporal sampling reachable FROM the
    partitioned train step — loss trajectories are P-invariant (bit-exact
    trees via uid keys; psum order contributes ~1e-7) and training moves.

    The graph carries both edge weights and timestamps; the trainer uses
    RELATIVE temporal filtering rooted at per-seed timestamps (the CTDNE-
    style training config of BASELINE config 5) and weight-proportional
    Gumbel sampling at every hop."""
    from tch_geometric_tpu.utils.config import TEMPORAL_SAMPLE_RELATIVE

    x_np, y, edge_index = load_karate_graph()
    col_ptrs, row_indices, _perm = to_csc(np.asarray(edge_index), 34)
    indptr, indices = np.asarray(col_ptrs), np.asarray(row_indices)
    E = indices.shape[0]
    rng = np.random.default_rng(3)
    w = rng.uniform(0.1, 2.0, E).astype(np.float32)
    ts = rng.integers(0, 100, E).astype(np.int64)
    seeds = np.arange(8, dtype=np.int32)
    seed_ts = rng.integers(20, 80, 8).astype(np.int32)
    labels = np.asarray(y)[:8]

    results = {}
    for Pn in (1, 2, 4):
        mesh = _mesh(Pn)
        g = build_partitioned_graph(indptr, indices, Pn, edge_weights=w,
                                    edge_timestamps=ts)
        xi = jnp.asarray(build_interleaved_features(np.asarray(x_np), Pn))
        model = GraphSAGE(hidden=16, out=int(y.max()) + 1, num_layers=2)
        init_fn, train_step, eval_step = make_partitioned_trainer(
            model, [3, 2], mesh, learning_rate=1e-2, weighted=True,
            filter=((-40, 40), True, TEMPORAL_SAMPLE_RELATIVE),
            capacity_factor=8.0)
        with mesh:
            sh = NamedSharding(mesh, P("data"))
            gput = jax.device_put(g, sh)
            xput = jax.device_put(xi, sh)
            sput = jax.device_put(jnp.asarray(seeds), sh)
            lput = jax.device_put(jnp.asarray(labels), sh)
            tput = jax.device_put(jnp.asarray(seed_ts), sh)
            key = jax.random.key(0)
            state = init_fn(key, gput, xput, sput, seed_ts=tput)
            losses = []
            for _ in range(5):
                state, loss, _acc, ovf = train_step(
                    state, key, gput, xput, sput, lput, seed_ts=tput)
                losses.append(float(loss))
                assert int(np.asarray(ovf).sum()) == 0
            eloss, _eacc = eval_step(state, key, gput, xput, sput, lput,
                                     seed_ts=tput)
        results[Pn] = (losses, float(eloss))
    for Pn in (2, 4):
        np.testing.assert_allclose(results[1][0], results[Pn][0], rtol=1e-5)
        np.testing.assert_allclose(results[1][1], results[Pn][1], rtol=1e-5)
    assert results[1][0][-1] < results[1][0][0]


@pytest.mark.slow
def test_partitioned_trainer_bf16_exchange_invariance():
    """exchange_dtype=bf16 (halved halo traffic) keeps loss trajectories
    P-invariant and training moving."""
    x_np, y, edge_index = load_karate_graph()
    col_ptrs, row_indices, _perm = to_csc(np.asarray(edge_index), 34)
    seeds = np.arange(8, dtype=np.int32)
    labels = np.asarray(y)[:8]
    key = jax.random.key(0)
    results = {}
    for Pn in (1, 4):
        mesh = _mesh(Pn)
        g = build_partitioned_graph(np.asarray(col_ptrs),
                                    np.asarray(row_indices), Pn)
        xi = jnp.asarray(build_interleaved_features(np.asarray(x_np), Pn))
        model = GraphSAGE(hidden=16, out=int(y.max()) + 1, num_layers=2)
        init_fn, train_step, _ = make_partitioned_trainer(
            model, [3, 2], mesh, learning_rate=1e-2, capacity_factor=8.0,
            exchange_dtype=jnp.bfloat16)
        with mesh:
            sh = NamedSharding(mesh, P("data"))
            gput = jax.device_put(g, sh)
            xput = jax.device_put(xi, sh)
            sput = jax.device_put(jnp.asarray(seeds), sh)
            lput = jax.device_put(jnp.asarray(labels), sh)
            state = init_fn(key, gput, xput, sput)
            losses = []
            for _ in range(4):
                state, loss, _acc, ovf = train_step(state, key, gput, xput,
                                                    sput, lput)
                losses.append(float(loss))
                assert int(np.asarray(ovf).sum()) == 0
        results[Pn] = losses
    np.testing.assert_allclose(results[1], results[4], rtol=1e-5)
    assert results[1][-1] < results[1][0]


@pytest.mark.slow
def test_partitioned_multibatch_trainer_invariance():
    """The M-fused partitioned trainer trains, and its loss trajectory is
    device-count invariant (draws keyed by true global seed indices even
    under the interleaved (M, B/P) layout)."""
    from tch_geometric_tpu.parallel.dist_sampling import (
        make_partitioned_multibatch_trainer)
    x_np, y, edge_index = load_karate_graph()
    col_ptrs, row_indices, _perm = to_csc(np.asarray(edge_index), 34)
    labels = jnp.asarray(y)
    model = GraphSAGE(hidden=16, out=int(y.max()) + 1, num_layers=2)
    M, B = 2, 16
    results = {}
    for Pn in (1, 2):
        g = build_partitioned_graph(np.asarray(col_ptrs),
                                    np.asarray(row_indices), Pn)
        mesh = _mesh(Pn)
        init_fn, train_step = make_partitioned_multibatch_trainer(
            model, [4, 3], mesh, learning_rate=1e-2, capacity_factor=8.0)
        with mesh:
            data_sh = NamedSharding(mesh, P("data"))
            sh2 = NamedSharding(mesh, P(None, "data"))
            gput = jax.device_put(g, data_sh)
            xi = jax.device_put(
                jnp.asarray(build_interleaved_features(np.asarray(x_np),
                                                       Pn)), data_sh)
            seeds = jax.device_put(
                jnp.arange(M * B, dtype=jnp.int32).reshape(M, B) % 34, sh2)
            lab = jax.device_put(labels[jnp.arange(M * B).reshape(M, B)
                                        % 34], sh2)
            key = jax.random.key(0)
            state = init_fn(key, gput, xi, seeds)
            traj = []
            for s in range(8):
                state, losses, accs, ovf = train_step(
                    state, jax.random.fold_in(key, s), gput, xi, seeds,
                    lab)
                traj.append(np.asarray(losses))
            assert int(ovf) == 0
            results[Pn] = np.stack(traj)
    # same law AND same draws: trajectories match to psum rounding
    np.testing.assert_allclose(results[1], results[2], rtol=2e-4,
                               atol=2e-4)
    # it actually learns
    assert results[1][-1].mean() < results[1][0].mean()
