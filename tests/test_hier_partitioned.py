"""Hierarchical (multislice) partitioned trainer — VERDICT r4 item 1.

``hier=(slice_axis, chip_axis)`` runs the partitioned trainers over a
2-axis mesh: topology slice-replicated (sampling exchanges ride the ICI
``chip_axis`` only), feature table fully partitioned over all S*C devices
and fetched via one slice-axis ``all_gather`` + an intra-slice routed
exchange (``dist_sampling._hier_feature_gather``).  These tests pin the
plan-equivalence laws on the virtual CPU mesh:

* the hier feature fetch returns bit-identical rows to the flat
  ``halo_gather`` (same-row gathers, different route);
* trainer loss trajectories match the flat plan (and P=1) to psum
  rounding, overflow 0.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tch_geometric_tpu.data.io import load_karate_graph
from tch_geometric_tpu.data.storage import to_csc
from tch_geometric_tpu.models import GraphSAGE
from tch_geometric_tpu.parallel.dist_sampling import (
    _hier_feature_gather, build_partitioned_graph, make_partitioned_trainer,
    make_partitioned_multibatch_trainer)
from tch_geometric_tpu.parallel.sharded_features import (
    build_interleaved_features, halo_gather)


def _flat_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


def _hier_mesh(s, c):
    return Mesh(np.array(jax.devices()[: s * c]).reshape(s, c),
                ("dcn", "ici"))


def test_hier_feature_gather_bit_identity():
    """Rows fetched through the slice-gathered table == flat halo rows,
    bit-exact, overflow 0 on both plans."""
    S, C = 2, 4
    Pt = S * C
    rng = np.random.default_rng(0)
    N, F, L = 203, 16, 64
    x = rng.standard_normal((N, F)).astype(np.float32)
    xi = jnp.asarray(build_interleaved_features(x, Pt))
    ids = rng.integers(0, N, (Pt, L)).astype(np.int32)
    valid = rng.random((Pt, L)) < 0.9
    cap = L  # generous: no overflow on either plan

    mesh_f = _flat_mesh(Pt)

    @functools.partial(shard_map, mesh=mesh_f,
                       in_specs=(P("data"), P("data"), P("data")),
                       out_specs=(P("data"), P("data")))
    def flat(x_shard, ids_l, valid_l):
        rows, ovf = halo_gather(x_shard, ids_l[0], axis="data",
                                num_parts=Pt, capacity=cap,
                                valid=valid_l[0])
        return rows[None], ovf[None][None]

    with mesh_f:
        rows_f, ovf_f = flat(xi, jnp.asarray(ids), jnp.asarray(valid))
        rows_f, ovf_f = np.asarray(rows_f), np.asarray(ovf_f)

    mesh_h = _hier_mesh(S, C)
    spec = P(("dcn", "ici"))

    @functools.partial(shard_map, mesh=mesh_h,
                       in_specs=(spec, spec, spec),
                       out_specs=(spec, spec))
    def hier(x_shard, ids_l, valid_l):
        rows, ovf = _hier_feature_gather(
            x_shard, ids_l[0], ax_slice="dcn", ax_chip="ici",
            num_slices=S, chips_per_slice=C, capacity=cap,
            valid=valid_l[0])
        return rows[None], ovf[None][None]

    with mesh_h:
        rows_h, ovf_h = hier(xi, jnp.asarray(ids), jnp.asarray(valid))
        rows_h, ovf_h = np.asarray(rows_h), np.asarray(ovf_h)

    assert int(ovf_f.sum()) == 0 and int(ovf_h.sum()) == 0
    np.testing.assert_array_equal(rows_f, rows_h)
    # spot-check against the plain table
    mask = valid.reshape(-1)
    expect = x[ids.reshape(-1)[mask]]
    np.testing.assert_array_equal(
        rows_h.reshape(-1, F)[mask], expect)


def _train_losses(trainer_kind, mesh, graph_parts, *, hier=None,
                  exchange_dtype=None, steps=4):
    x_np, y, edge_index = load_karate_graph()
    col_ptrs, row_indices, _perm = to_csc(np.asarray(edge_index), 34)
    total = int(np.prod(list(mesh.shape.values())))
    g = build_partitioned_graph(np.asarray(col_ptrs),
                                np.asarray(row_indices), graph_parts)
    xi = jnp.asarray(build_interleaved_features(np.asarray(x_np), total))
    model = GraphSAGE(hidden=16, out=int(y.max()) + 1, num_layers=2)
    kwargs = dict(learning_rate=1e-2, capacity_factor=8.0,
                  exchange_dtype=exchange_dtype)
    if hier is not None:
        kwargs["hier"] = hier
        data_spec = P(hier)
        graph_spec = P(hier[1])
    else:
        data_spec = P("data")
        graph_spec = data_spec
    make = (make_partitioned_trainer if trainer_kind == "single"
            else make_partitioned_multibatch_trainer)
    made = make(model, [3, 2], mesh, **kwargs)
    init_fn, train_step = made[0], made[1]
    if trainer_kind == "single":
        seeds = jnp.arange(16, dtype=jnp.int32)
        labels = jnp.asarray(np.asarray(y)[:16])
    else:
        seeds = jnp.arange(16, dtype=jnp.int32).reshape(2, 8)
        labels = jnp.asarray(np.asarray(y)[:16]).reshape(2, 8)
        data_spec = P(None, *data_spec)
    key = jax.random.key(0)
    losses = []
    with mesh:
        gput = jax.device_put(g, NamedSharding(mesh, graph_spec))
        xput = jax.device_put(xi, NamedSharding(
            mesh, P(hier) if hier is not None else P("data")))
        sput = jax.device_put(seeds, NamedSharding(mesh, data_spec))
        lput = jax.device_put(labels, NamedSharding(mesh, data_spec))
        state = init_fn(key, gput, xput, sput)
        for _ in range(steps):
            out = train_step(state, key, gput, xput, sput, lput)
            state, loss, _acc, ovf = out[0], out[1], out[2], out[3]
            losses.append(np.asarray(loss).reshape(-1))
            assert int(np.asarray(ovf).sum()) == 0
    return np.concatenate(losses)


@pytest.mark.slow
def test_hier_trainer_matches_flat_plan():
    """Single-batch partitioned trainer: flat P=1 == flat P=8 == hier 2x4
    == hier 4x2 loss trajectories (psum rounding tolerance)."""
    ref = _train_losses("single", _flat_mesh(1), 1)
    flat8 = _train_losses("single", _flat_mesh(8), 8)
    hier24 = _train_losses("single", _hier_mesh(2, 4), 4,
                           hier=("dcn", "ici"))
    hier42 = _train_losses("single", _hier_mesh(4, 2), 2,
                           hier=("dcn", "ici"))
    np.testing.assert_allclose(ref, flat8, rtol=1e-5)
    np.testing.assert_allclose(ref, hier24, rtol=1e-5)
    np.testing.assert_allclose(ref, hier42, rtol=1e-5)
    assert ref[-1] < ref[0]


@pytest.mark.slow
def test_hier_multibatch_trainer_matches_flat_plan():
    """M-fused multibatch partitioned trainer under hier: loss
    trajectories match flat P=1 and flat P=8 (bf16 exchange exercised on
    the hier plan — the multislice production config)."""
    ref = _train_losses("multi", _flat_mesh(1), 1, steps=3)
    flat8 = _train_losses("multi", _flat_mesh(8), 8, steps=3)
    hier24 = _train_losses("multi", _hier_mesh(2, 4), 4,
                           hier=("dcn", "ici"), steps=3)
    np.testing.assert_allclose(ref, flat8, rtol=1e-5)
    np.testing.assert_allclose(ref, hier24, rtol=1e-5)
    # bf16 exchange on hier: P-invariant vs bf16 at P=1
    ref_bf = _train_losses("multi", _flat_mesh(1), 1,
                           exchange_dtype=jnp.bfloat16, steps=3)
    hier_bf = _train_losses("multi", _hier_mesh(2, 4), 4,
                            hier=("dcn", "ici"),
                            exchange_dtype=jnp.bfloat16, steps=3)
    np.testing.assert_allclose(ref_bf, hier_bf, rtol=1e-5)
