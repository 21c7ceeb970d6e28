"""VERDICT r4 item 6: no distributed entry point may silently drop
overflowed requests in its default configuration.

Every public distributed entry point defaults ``num_rounds=None`` which
:func:`~tch_geometric_tpu.parallel.dist_sampling.resolve_num_rounds`
resolves to 1 at P==1 (identity routing plan — rounds 1 and 2 trace to
byte-identical HLO) and 2 at P>1 (an overflowing frontier is retried).
Draws are keyed by request uid, so outputs are invariant to which round
carried a request (law equivalence) — pinned here behaviorally for the
neighbor sampler and structurally (signature introspection) for the whole
entry-point family.
"""
import inspect

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tch_geometric_tpu.parallel.dist_sampling import (
    build_partitioned_graph, dist_sample_neighbors, resolve_num_rounds)


def _mesh(n):
    return Mesh(np.array(jax.devices("cpu")[:n]), ("data",))


def test_resolve_semantics():
    assert resolve_num_rounds(None, 1) == 1
    assert resolve_num_rounds(None, 2) == 2
    assert resolve_num_rounds(None, 8) == 2
    assert resolve_num_rounds(1, 8) == 1     # explicit always wins
    assert resolve_num_rounds(3, 1) == 3


def test_every_entry_point_defaults_to_auto():
    """Signature sweep: every public distributed entry point with a
    ``num_rounds`` parameter defaults it to None (auto), so none can pin
    the drop-prone 1-round configuration as its default."""
    from tch_geometric_tpu.parallel import (dist_budget, dist_hetero,
                                            dist_hgt, dist_negative,
                                            dist_sampling, dist_walks,
                                            hgt_train, link_train,
                                            sharded_features)
    entry_points = [
        dist_sampling.dist_sample_neighbors,
        dist_sampling.make_partitioned_trainer,
        dist_sampling.make_partitioned_multibatch_trainer,
        dist_budget.dist_budget_sample,
        dist_budget.dist_budget_sample_hetero,
        dist_hetero.dist_hetero_neighbor_sample,
        dist_hgt.dist_hgt_sample,
        dist_negative.dist_negative_sample,
        dist_negative.dist_negative_sample_hetero,
        dist_walks.dist_random_walk,
        dist_walks.dist_tempo_random_walk,
        dist_walks.dist_biased_tempo_random_walk,
        hgt_train.make_partitioned_hgt_trainer,
        link_train.make_partitioned_link_trainer,
        sharded_features.make_sharded_feature_trainer,
    ]
    for f in entry_points:
        params = inspect.signature(f).parameters
        assert "num_rounds" in params, f.__qualname__
        assert params["num_rounds"].default is None, f.__qualname__


def test_default_recovers_overflow_one_round_drops(karate):
    """Behavioral pin on the neighbor sampler at P=2: with a capacity
    small enough that round 0 overflows, the auto default (2 rounds)
    carries every request (overflow 0) where explicit ``num_rounds=1``
    drops some — and the requests both configurations carry agree
    bit-exactly (uid-keyed draws: law equivalence)."""
    from tch_geometric_tpu.data.storage import to_csc
    _x, _y, edge_index = karate
    indptr, indices, _perm = to_csc(np.asarray(edge_index), 34)
    g = build_partitioned_graph(np.asarray(indptr), np.asarray(indices), 2)
    seeds = np.arange(32, dtype=np.int64)
    key = jax.random.key(5)
    # cf=0.55: per-owner capacity ~ 0.55 * L/2 < L/2 requests -> round 0
    # must overflow for at least one hop on the skewed karate frontier.
    out = {}
    for nr in (1, None, 2):
        s, ovf = dist_sample_neighbors(key, g, seeds, (4, 3), _mesh(2),
                                       capacity_factor=0.55, num_rounds=nr)
        out[nr] = (jax.tree.map(np.asarray, s), int(np.asarray(ovf).sum()))
    assert out[1][1] > 0, "capacity was meant to overflow round 0"
    assert out[None][1] == 0, "auto default must recover the overflow"
    # default == explicit 2 rounds, bit-exact
    for a, b in zip(jax.tree.leaves(out[None][0]),
                    jax.tree.leaves(out[2][0])):
        np.testing.assert_array_equal(a, b)
    # law equivalence: slots carried by BOTH configs agree bit-exactly
    s1, s2 = out[1][0], out[None][0]
    both = s1.node_valid & s2.node_valid
    np.testing.assert_array_equal(s1.nodes[both], s2.nodes[both])
    both_e = s1.edge_valid & s2.edge_valid
    np.testing.assert_array_equal(s1.eptr[both_e], s2.eptr[both_e])
