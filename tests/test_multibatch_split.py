"""split_sample_batches: the M-batch tree split is an exact re-indexing."""
import numpy as np
import jax
import jax.numpy as jnp

from tch_geometric_tpu.data.io import load_karate_graph
from tch_geometric_tpu.data.storage import to_csc
from tch_geometric_tpu.data.graph import make_graph
from tch_geometric_tpu.sampling.neighbor import (_sample_neighbors_impl,
                                                 split_sample_batches)


def test_split_is_exact_reindexing():
    x, y, edge_index = load_karate_graph()
    cp, ci, _ = to_csc(edge_index, x.shape[0])
    g = make_graph(np.asarray(cp), np.asarray(ci), num_src=x.shape[0],
                   num_dst=x.shape[0])
    M, B = 4, 8
    rng_np = np.random.default_rng(0)
    seeds = jnp.asarray(rng_np.integers(0, x.shape[0], M * B)
                        .astype(np.int32))
    zeros = jnp.zeros((M * B,), jnp.int32)
    fanouts = (3, 2)
    sample = _sample_neighbors_impl(jax.random.key(0), g, seeds, zeros,
                                    None, None, fanouts, False, None, 256)
    xt = jnp.asarray(rng_np.normal(size=(x.shape[0], 5)).astype(np.float32))
    xg = xt[jnp.clip(sample.nodes, 0, x.shape[0] - 1)]
    split, xs = split_sample_batches(sample, M, xg)

    nb, eb = sample.node_base, sample.edge_base
    nb_m, eb_m = split.node_base, split.edge_base
    nodes = np.asarray(sample.nodes)
    rows, cols = np.asarray(sample.rows), np.asarray(sample.cols)
    s_nodes = np.asarray(split.nodes)
    s_rows, s_cols = np.asarray(split.rows), np.asarray(split.cols)

    for m in range(M):
        # layer-sliced node ids match the big tree's m-th stripes
        for ell in range(len(nb) - 1):
            span = (nb[ell + 1] - nb[ell]) // M
            big = nodes[nb[ell] + m * span: nb[ell] + (m + 1) * span]
            assert np.array_equal(
                s_nodes[m, nb_m[ell]: nb_m[ell + 1]], big)
        # every split edge references the same (parent, child) node ids
        for ell, k in enumerate(fanouts):
            espan = (eb[ell + 1] - eb[ell]) // M
            big_sl = slice(eb[ell] + m * espan, eb[ell] + (m + 1) * espan)
            small_sl = slice(eb_m[ell], eb_m[ell + 1])
            sr, sc = s_rows[m, small_sl], s_cols[m, small_sl]
            # rebased slots stay inside their layers
            assert (sr >= nb_m[ell + 1]).all() and \
                   (sr < nb_m[ell + 2]).all()
            assert (sc >= nb_m[ell]).all() and (sc < nb_m[ell + 1]).all()
            assert np.array_equal(s_nodes[m, sr], nodes[rows[big_sl]])
            assert np.array_equal(s_nodes[m, sc], nodes[cols[big_sl]])
        # eptr / validity / features are pure stripes
        for ell in range(len(eb) - 1):
            espan = (eb[ell + 1] - eb[ell]) // M
            assert np.array_equal(
                np.asarray(split.eptr)[m, eb_m[ell]: eb_m[ell + 1]],
                np.asarray(sample.eptr)[eb[ell] + m * espan:
                                        eb[ell] + (m + 1) * espan])
    # features follow the node split
    for m in range(M):
        for ell in range(len(nb) - 1):
            span = (nb[ell + 1] - nb[ell]) // M
            assert np.array_equal(
                np.asarray(xs)[m, nb_m[ell]: nb_m[ell + 1]],
                np.asarray(xg)[nb[ell] + m * span: nb[ell] + (m + 1) * span])
