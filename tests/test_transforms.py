"""Transform-level API tests (the surface the reference's examples document
but never shipped — SURVEY §2.4) + node2vec training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tch_geometric_tpu as tgt
from tch_geometric_tpu.data.dataset import Data, HeteroData
from tch_geometric_tpu.transforms import (
    HGTSamplerTransform,
    NegativeSamplerTransform,
    NeighborSamplerTransform,
)

from validators import csc_has_edge


@pytest.fixture(scope="module")
def karate_data():
    import os
    return Data.from_npz(os.path.join(os.path.dirname(__file__),
                                      "fixtures", "karate.npz"))


@pytest.fixture(scope="module")
def hetero_data():
    import os
    return HeteroData.from_npz(os.path.join(os.path.dirname(__file__),
                                            "fixtures", "fakeheterodataset.npz"))


def test_neighbor_transform_homogeneous(karate_data):
    t = NeighborSamplerTransform(karate_data, [4, 3])
    batch = t(np.array([0, 1, 2, 3]), key=jax.random.key(0))
    assert batch.x.shape[0] == batch.n_id.shape[0]
    assert batch.edge_index.shape[0] == 2
    assert batch.y is not None and batch.y.shape[0] == batch.n_id.shape[0]
    # features really gathered: rows match original x at n_id
    np.testing.assert_array_equal(batch.x, karate_data.x[batch.n_id])
    # e_id maps back to original COO: endpoints must match
    src_g = batch.n_id[batch.edge_index[0]]
    dst_g = batch.n_id[batch.edge_index[1]]
    for s, d, e in zip(src_g, dst_g, batch.e_id):
        assert karate_data.edge_index[0, e] == s
        assert karate_data.edge_index[1, e] == d


def test_neighbor_transform_edge_attrs(karate_data):
    d = Data(x=karate_data.x, edge_index=karate_data.edge_index,
             y=karate_data.y,
             edge_attrs={"w": np.arange(karate_data.num_edges, dtype=np.float64)})
    t = NeighborSamplerTransform(d, [3, 2])
    batch = t(np.array([5, 6]), key=jax.random.key(1))
    # gathered edge attr equals the original edge id (identity attr)
    np.testing.assert_array_equal(batch.edge_attrs["w"], batch.e_id)


def test_neighbor_transform_hetero(hetero_data):
    t = NeighborSamplerTransform(hetero_data, [3, 2])
    batch = t({"v0": np.array([0, 1, 2])}, key=jax.random.key(2))
    assert set(batch.x.keys()) == set(hetero_data.x.keys())
    for r, ei in batch.edge_index.items():
        assert ei.shape[0] == 2


def test_hgt_transform(hetero_data):
    t = HGTSamplerTransform(hetero_data, [8, 6])
    batch = t({"v0": np.arange(6)}, key=jax.random.key(3))
    assert batch.x["v0"].shape[0] >= 6
    # temporal variant
    for e in hetero_data.edge_types:
        hetero_data.edge_attrs[e] = {
            "timestamps": np.random.default_rng(0).integers(
                0, 5, hetero_data.edge_index[e].shape[1]).astype(np.int64)}
    tt = HGTSamplerTransform(hetero_data, [8, 6], temporal=True)
    batch2 = tt({"v0": np.arange(6)},
                {"v0": np.zeros(6, dtype=np.int64)}, (0, 5),
                key=jax.random.key(4))
    assert batch2.node_timestamps


def test_negative_transform(karate_data):
    t = NegativeSamplerTransform(karate_data, 5, 5)
    batch = t(np.arange(34), key=jax.random.key(5))
    edge_set = set(map(tuple, karate_data.edge_index.T.tolist()))
    src = batch.n_id[batch.edge_index[0]]
    dst = batch.n_id[batch.edge_index[1]]
    for s, d in zip(src, dst):
        assert (s, d) not in edge_set


def test_negative_transform_hetero(hetero_data):
    t = NegativeSamplerTransform(hetero_data, 3, 5)
    batch = t({"v0": np.arange(5)}, key=jax.random.key(6))
    assert "v0" in batch.n_id


def test_node2vec_trains(karate_data):
    from tch_geometric_tpu.models.node2vec import Node2Vec, make_node2vec_trainer
    g = karate_data.csr()
    model = Node2Vec(num_nodes=34, embedding_dim=16, context_size=4,
                     num_negative=2)
    init_fn, train_step = make_node2vec_trainer(model, g, walk_length=8,
                                                learning_rate=0.05)
    key = jax.random.key(0)
    starts = jnp.tile(jnp.arange(34), 2)
    state = init_fn(key, starts)
    _, loss0 = train_step(state, key, starts)
    for _ in range(25):
        state, loss = train_step(state, key, starts)
    assert float(loss) < float(loss0), (float(loss0), float(loss))
    emb = model.apply(state.params, jnp.arange(34))
    assert emb.shape == (34, 16)


def test_seed_loader():
    from tch_geometric_tpu.loader import SeedLoader
    seeds = np.arange(37)
    dl = SeedLoader(seeds, 8, shuffle=True, drop_last=True, seed=1)
    batches = list(dl)
    assert len(batches) == 4 and all(len(b) == 8 for b in batches)
    seen = np.concatenate(batches)
    assert len(set(seen.tolist())) == 32  # distinct seeds within epoch
    dl2 = SeedLoader(seeds, 8, drop_last=False, pad_last=True)
    batches = list(dl2)
    assert len(batches) == 5 and len(batches[-1]) == 8


@pytest.mark.slow
def test_hgt_trainer_e2e(hetero_data):
    """BASELINE config 4: hetero HGT sampling + relation-typed attention
    trains on fakehetero v0 labels."""
    import jax.numpy as jnp
    from tch_geometric_tpu.models import HGT
    from tch_geometric_tpu.parallel import make_hgt_trainer
    from tch_geometric_tpu.data.graph import make_graph
    from tch_geometric_tpu.data import to_csc
    from tch_geometric_tpu.utils.types import rel_key

    data = hetero_data
    node_counts = data.node_counts
    graphs = {}
    for e in data.edge_types:
        r = rel_key(e)
        cp, ci, _ = to_csc(data.edge_index[e], data.size(e))
        graphs[r] = make_graph(cp, ci, num_src=node_counts[e[0]],
                               num_dst=node_counts[e[2]])
    x_tables = {t: jnp.asarray(v) for t, v in data.x.items()}
    labels_all = jnp.asarray(data.y["v0"])
    n_classes = int(labels_all.max()) + 1
    rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in data.edge_types))
    model = HGT(hidden=32, out=n_classes, num_layers=2,
                node_types=data.node_types, rel_specs=rel_specs,
                out_type="v0")
    num_samples = {t: [16, 12] for t in data.node_types}
    init_fn, train_step = make_hgt_trainer(
        model, graphs, data.edge_types, num_samples, 2, node_counts,
        x_tables, seed_type="v0", learning_rate=3e-3)
    key = jax.random.key(0)
    seeds = jnp.arange(32)
    state = init_fn(key, seeds)
    _, loss0, _ = train_step(state, key, seeds, labels_all[seeds])
    for _ in range(30):
        state, loss, acc = train_step(state, key, seeds, labels_all[seeds])
    assert float(loss) < float(loss0), (float(loss0), float(loss))
    assert float(acc) > 0.3, float(acc)
