"""Message passing ops, models, and the end-to-end sampled training slice
(BASELINE config 1: karate [4,3] + 2-layer GraphSAGE mean-agg)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tch_geometric_tpu as tgt
from tch_geometric_tpu.data import csc_graph_from_coo
from tch_geometric_tpu.models import HGT, GraphSAGE
from tch_geometric_tpu.ops import csc_edge_cumsum, csc_sort_edges, sddmm, spmm
from tch_geometric_tpu.parallel import make_sage_trainer
from tch_geometric_tpu.sampling.neighbor import sample_neighbors
from tch_geometric_tpu.utils.types import rel_key


def test_spmm_matches_dense(karate):
    x_feat, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(34, 16)).astype(np.float32))
    # dense reference: A^T x with A[src, dst] adjacency (in-neighbor agg)
    A = np.zeros((34, 34), np.float32)
    for s, d in edge_index.T:
        A[d, s] += 1.0
    want_sum = A @ np.asarray(x)
    got_sum = np.asarray(spmm(g, x, agg="sum"))
    np.testing.assert_allclose(got_sum, want_sum, rtol=1e-5, atol=1e-5)
    deg = A.sum(1, keepdims=True)
    want_mean = want_sum / np.maximum(deg, 1)
    got_mean = np.asarray(spmm(g, x, agg="mean"))
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-5, atol=1e-5)


def test_spmm_weighted(karate):
    _x, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    x = jnp.ones((34, 4), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).uniform(size=g.num_edges).astype(np.float32))
    got = np.asarray(spmm(g, x, agg="sum", edge_weight=w))
    # each dst row sums its in-edge weights
    want = np.zeros((34,), np.float32)
    cp = np.asarray(g.indptr)
    wn = np.asarray(w)
    for d in range(34):
        want[d] = wn[cp[d]:cp[d + 1]].sum()
    np.testing.assert_allclose(got[:, 0], want, rtol=1e-5)


def test_sddmm(karate):
    _x, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    rng_np = np.random.default_rng(2)
    xd = jnp.asarray(rng_np.normal(size=(34, 8)).astype(np.float32))
    xs = jnp.asarray(rng_np.normal(size=(34, 8)).astype(np.float32))
    s = np.asarray(sddmm(g, xd, xs))
    cp, ind = np.asarray(g.indptr), np.asarray(g.indices)
    for d in range(34):
        for e in range(cp[d], cp[d + 1]):
            want = float(np.asarray(xd)[d] @ np.asarray(xs)[ind[e]])
            assert abs(s[e] - want) < 1e-4


def test_edge_transforms_exact():
    # transform.rs:68-97 exact vectors
    col_ptrs = [0, 0, 0, 0, 3, 5, 5, 5, 7, 9]
    perm = [0, 1, 2, 3, 4, 5, 6, 7]
    w = [9.0, 5.0, 8.0, 9.0, 10.0, 11.0, 1.0, 1.5]
    got = csc_sort_edges(col_ptrs, perm, w, False)
    assert got.tolist() == [1, 2, 0, 3, 4, 6, 5, 7]
    got2 = csc_edge_cumsum(col_ptrs, w)
    np.testing.assert_allclose(got2, [9.0, 14.0, 22.0, 9.0, 19.0, 11.0, 12.0, 1.5])


def test_sage_tree_forward(karate):
    x_feat, y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    seeds = np.array([0, 1, 4, 5, 8, 11, 20, 33])
    sample = sample_neighbors(g, seeds, [4, 3], key=jax.random.key(0),
                              sampler=tgt.UniformEdgeSampler(True))
    model = GraphSAGE(hidden=16, out=4, num_layers=2)
    x = jnp.asarray(x_feat)[np.asarray(sample.nodes)]
    params = model.init(jax.random.key(1), sample, x,
                        method=GraphSAGE.tree_forward)
    logits = model.apply(params, sample, x, method=GraphSAGE.tree_forward)
    assert logits.shape == (8, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_sage_full_graph(karate):
    x_feat, y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    model = GraphSAGE(hidden=16, out=4, num_layers=2)
    x = jnp.asarray(x_feat)
    params = model.init(jax.random.key(0), x, g)
    out = model.apply(params, x, g)
    assert out.shape == (34, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_sage_train_karate_e2e(karate):
    """M1 milestone: sampled GraphSAGE trains to high accuracy on karate."""
    x_feat, y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    x = jnp.asarray(x_feat)
    labels = jnp.asarray(y)
    seeds = jnp.arange(34)

    model = GraphSAGE(hidden=32, out=int(y.max()) + 1, num_layers=2)
    init_fn, train_step, eval_step = make_sage_trainer(
        model, [4, 3], learning_rate=5e-3)
    key = jax.random.key(0)
    state = init_fn(key, g, x, seeds)
    for i in range(60):
        state, loss, acc = train_step(state, key, g, x, seeds, labels[seeds])
    loss, acc = eval_step(state, key, g, x, seeds, labels[seeds])
    assert float(acc) >= 0.9, (float(loss), float(acc))


def test_hgt_model_forward(fake_hetero):
    xs, coo = fake_hetero
    from tch_geometric_tpu.data import to_csc
    from tch_geometric_tpu.sampling.hetero_neighbor import sample_hetero_neighbors
    from tch_geometric_tpu.data.graph import make_graph
    node_counts = {t: x.shape[0] for t, x in xs.items()}
    graphs = {}
    for e, ei in coo.items():
        r = rel_key(e)
        cp, ci, _ = to_csc(ei, (node_counts[e[0]], node_counts[e[2]]))
        graphs[r] = make_graph(cp, ci, num_src=node_counts[e[0]],
                               num_dst=node_counts[e[2]])
    edge_types = sorted(coo)
    inputs = {t: jnp.arange(4) for t in xs}
    nn_cfg = {rel_key(e): [3, 2] for e in edge_types}
    sample = sample_hetero_neighbors(graphs, edge_types, inputs, nn_cfg, 2,
                                     key=jax.random.key(0))
    feats = {t: jnp.asarray(xs[t])[np.asarray(
        jnp.clip(sample.nodes[t], 0, node_counts[t] - 1))] for t in xs}
    edges = {r: (sample.rows[r], sample.cols[r], sample.edge_valid[r])
             for r in sample.rows}
    rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in edge_types))
    model = HGT(hidden=16, out=3, num_layers=2, node_types=sorted(xs),
                rel_specs=rel_specs, out_type="v0")
    params = model.init(jax.random.key(1), feats, edges)
    out = model.apply(params, feats, edges)
    assert out.shape == (feats["v0"].shape[0], 3)
    assert np.isfinite(np.asarray(out)).all()


def test_spmm_blocked_exact(fake_dataset):
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked, spmm_blocked
    import jax.numpy as jnp
    _x, _y, ei = fake_dataset
    g = csc_graph_from_coo(ei, 1144)
    b = build_blocked(np.asarray(g.indptr), np.asarray(g.indices),
                      rows_per_block=64)
    x = jnp.asarray(np.random.default_rng(0).integers(-4, 5, (1144, 32))
                    .astype(np.float32))
    want = np.asarray(spmm(g, x, agg="sum"))
    got = np.asarray(spmm_blocked(b, x, agg="sum", compute_dtype=jnp.float32))
    assert (got == want).all()
    gotm = np.asarray(spmm_blocked(b, x, agg="mean", compute_dtype=jnp.float32))
    wantm = np.asarray(spmm(g, x, agg="mean"))
    np.testing.assert_allclose(gotm, wantm, rtol=1e-5, atol=1e-5)


def test_gcn_forward(karate):
    from tch_geometric_tpu.models import GCN
    x_feat, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    model = GCN(hidden=16, out=4, num_layers=2)
    params = model.init(jax.random.key(0), jnp.asarray(x_feat), g)
    out = model.apply(params, jnp.asarray(x_feat), g)
    assert out.shape == (34, 4) and np.isfinite(np.asarray(out)).all()


def test_gat_forward(karate):
    from tch_geometric_tpu.models import GAT
    x_feat, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    model = GAT(hidden=16, out=4, num_layers=2, heads=4)
    params = model.init(jax.random.key(0), jnp.asarray(x_feat), g)
    out = model.apply(params, jnp.asarray(x_feat), g)
    assert out.shape == (34, 4) and np.isfinite(np.asarray(out)).all()


def test_gat_attention_sums_to_one(karate):
    # attention over each dst's in-edges must sum to 1
    from tch_geometric_tpu.ops.segment import csr_row_ids, segment_softmax
    _x, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    rows = csr_row_ids(g.indptr, g.num_edges)
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(g.num_edges, 2)).astype(np.float32))
    att = segment_softmax(logits, rows, 34)
    sums = np.asarray(jax.ops.segment_sum(att, rows, 34))
    deg = np.asarray(g.degree(jnp.arange(34)))
    np.testing.assert_allclose(sums[deg > 0], 1.0, rtol=1e-4)


def test_spmm_pallas_interpret(fake_dataset):
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked
    from tch_geometric_tpu.ops.spmm_pallas import spmm_blocked_pallas
    _x, _y, ei = fake_dataset
    g = csc_graph_from_coo(ei, 1144)
    b = build_blocked(np.asarray(g.indptr), np.asarray(g.indices),
                      rows_per_block=64, chunk_edges=256)
    x = jnp.asarray(np.random.default_rng(0).integers(-4, 5, (1144, 32))
                    .astype(np.float32))
    want = np.asarray(spmm(g, x, agg="sum"))
    got = np.asarray(spmm_blocked_pallas(b, x, agg="sum",
                                         compute_dtype=jnp.float32,
                                         interpret=True))
    assert (got == want).all()


def test_spmm_q8_interpret(fake_dataset):
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked
    from tch_geometric_tpu.ops.spmm_pallas import (
        quantize_rows, spmm_blocked_pallas_q8)
    _x, _y, ei = fake_dataset
    g = csc_graph_from_coo(ei, 1144)
    b = build_blocked(np.asarray(g.indptr), np.asarray(g.indices),
                      rows_per_block=64, chunk_edges=256)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1144, 32))
                    .astype(np.float32))
    q, s = quantize_rows(x)
    want = np.asarray(spmm(g, x, agg="sum"))
    got = np.asarray(spmm_blocked_pallas_q8(b, q, s, agg="sum",
                                            interpret=True))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, rel


def test_multibatch_trainer_matches_sequential(karate):
    """One fused M=3 multibatch step == 3 sequential single-batch steps."""
    import jax
    import jax.numpy as jnp
    from tch_geometric_tpu.data import csc_graph_from_coo
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.parallel import (
        make_multibatch_sage_trainer, make_sage_trainer)

    x, y, edge_index = karate
    graph = csc_graph_from_coo(edge_index, 34)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    model = GraphSAGE(hidden=16, out=int(y.max()) + 1, num_layers=2)
    key = jax.random.key(42)
    M, B = 3, 8
    seeds = jnp.arange(M * B, dtype=jnp.int32).reshape(M, B) % 34
    labels = yj[seeds]

    init1, step1, _ = make_sage_trainer(model, [4, 3], learning_rate=1e-2)
    initM, stepM = make_multibatch_sage_trainer(model, [4, 3],
                                                learning_rate=1e-2)
    s1 = init1(key, graph, xj, seeds[0])
    sM = initM(key, graph, xj, seeds[0])
    # same init (identical model/key): start from the single-batch state
    sM = sM._replace(params=s1.params, opt_state=s1.opt_state, step=s1.step)

    for m in range(M):
        s1, loss1, _ = step1(s1, key, graph, xj, seeds[m], labels[m])
    sM, lossesM, _ = stepM(sM, key, graph, xj, seeds, labels)

    assert int(s1.step) == int(sM.step) == M
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flatM = jax.tree_util.tree_leaves(sM.params)
    for a, b in zip(flat1, flatM):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(lossesM[-1]), float(loss1), rtol=1e-5)


def test_tree_forward_seed_logits_ignore_invalid_slots(karate):
    """The trainers gather features WITHOUT masking invalid slots
    (parallel/train.py): every path from a non-seed slot to a seed logit
    passes tree_neighbor_mean's child mask, so garbage features in invalid
    slots must not change seed outputs."""
    from tch_geometric_tpu.sampling.neighbor import sample_neighbors

    x_feat, y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    seeds = np.array([0, 1, 4, 5, 8, 11, 20, 33])
    # without replacement: degree<4 nodes produce invalid slots
    sample = sample_neighbors(g, seeds, [4, 3], key=jax.random.key(0),
                              sampler=tgt.UniformEdgeSampler(False))
    valid = np.asarray(sample.node_valid)
    assert (~valid).any(), "fixture must produce invalid slots"

    xj = jnp.asarray(x_feat)
    base = xj[jnp.clip(sample.nodes, 0, 33)]
    garbage = base + jnp.where(sample.node_valid[:, None], 0.0, 1e6)
    masked = jnp.where(sample.node_valid[:, None], base, 0.0)

    model = GraphSAGE(hidden=16, out=4, num_layers=2)
    params = model.init(jax.random.key(1), sample, masked,
                        method=GraphSAGE.tree_forward)
    out_masked = model.apply(params, sample, masked,
                             method=GraphSAGE.tree_forward)
    out_garbage = model.apply(params, sample, garbage,
                              method=GraphSAGE.tree_forward)
    np.testing.assert_allclose(np.asarray(out_masked),
                               np.asarray(out_garbage), rtol=1e-5, atol=1e-5)


def test_spmm_segmented_matches_blocked(fake_dataset):
    """SegmentedBlockedCsr scan path == BlockedCsr path == dense, for
    segment counts that do and don't divide the block count."""
    from tch_geometric_tpu.ops import (
        build_blocked, build_blocked_segmented, spmm_blocked,
        spmm_blocked_segmented)

    x, y, edge_index = fake_dataset
    n = int(edge_index.max()) + 1
    ei = np.asarray(edge_index)
    order = np.argsort(ei[1], kind="stable")
    dst, src = ei[1][order], ei[0][order]
    indptr = np.searchsorted(dst, np.arange(n + 1)).astype(np.int32)

    xj = jnp.asarray(np.asarray(x, dtype=np.float32)[:n])
    b = build_blocked(indptr, src.astype(np.int32), rows_per_block=16)
    ref = np.asarray(spmm_blocked(b, xj, agg="mean",
                                  compute_dtype=jnp.float32))

    num_blocks = b.num_blocks
    for S in (1, 3, num_blocks, num_blocks + 5):
        seg = build_blocked_segmented(indptr, src.astype(np.int32),
                                      num_segments=S, rows_per_block=16)
        out = np.asarray(spmm_blocked_segmented(
            seg, xj, agg="mean", compute_dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"S={S}")


def test_sage_blocked_forward_matches_spmm(karate):
    """blocked_forward (segmented and not) == the SparseGraph full-graph
    forward with identical weights."""
    from tch_geometric_tpu.ops import build_blocked, build_blocked_segmented

    x_feat, y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    xj = jnp.asarray(x_feat)
    model = GraphSAGE(hidden=16, out=4, num_layers=2)
    params = model.init(jax.random.key(0), xj, g)
    ref = np.asarray(model.apply(params, xj, g))

    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    b = build_blocked(indptr, indices, rows_per_block=8)
    seg = build_blocked_segmented(indptr, indices, num_segments=3,
                                  rows_per_block=8)
    for layout in (b, seg):
        out = np.asarray(model.apply(params, xj, layout, jnp.float32,
                                     method=GraphSAGE.blocked_forward))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        # default bf16 compute: same result at bf16 tolerance
        out16 = np.asarray(model.apply(params, xj, layout,
                                       method=GraphSAGE.blocked_forward))
        np.testing.assert_allclose(out16, ref, rtol=3e-2, atol=3e-2)


def test_gat_gcn_sampled_training_karate(karate):
    """GAT and GCN train through the generic sampled-tree trainer
    (make_gnn_trainer) to high accuracy on karate — the same e2e milestone
    as GraphSAGE, for the other model families."""
    from tch_geometric_tpu.models import GAT, GCN
    from tch_geometric_tpu.parallel import make_gnn_trainer

    x_feat, y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    x = jnp.asarray(x_feat)
    labels = jnp.asarray(y)
    seeds = jnp.arange(34)
    for model in (GAT(hidden=16, out=int(y.max()) + 1, num_layers=2, heads=4,
                      dropout=0.1),
                  GCN(hidden=32, out=int(y.max()) + 1, num_layers=2)):
        init_fn, train_step, eval_step = make_gnn_trainer(
            model, [4, 3], learning_rate=1e-2)
        key = jax.random.key(0)
        state = init_fn(key, g, x, seeds)
        for _ in range(80):
            state, loss, acc = train_step(state, key, g, x, seeds,
                                          labels[seeds])
        loss, acc = eval_step(state, key, g, x, seeds, labels[seeds])
        name = type(model).__name__
        assert float(acc) >= 0.85, (name, float(loss), float(acc))
        assert np.isfinite(float(loss)), name


def test_gin_forward_and_sampled_training(karate):
    """GIN: full-graph forward matches a numpy (1+eps)·h + Σ_children MLP
    composition at the aggregation level, and the model trains through the
    generic sampled-tree trainer like the other families."""
    from tch_geometric_tpu.models import GIN
    from tch_geometric_tpu.models.gnn import GINConv
    from tch_geometric_tpu.parallel import make_gnn_trainer

    x_feat, y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    x = jnp.asarray(x_feat)

    # aggregation check: one conv, full graph, vs numpy sum-agg
    conv = GINConv(8, hidden=8)
    params = conv.init(jax.random.key(0), x, g)
    out = np.asarray(conv.apply(params, x, g))
    indptr = np.asarray(g.indptr)
    indices = np.asarray(g.indices)
    xn = np.asarray(x)
    agg = np.zeros_like(xn)
    for v in range(34):
        nb = indices[indptr[v]: indptr[v + 1]]
        agg[v] = xn[nb].sum(axis=0)
    eps = float(params["params"]["eps"])
    pre = (1.0 + eps) * xn + agg
    d0 = params["params"]["Dense_0"]
    d1 = params["params"]["Dense_1"]
    ref = np.maximum(pre @ np.asarray(d0["kernel"]) + np.asarray(d0["bias"]),
                     0.0) @ np.asarray(d1["kernel"]) + np.asarray(d1["bias"])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # e2e sampled training
    labels = jnp.asarray(y)
    seeds = jnp.arange(34)
    model = GIN(hidden=32, out=int(y.max()) + 1, num_layers=2)
    init_fn, train_step, eval_step = make_gnn_trainer(
        model, [4, 3], learning_rate=1e-2)
    key = jax.random.key(0)
    state = init_fn(key, g, x, seeds)
    for _ in range(80):
        state, loss, acc = train_step(state, key, g, x, seeds, labels[seeds])
    loss, acc = eval_step(state, key, g, x, seeds, labels[seeds])
    assert float(acc) >= 0.85, (float(loss), float(acc))


def test_gat_tree_attention_matches_numpy(karate):
    """tree_attention (models/gnn.py) against a direct numpy masked-softmax
    computation on one sampled tree layer."""
    from tch_geometric_tpu.models.gnn import GATConv
    from tch_geometric_tpu.sampling.neighbor import _sample_neighbors_impl

    x_feat, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    seeds = jnp.arange(8, dtype=jnp.int32)
    zeros = jnp.zeros((8,), jnp.int32)
    sample = _sample_neighbors_impl(jax.random.key(3), g, seeds, zeros,
                                    None, None, (4,), True, None, 256)
    H, d = 2, 3
    rng = np.random.default_rng(0)
    h = rng.normal(size=(int(sample.node_base[2]), H * d)).astype(np.float32)
    a_src = rng.normal(size=(H, d)).astype(np.float32)
    a_dst = rng.normal(size=(H, d)).astype(np.float32)

    out = np.asarray(GATConv.tree_attention(
        jnp.asarray(h), sample.node_valid, sample, 0,
        jnp.asarray(a_src), jnp.asarray(a_dst)))

    k = sample.fanouts[0]
    B = int(sample.node_base[1])
    hr = h.reshape(-1, H, d)
    valid = np.asarray(sample.node_valid)
    expect = np.zeros((B, H * d), np.float32)
    for i in range(B):
        for hh in range(H):
            ch = np.arange(B + i * k, B + (i + 1) * k)
            m = valid[ch]
            lo = (hr[ch, hh] * a_src[hh]).sum(-1) + (hr[i, hh] * a_dst[hh]).sum(-1)
            lo = np.where(lo > 0, lo, 0.2 * lo)       # leaky_relu
            lo = np.where(m, lo, -1e9)
            e = np.exp(lo - lo.max())
            att = np.where(m, e / e.sum(), 0.0)
            expect[i, hh * d:(hh + 1) * d] = (att[:, None] * hr[ch, hh]).sum(0)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_link_prediction_trainer(karate):
    """Link-prediction e2e: encoder + dot decoder + on-device negative
    rejection (negative_sampling.rs law) in one jitted step; ranking
    accuracy (pos > neg) must rise well above chance on karate."""
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.parallel.link_train import make_link_trainer

    x_feat, _y, edge_index = karate
    g = csc_graph_from_coo(edge_index, 34)
    x = jnp.asarray(x_feat)
    ei = np.asarray(edge_index)
    rng_np = np.random.default_rng(0)
    pick = rng_np.choice(ei.shape[1], 64)
    src = jnp.asarray(ei[0, pick].astype(np.int32))
    dst = jnp.asarray(ei[1, pick].astype(np.int32))

    model = GraphSAGE(hidden=32, out=16, num_layers=2)
    init_fn, train_step, eval_step = make_link_trainer(
        model, [4, 3], num_neg=4, try_count=8, learning_rate=1e-2)
    key = jax.random.key(0)
    state = init_fn(key, g, x, src, dst)
    loss0, auc0 = eval_step(state, key, g, x, src, dst)
    for _ in range(60):
        state, loss, auc = train_step(state, key, g, x, src, dst)
    loss1, auc1 = eval_step(state, key, g, x, src, dst)
    assert float(loss1) < float(loss0)
    assert float(auc1) >= 0.85, (float(auc0), float(auc1))


def test_hgt_stacked_rels_transplant_equivalence(fake_hetero):
    """stacked_rels=True (scan-over-relations HGTConv, VERDICT r4 item 4):
    transplanting the unrolled model's per-relation parameters into the
    stacked (R, ...) layout produces IDENTICAL logits — the scan body is
    the same math, only the parameter layout and program shape change."""
    xs, coo = fake_hetero
    from tch_geometric_tpu.data import to_csc
    from tch_geometric_tpu.data.graph import make_graph
    from tch_geometric_tpu.sampling.hetero_neighbor import (
        sample_hetero_neighbors)
    node_counts = {t: x.shape[0] for t, x in xs.items()}
    graphs = {}
    for e, ei in coo.items():
        r = rel_key(e)
        cp, ci, _ = to_csc(ei, (node_counts[e[0]], node_counts[e[2]]))
        graphs[r] = make_graph(cp, ci, num_src=node_counts[e[0]],
                               num_dst=node_counts[e[2]])
    edge_types = sorted(coo)
    inputs = {t: jnp.arange(4) for t in xs}
    nn_cfg = {rel_key(e): [3, 2] for e in edge_types}
    sample = sample_hetero_neighbors(graphs, edge_types, inputs, nn_cfg, 2,
                                     key=jax.random.key(0))
    feats = {t: jnp.asarray(xs[t])[np.asarray(
        jnp.clip(sample.nodes[t], 0, node_counts[t] - 1))] for t in xs}
    edges = {r: (sample.rows[r], sample.cols[r], sample.edge_valid[r])
             for r in sample.rows}
    rel_specs = tuple(sorted((rel_key(e), e[0], e[2]) for e in edge_types))

    unrolled = HGT(hidden=16, out=3, num_layers=2, node_types=sorted(xs),
                   rel_specs=rel_specs, out_type="v0")
    stacked = unrolled.clone(stacked_rels=True)
    p_u = unrolled.init(jax.random.key(1), feats, edges)
    p_s = stacked.init(jax.random.key(2), feats, edges)

    # transplant: per-rel w_att_{r}/w_msg_{r}/mu_{r} -> stacked rows, in
    # the order _stacked_messages enumerates (rel_specs, present-in-edges)
    import flax
    p_s = flax.core.unfreeze(jax.tree.map(lambda a: a, p_s))
    p_u_d = flax.core.unfreeze(jax.tree.map(lambda a: a, p_u))
    specs = [(r, s, d) for (r, s, d) in rel_specs
             if r in edges and edges[r][0].shape[0] > 0]
    for layer in ("hgt0", "hgt1"):
        lu = p_u_d["params"][layer]
        ls = p_s["params"][layer]
        for name in lu:
            if not name.startswith(("w_att_", "w_msg_", "mu_")):
                ls[name] = lu[name]
        for ri, (r, _s, _d) in enumerate(specs):
            ls["w_att"] = ls["w_att"].at[ri].set(lu[f"w_att_{r}"])
            ls["w_msg"] = ls["w_msg"].at[ri].set(lu[f"w_msg_{r}"])
            ls["mu"] = ls["mu"].at[ri].set(lu[f"mu_{r}"])
    p_s["params"]["in_v0"] = p_u_d["params"]["in_v0"]
    for t in xs:
        p_s["params"][f"in_{t}"] = p_u_d["params"][f"in_{t}"]
    p_s["params"]["head"] = p_u_d["params"]["head"]

    out_u = np.asarray(unrolled.apply(p_u, feats, edges))
    out_s = np.asarray(stacked.apply(p_s, feats, edges))
    np.testing.assert_allclose(out_s, out_u, rtol=2e-6, atol=2e-6)
