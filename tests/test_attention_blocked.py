"""Blocked Pallas attention ops vs the XLA segment-op reference path.

All Pallas calls run with interpret=True (CPU); exactness is checked against
ops/spmm.py + ops/segment.py, with the blocked<->CSR edge mapping via
``BlockedCsr.edge_ptr``.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tch_geometric_tpu.ops import (
    attend_blocked,
    build_blocked,
    edge_attr_to_blocked,
    edge_softmax_blocked,
    sddmm_blocked_pallas,
    segment_softmax,
    spmm_blocked_weighted_pallas,
)
from tch_geometric_tpu.ops.segment import csr_row_ids, segment_sum


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(7)
    N, E, F = 300, 4000, 128
    dst = np.sort(rng.integers(0, N, E))
    src = rng.integers(0, N, E)
    indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int32)
    b = build_blocked(indptr, src.astype(np.int32), rows_per_block=128)
    x_dst = rng.normal(size=(N, F)).astype(np.float32)
    x_src = rng.normal(size=(N, F)).astype(np.float32)
    return indptr, src, b, x_dst, x_src


def _csr_scores(indptr, src, x_dst, x_src):
    E = src.shape[0]
    rows = np.repeat(np.arange(indptr.shape[0] - 1), np.diff(indptr))
    return (x_dst[rows] * x_src[src]).sum(-1), rows


def test_edge_ptr_roundtrip(graph):
    indptr, src, b, _, _ = graph
    eptr = np.asarray(b.edge_ptr)
    valid = np.asarray(b.edge_valid)
    # every CSR edge appears exactly once among valid lanes
    assert np.array_equal(np.sort(eptr[valid]), np.arange(src.shape[0]))
    # lane's source id matches the CSR edge it claims to be
    assert np.array_equal(np.asarray(b.edge_src)[valid], src[eptr[valid]])


def test_edge_attr_to_blocked(graph):
    _, src, b, _, _ = graph
    attr = np.arange(src.shape[0], dtype=np.float32) + 1.0
    blocked = np.asarray(edge_attr_to_blocked(b, jnp.asarray(attr)))
    valid = np.asarray(b.edge_valid)
    assert np.array_equal(blocked[valid],
                          attr[np.asarray(b.edge_ptr)[valid]])
    assert (blocked[~valid] == 0).all()


def test_sddmm_blocked_matches_csr(graph):
    indptr, src, b, x_dst, x_src = graph
    s = np.asarray(sddmm_blocked_pallas(b, jnp.asarray(x_dst),
                                        jnp.asarray(x_src),
                                        compute_dtype=jnp.float32,
                                        interpret=True))
    ref, _rows = _csr_scores(indptr, src, x_dst, x_src)
    valid = np.asarray(b.edge_valid)
    eptr = np.asarray(b.edge_ptr)
    np.testing.assert_allclose(s[valid], ref[eptr[valid]], rtol=2e-5,
                               atol=1e-4)


def test_edge_softmax_blocked(graph):
    indptr, src, b, x_dst, x_src = graph
    s = sddmm_blocked_pallas(b, jnp.asarray(x_dst), jnp.asarray(x_src),
                             compute_dtype=jnp.float32, interpret=True)
    att = np.asarray(edge_softmax_blocked(b, s, interpret=True))
    valid = np.asarray(b.edge_valid)
    assert (att[~valid] == 0).all()

    # per-row sums over valid lanes == 1 where the row has edges
    W = b.rows_per_block
    rows = (np.asarray(b.chunk_block)[:, None] * W
            + np.asarray(b.edge_local_row))
    deg = np.diff(indptr)
    sums = np.zeros(b.num_blocks * W)
    np.add.at(sums, rows[valid], att[valid])
    np.testing.assert_allclose(sums[: indptr.shape[0] - 1][deg > 0], 1.0,
                               rtol=1e-5)

    # exact per-edge match vs the XLA segment softmax
    ref_s, ref_rows = _csr_scores(indptr, src, x_dst, x_src)
    ref_att = np.asarray(segment_softmax(jnp.asarray(ref_s),
                                         jnp.asarray(ref_rows),
                                         indptr.shape[0] - 1))
    eptr = np.asarray(b.edge_ptr)
    np.testing.assert_allclose(att[valid], ref_att[eptr[valid]], rtol=2e-5,
                               atol=1e-6)


def test_spmm_blocked_weighted(graph):
    indptr, src, b, _, x_src = graph
    E = src.shape[0]
    rng = np.random.default_rng(3)
    w_csr = rng.normal(size=(E,)).astype(np.float32)
    w_blk = edge_attr_to_blocked(b, jnp.asarray(w_csr))
    out = np.asarray(spmm_blocked_weighted_pallas(
        b, jnp.asarray(x_src), w_blk, compute_dtype=jnp.float32,
        interpret=True))
    rows = np.repeat(np.arange(indptr.shape[0] - 1), np.diff(indptr))
    ref = np.asarray(segment_sum(
        jnp.asarray(x_src[src] * w_csr[:, None]), jnp.asarray(rows),
        indptr.shape[0] - 1))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_attend_blocked_end_to_end(graph):
    indptr, src, b, x_dst, x_src = graph
    out = np.asarray(attend_blocked(b, jnp.asarray(x_dst),
                                    jnp.asarray(x_src),
                                    compute_dtype=jnp.float32,
                                    interpret=True))
    # XLA reference: scaled scores -> segment softmax -> weighted sum
    F = x_src.shape[-1]
    ref_s, rows = _csr_scores(indptr, src, x_dst, x_src)
    ref_att = np.asarray(segment_softmax(
        jnp.asarray(ref_s / np.sqrt(F)), jnp.asarray(rows),
        indptr.shape[0] - 1))
    ref = np.asarray(segment_sum(
        jnp.asarray(x_src[src] * ref_att[:, None]), jnp.asarray(rows),
        indptr.shape[0] - 1))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_gat_conv_blocked_matches_xla(graph):
    """GATConv with blocked= routes through the Pallas path; outputs match."""
    import jax
    from tch_geometric_tpu.data.graph import make_graph
    from tch_geometric_tpu.models.gnn import GATConv

    indptr, src, b, x_dst, _ = graph
    N = indptr.shape[0] - 1
    g = make_graph(indptr, src.astype(np.int32), num_src=N, num_dst=N)
    x = jnp.asarray(x_dst[:, :16])

    conv = GATConv(features=8, heads=2)
    params = conv.init(jax.random.key(0), x, g)
    ref = conv.apply(params, x, g)
    out = conv.apply(params, x, g, blocked=b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_edge_softmax_multihead_matches_per_head():
    """The one-traversal multi-head softmax must equal H independent
    single-head passes."""
    import jax.numpy as jnp
    from tch_geometric_tpu.ops.attention_blocked import (
        edge_softmax_blocked, edge_softmax_blocked_multihead)
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked
    rng = np.random.default_rng(3)
    N, E, H = 300, 2000, 4
    dst = np.sort(rng.integers(0, N, E))
    src = rng.integers(0, N, E)
    indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int32)
    b = build_blocked(indptr, src.astype(np.int32), rows_per_block=128,
                      chunk_edges=256)
    scores = jnp.asarray(rng.normal(size=(H,) + b.edge_src.shape)
                         .astype(np.float32))
    mh = np.asarray(edge_softmax_blocked_multihead(b, scores,
                                                   interpret=True))
    for hd in range(H):
        sh = np.asarray(edge_softmax_blocked(b, scores[hd], interpret=True))
        np.testing.assert_allclose(mh[hd], sh, rtol=1e-6, atol=1e-7)


def test_attend_fused_matches_composed(graph):
    """attend_blocked_fused (2 kernels) must match the 4-kernel composed
    pipeline and the XLA segment reference."""
    from tch_geometric_tpu.ops.attention_blocked import attend_blocked_fused
    indptr, src, b, x_dst, x_src = graph
    composed = np.asarray(attend_blocked(
        b, jnp.asarray(x_dst), jnp.asarray(x_src),
        compute_dtype=jnp.float32, interpret=True))
    fused = np.asarray(attend_blocked_fused(
        b, jnp.asarray(x_dst), jnp.asarray(x_src),
        compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(fused, composed, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("row_stats", [True, False])
def test_attend_flash_matches_composed(graph, row_stats):
    """attend_blocked_flash (ONE kernel, flash-rescaled accumulator) must
    match the composed pipeline; both stat variants."""
    from tch_geometric_tpu.ops.attention_blocked import attend_blocked_flash
    indptr, src, b, x_dst, x_src = graph
    composed = np.asarray(attend_blocked(
        b, jnp.asarray(x_dst), jnp.asarray(x_src),
        compute_dtype=jnp.float32, interpret=True))
    flash = np.asarray(attend_blocked_flash(
        b, jnp.asarray(x_dst), jnp.asarray(x_src),
        compute_dtype=jnp.float32, row_stats=row_stats, interpret=True))
    np.testing.assert_allclose(flash, composed, rtol=2e-4, atol=2e-4)


def test_spmm_hot_split_exact():
    """Hot/cold split SpMM (dedup + compact hot table) is exact vs the
    unsplit blocked kernel on a power-law graph, for sum and mean."""
    from tch_geometric_tpu.ops.spmm_blocked import (build_blocked,
                                                    build_blocked_hot,
                                                    spmm_blocked)
    from tch_geometric_tpu.ops.spmm_pallas import spmm_hot_split
    rng = np.random.default_rng(0)
    N, E, F = 1024, 20000, 128
    pop = (1.0 / (np.arange(N) + 10.0)) ** 0.8
    pop /= pop.sum()
    src = rng.choice(N, size=E, p=pop)
    dst = np.sort(rng.integers(0, N, E))
    indptr = np.searchsorted(dst, np.arange(N + 1))
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    b = build_blocked(indptr, src.astype(np.int64), rows_per_block=128)
    hs = build_blocked_hot(indptr, src.astype(np.int64), hot_k=128,
                           rows_per_block=128)
    # the split conserves the edge multiset
    assert (int(np.asarray(hs.cold.edge_valid).sum())
            + int(np.asarray(hs.hot_count).sum())) == E
    for agg in ("sum", "mean"):
        ref = np.asarray(spmm_blocked(b, x, agg=agg,
                                      compute_dtype=jnp.float32))
        out = np.asarray(spmm_hot_split(hs, x, agg=agg,
                                        compute_dtype=jnp.float32,
                                        interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spmm_hot_split_segmented_exact():
    """Segmented hot/cold split (products-scale variant) is exact, and the
    segmented weighted path matches the explicit-weight blocked kernel."""
    from tch_geometric_tpu.ops.spmm_blocked import (
        build_blocked, build_blocked_hot_segmented, build_blocked_segmented,
        spmm_blocked)
    from tch_geometric_tpu.ops.spmm_pallas import (
        spmm_blocked_segmented, spmm_hot_split_segmented)
    rng = np.random.default_rng(1)
    N, E, F = 1024, 20000, 64
    pop = (1.0 / (np.arange(N) + 10.0)) ** 0.8
    pop /= pop.sum()
    src = rng.choice(N, size=E, p=pop)
    dst = np.sort(rng.integers(0, N, E))
    indptr = np.searchsorted(dst, np.arange(N + 1))
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    b = build_blocked(indptr, src.astype(np.int64), rows_per_block=128)
    ref = np.asarray(spmm_blocked(b, x, agg="mean",
                                  compute_dtype=jnp.float32))

    w = rng.uniform(0.5, 2.0, E).astype(np.float32)
    segw = build_blocked_segmented(indptr, src.astype(np.int64),
                                   num_segments=4, rows_per_block=128,
                                   edge_attr=w)
    wb = np.where(np.asarray(b.edge_valid),
                  w[np.clip(np.asarray(b.edge_ptr), 0, E - 1)], 0)
    refw = np.asarray(spmm_blocked(b, x, agg="sum",
                                   compute_dtype=jnp.float32,
                                   edge_weight=jnp.asarray(wb)))
    outw = np.asarray(spmm_blocked_segmented(
        segw, x, compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(outw, refw, rtol=1e-4, atol=1e-4)

    hseg = build_blocked_hot_segmented(indptr, src.astype(np.int64),
                                       hot_k=128, num_segments=4,
                                       rows_per_block=128)
    out = np.asarray(spmm_hot_split_segmented(
        hseg, x, agg="mean", compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_sddmm_v2_matches_v1(graph):
    """Lane-major SDDMM variant is bit-equal to the sublane-major one."""
    from tch_geometric_tpu.ops.attention_blocked import (
        sddmm_blocked_pallas_v2)
    indptr, src, b, x_dst, x_src = graph
    a = np.asarray(sddmm_blocked_pallas(
        b, jnp.asarray(x_dst), jnp.asarray(x_src),
        compute_dtype=jnp.float32, interpret=True))
    v = np.asarray(sddmm_blocked_pallas_v2(
        b, jnp.asarray(x_dst), jnp.asarray(x_src),
        compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(v, a, rtol=1e-5, atol=1e-5)


def test_gat_flash_matches_composed():
    """One-kernel one-gather multi-head GAT flash matches the composed
    multihead-softmax + multiweighted pipeline."""
    from tch_geometric_tpu.ops.attention_blocked import (
        gat_attend_blocked, gat_attend_blocked_flash)
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked
    rng = np.random.default_rng(2)
    N, E, H, D = 512, 4096, 4, 32
    dst = np.sort(rng.integers(0, N, E))
    src = rng.integers(0, N, E)
    indptr = np.searchsorted(dst, np.arange(N + 1))
    b = build_blocked(indptr, src.astype(np.int32), rows_per_block=128)
    h = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    ref = np.asarray(gat_attend_blocked(
        b, h, a_s, a_d, compute_dtype=jnp.float32, interpret=True))
    out = np.asarray(gat_attend_blocked_flash(
        b, h, a_s, a_d, compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_gat_packed_matches_composed():
    """The head-packed flash GAT (NT-matmul selects, one full-width
    weighted contraction) matches the composed multihead pipeline."""
    from tch_geometric_tpu.ops.attention_blocked import (
        gat_attend_blocked, gat_attend_blocked_packed)
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked
    rng = np.random.default_rng(5)
    N, E, H, D = 512, 4096, 4, 32
    dst = np.sort(rng.integers(0, N, E))
    src = rng.integers(0, N, E)
    indptr = np.searchsorted(dst, np.arange(N + 1))
    b = build_blocked(indptr, src.astype(np.int32), rows_per_block=128)
    h = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    ref = np.asarray(gat_attend_blocked(
        b, h, a_s, a_d, compute_dtype=jnp.float32, interpret=True))
    out = np.asarray(gat_attend_blocked_packed(
        b, h, a_s, a_d, compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_gat_packed_vec_matches_table():
    """The aligned-gather projection variant (alpha_src computed in-kernel
    from the (H, D) GATv1 vector) matches the widened-table variant."""
    from tch_geometric_tpu.ops.attention_blocked import (
        gat_attend_blocked_packed)
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked
    rng = np.random.default_rng(6)
    N, E, H, D = 512, 4096, 4, 32
    dst = np.sort(rng.integers(0, N, E))
    src = rng.integers(0, N, E)
    indptr = np.searchsorted(dst, np.arange(N + 1))
    b = build_blocked(indptr, src.astype(np.int32), rows_per_block=128)
    h = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    vec = jnp.asarray(rng.normal(size=(H, D)).astype(np.float32))
    a_s = (h * vec[None]).sum(-1)                     # the GATv1 projection
    a_d = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    ref = np.asarray(gat_attend_blocked_packed(
        b, h, a_s, a_d, compute_dtype=jnp.float32, interpret=True))
    out = np.asarray(gat_attend_blocked_packed(
        b, h, None, a_d, alpha_src_vec=vec, compute_dtype=jnp.float32,
        interpret=True))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        gat_attend_blocked_packed(b, h, a_s, a_d, alpha_src_vec=vec,
                                  compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_blocked_forward_hot_split_layouts():
    """GraphSAGE.blocked_forward accepts HotSplitCsr / HotSplitSeg and
    matches the plain blocked layout bit-for-bit (same float ops, only
    the fetch pattern differs... up to summation order)."""
    import jax
    from tch_geometric_tpu.models import GraphSAGE
    from tch_geometric_tpu.ops.spmm_blocked import (
        build_blocked, build_blocked_hot, build_blocked_hot_segmented)
    rng = np.random.default_rng(3)
    N, E, F = 1024, 20000, 32
    pop = (1.0 / (np.arange(N) + 10.0)) ** 0.8
    pop /= pop.sum()
    src = rng.choice(N, size=E, p=pop)
    dst = np.sort(rng.integers(0, N, E))
    indptr = np.searchsorted(dst, np.arange(N + 1))
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    b = build_blocked(indptr, src.astype(np.int64), rows_per_block=128)
    model = GraphSAGE(hidden=16, out=4, num_layers=2)
    params = model.init(jax.random.key(0), x, b,
                        method=GraphSAGE.blocked_forward,
                        compute_dtype=jnp.float32)
    ref = np.asarray(model.apply(params, x, b,
                                 method=GraphSAGE.blocked_forward,
                                 compute_dtype=jnp.float32))
    for hs in (build_blocked_hot(indptr, src.astype(np.int64), hot_k=128,
                                 rows_per_block=128),
               build_blocked_hot_segmented(indptr, src.astype(np.int64),
                                           hot_k=128, num_segments=4,
                                           rows_per_block=128)):
        out = np.asarray(model.apply(params, x, hs,
                                     method=GraphSAGE.blocked_forward,
                                     compute_dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
