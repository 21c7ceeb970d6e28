"""Statistical + exactness tests for the batched sampling primitives."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tch_geometric_tpu.sampling import primitives


def test_floyd_exact_subset():
    key = jax.random.key(0)
    deg = jnp.array([0, 1, 3, 5, 10, 100])
    pos, valid = primitives.floyd_sample(key, deg, 4)
    pos, valid = np.asarray(pos), np.asarray(valid)
    # counts: min(k, deg)
    assert valid.sum(-1).tolist() == [0, 1, 3, 4, 4, 4]
    for i, d in enumerate([0, 1, 3, 5, 10, 100]):
        chosen = pos[i][valid[i]]
        assert len(set(chosen.tolist())) == len(chosen)  # distinct
        assert all(0 <= c < d for c in chosen)           # in range


def test_floyd_uniformity():
    # Each position of [0, 6) should appear ~ k/6 of the time when k=3.
    key = jax.random.key(1)
    B = 6000
    deg = jnp.full((B,), 6)
    pos, valid = primitives.floyd_sample(key, deg, 3)
    counts = np.bincount(np.asarray(pos)[np.asarray(valid)], minlength=6)
    freq = counts / counts.sum()
    assert np.allclose(freq, 1 / 6, atol=0.02), freq


def test_uniform_lane_topk_exact_subset():
    key = jax.random.key(7)
    deg = jnp.array([0, 1, 3, 5, 10, 60])
    pos, valid = primitives.uniform_lane_topk(key, deg, 64, 4)
    pos, valid = np.asarray(pos), np.asarray(valid)
    assert valid.sum(-1).tolist() == [0, 1, 3, 4, 4, 4]
    for i, d in enumerate([0, 1, 3, 5, 10, 60]):
        chosen = pos[i][valid[i]]
        assert len(set(chosen.tolist())) == len(chosen)  # distinct
        assert all(0 <= c < d for c in chosen)           # in range
    # k wider than the lane count: all valid lanes chosen, rest padded
    pos, valid = primitives.uniform_lane_topk(key, jnp.array([3, 8]), 8, 12)
    assert np.asarray(valid).sum(-1).tolist() == [3, 8]


def test_uniform_lane_topk_uniformity():
    # Same law as floyd_sample: each position of [0, 6) appears ~ k/6.
    key = jax.random.key(8)
    B = 6000
    deg = jnp.full((B,), 6)
    pos, valid = primitives.uniform_lane_topk(key, deg, 16, 3)
    counts = np.bincount(np.asarray(pos)[np.asarray(valid)], minlength=6)
    freq = counts / counts.sum()
    assert np.allclose(freq, 1 / 6, atol=0.02), freq


def test_replacement_positions():
    key = jax.random.key(2)
    deg = jnp.array([0, 2, 7])
    pos, valid = primitives.replacement_positions(key, deg, 5)
    pos, valid = np.asarray(pos), np.asarray(valid)
    assert valid.sum(-1).tolist() == [0, 5, 5]
    assert (pos[1] < 2).all() and (pos[2] < 7).all()


def test_window_topk_uniform_matches_floyd_semantics():
    key = jax.random.key(3)
    starts = jnp.array([0, 10, 20])
    degs = jnp.array([10, 5, 0])
    pos, valid = primitives.window_topk_sample(
        key, starts, degs, 4, max_degree=10, num_edges=30, window=4)
    pos, valid = np.asarray(pos), np.asarray(valid)
    assert valid.sum(-1).tolist() == [4, 4, 0]
    for i, d in enumerate([10, 5, 0]):
        chosen = pos[i][valid[i]]
        assert len(set(chosen.tolist())) == len(chosen)
        assert all(0 <= c < d for c in chosen)


def test_window_topk_weighted_bias():
    # Weight edge 0 of each window 10x: it must be selected in (far) more
    # than uniform share of single-draw samples.
    key = jax.random.key(4)
    B, deg = 4000, 8
    starts = jnp.arange(B) * deg
    degs = jnp.full((B,), deg)
    w = jnp.ones((B * deg,)).at[jnp.arange(B) * deg].set(10.0)
    logw = jnp.log(w)
    pos, valid = primitives.window_topk_sample(
        key, starts, degs, 1, max_degree=deg, num_edges=B * deg,
        logw_at=lambda e: logw[e], window=8)
    share = float((np.asarray(pos)[:, 0] == 0).mean())
    # expected P = 10/17 ~ 0.588
    assert abs(share - 10 / 17) < 0.04, share


def test_window_topk_mask_respected():
    key = jax.random.key(5)
    starts = jnp.array([0])
    degs = jnp.array([100])
    allowed = jnp.zeros((100,), jnp.bool_).at[jnp.arange(0, 100, 7)].set(True)
    pos, valid = primitives.window_topk_sample(
        key, starts, degs, 20, max_degree=100, num_edges=100,
        mask_at=lambda e: allowed[e], window=16)
    pos, valid = np.asarray(pos)[0], np.asarray(valid)[0]
    assert valid.sum() == 15  # ceil(100/7)
    assert all(p % 7 == 0 for p in pos[valid])


def test_window_choice_with_replacement():
    key = jax.random.key(6)
    starts = jnp.array([0, 0])
    degs = jnp.array([3, 0])
    pos, valid = primitives.window_choice_sample(
        key, starts, degs, 6, max_degree=3, num_edges=3, window=4)
    pos, valid = np.asarray(pos), np.asarray(valid)
    assert valid[0].all() and not valid[1].any()
    assert (pos[0] < 3).all()


def test_chunking_consistency():
    # Same admissible set must be produced regardless of window size.
    key = jax.random.key(7)
    starts = jnp.array([0, 64])
    degs = jnp.array([64, 40])
    outs = []
    for W in (8, 16, 128):
        pos, valid = primitives.window_topk_sample(
            key, starts, degs, 64, max_degree=64, num_edges=104, window=W)
        # with k >= deg every admissible position must appear
        sets = [sorted(np.asarray(pos)[i][np.asarray(valid)[i]].tolist())
                for i in range(2)]
        outs.append(sets)
    assert outs[0] == outs[1] == outs[2]
    assert outs[0][0] == list(range(64))
    assert outs[0][1] == list(range(40))
