"""Native C++ graph builder: equivalence with the NumPy path + golden
sampler validity."""
import numpy as np
import pytest

from tch_geometric_tpu import native
from tch_geometric_tpu.data.storage import _coo_sort_np, ind2ptr_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")


def test_ind2ptr_native():
    ind = np.array([3, 3, 3, 4, 4, 7, 7, 8, 8], dtype=np.int64)
    got = native.ind2ptr(ind, 10)
    assert got.tolist() == [0, 0, 0, 0, 3, 5, 5, 5, 7, 9, 9]


@pytest.mark.parametrize("csc", [True, False])
def test_coo_to_csx_matches_numpy(karate, csc):
    _x, _y, ei = karate
    n = 34
    ptrs, indices, perm = native.coo_to_csx(ei[0], ei[1], n, n, csc)
    row, col, perm_np = _coo_sort_np(ei[0], ei[1], n, n, csc)
    if csc:
        assert np.array_equal(ptrs, ind2ptr_np(col, n))
        assert np.array_equal(indices, row)
    else:
        assert np.array_equal(ptrs, ind2ptr_np(row, n))
        assert np.array_equal(indices, col)
    assert np.array_equal(perm, perm_np)


def test_coo_to_csx_large_random():
    rng = np.random.default_rng(0)
    n_r, n_c, E = 500, 300, 20000
    row = rng.integers(0, n_r, E)
    col = rng.integers(0, n_c, E)
    ptrs, indices, perm = native.coo_to_csx(row, col, n_r, n_c, True)
    r2, c2, perm_np = _coo_sort_np(row, col, n_r, n_c, True)
    assert np.array_equal(indices, r2)
    assert np.array_equal(perm, perm_np)
    assert ptrs[-1] == E


def test_golden_sampler_validity(karate):
    _x, _y, ei = karate
    n = 34
    cp, ri, _ = native.coo_to_csx(ei[0], ei[1], n, n, True)
    samples, rows, cols, eptr = native.neighbor_sample_golden(
        cp, ri, np.array([0, 1, 4, 5]), np.array([4, 3]), seed=7)
    assert samples[:4].tolist() == [0, 1, 4, 5]
    for j, i, e in zip(rows, cols, eptr):
        # sampled edge must be a real in-edge of its dst
        w = samples[i]
        assert cp[w] <= e < cp[w + 1]
        assert ri[e] == samples[j]
