"""ctypes bindings for the native (C++) host components.

Compiles ``graph_builder.cpp`` on first use (g++ -O3, cached as a .so next
to the source); falls back silently to the NumPy paths when no compiler is
available.  The Python<->C++ boundary is plain ctypes over NumPy buffers —
no pybind11 dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_builder.cpp")
_SO = os.path.join(_HERE, "_graph_builder.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception as e:  # no compiler / failed build -> numpy fallback
        print(f"tch_geometric_tpu.native: build failed ({e}); "
              "using NumPy fallback", file=sys.stderr)
        return None


def get_lib():
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        so = _build()
        if so:
            lib = ctypes.CDLL(so)
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.tgt_ind2ptr.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p]
            lib.tgt_coo_to_csx.argtypes = [
                i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, i64p, i64p, i64p]
            lib.tgt_neighbor_sample_golden.argtypes = [
                i64p, i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64,
                ctypes.c_uint64, i64p, i64p, i64p, i64p, i64p]
            lib.tgt_neighbor_sample_golden.restype = ctypes.c_int64
            lib.tgt_neighbor_sample_golden_wor.argtypes = \
                lib.tgt_neighbor_sample_golden.argtypes
            lib.tgt_neighbor_sample_golden_wor.restype = ctypes.c_int64
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.tgt_neighbor_sample_golden_weighted.argtypes = [
                i64p, i64p, f64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64,
                ctypes.c_uint64, i64p, i64p, i64p, i64p, i64p]
            lib.tgt_neighbor_sample_golden_weighted.restype = ctypes.c_int64
            lib.tgt_random_walk_golden.argtypes = [
                i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_double, ctypes.c_double, ctypes.c_uint64, i64p]
            _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def ind2ptr(ind: np.ndarray, m: int) -> np.ndarray:
    lib = get_lib()
    ind = np.ascontiguousarray(ind, dtype=np.int64)
    out = np.empty(m + 1, dtype=np.int64)
    lib.tgt_ind2ptr(ind, ind.shape[0], m, out)
    return out


def coo_to_csx(row: np.ndarray, col: np.ndarray, num_rows: int, num_cols: int,
               csc: bool) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = get_lib()
    row = np.ascontiguousarray(row, dtype=np.int64)
    col = np.ascontiguousarray(col, dtype=np.int64)
    E = row.shape[0]
    n_major = num_cols if csc else num_rows
    ptrs = np.empty(n_major + 1, dtype=np.int64)
    indices = np.empty(E, dtype=np.int64)
    perm = np.empty(E, dtype=np.int64)
    lib.tgt_coo_to_csx(row, col, E, num_rows, num_cols, int(csc),
                       ptrs, indices, perm)
    return ptrs, indices, perm


def neighbor_sample_golden(col_ptrs, row_indices, inputs, fanouts, seed=1,
                           *, with_replacement=True, weights=None):
    """Sequential CPU golden sampler.

    ``with_replacement=True``: uniform-with-replacement (the reference's
    UnweightedSampler<true>); ``False``: Algorithm-R reservoir
    (sampling.rs:6-26); ``weights``: A-Chao weighted reservoir
    (sampling.rs:28-55).  Independent oracles for invariant/law tests."""
    lib = get_lib()
    col_ptrs = np.ascontiguousarray(col_ptrs, dtype=np.int64)
    row_indices = np.ascontiguousarray(row_indices, dtype=np.int64)
    inputs = np.ascontiguousarray(inputs, dtype=np.int64)
    fanouts = np.ascontiguousarray(fanouts, dtype=np.int64)
    cap = int(inputs.shape[0])
    layer = int(inputs.shape[0])
    for k in fanouts:
        layer *= int(k)
        cap += layer
    samples = np.empty(cap, dtype=np.int64)
    rows = np.empty(cap, dtype=np.int64)
    cols = np.empty(cap, dtype=np.int64)
    eptr = np.empty(cap, dtype=np.int64)
    n_edges = np.zeros(1, dtype=np.int64)
    if weights is not None:
        w = np.ascontiguousarray(weights, dtype=np.float64)
        n = lib.tgt_neighbor_sample_golden_weighted(
            col_ptrs, row_indices, w, inputs, inputs.shape[0], fanouts,
            fanouts.shape[0], seed, samples, rows, cols, eptr, n_edges)
    elif with_replacement:
        n = lib.tgt_neighbor_sample_golden(
            col_ptrs, row_indices, inputs, inputs.shape[0], fanouts,
            fanouts.shape[0], seed, samples, rows, cols, eptr, n_edges)
    else:
        n = lib.tgt_neighbor_sample_golden_wor(
            col_ptrs, row_indices, inputs, inputs.shape[0], fanouts,
            fanouts.shape[0], seed, samples, rows, cols, eptr, n_edges)
    m = int(n_edges[0])
    return samples[:n], rows[:m], cols[:m], eptr[:m]


def random_walk_golden(row_ptrs, col_indices, start, walk_length,
                       p=1.0, q=1.0, seed=1):
    """Sequential node2vec oracle: the reference's UNBOUNDED rejection
    loop + binary-search has_edge (random_walk.rs:10-75) — the law our
    bounded-trial device walk approximates (SURVEY §7.3)."""
    lib = get_lib()
    row_ptrs = np.ascontiguousarray(row_ptrs, dtype=np.int64)
    col_indices = np.ascontiguousarray(col_indices, dtype=np.int64)
    start = np.ascontiguousarray(start, dtype=np.int64)
    walks = np.empty((start.shape[0], walk_length + 1), dtype=np.int64)
    lib.tgt_random_walk_golden(row_ptrs, col_indices, start, start.shape[0],
                               walk_length, float(p), float(q), seed,
                               walks.reshape(-1))
    return walks
