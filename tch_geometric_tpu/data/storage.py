"""COO <-> CSC/CSR conversion with edge permutation.

Re-implements the semantics of the reference's conversion path
(/root/reference/src/data/storage.rs:67-127): edges are stably sorted by
``(col * num_rows + row)`` (CSC) or ``(row * num_cols + col)`` (CSR), the
pointer array is a prefix build over sorted leading indices (``ind2ptr``,
storage.rs:67-101), and ``perm`` maps sorted-edge position -> original COO
edge id so downstream code can gather original edge attributes.

TPU-first design: conversion happens once at ingest.  The default path uses
the native C++ builder (``tch_geometric_tpu.native``) when built — a parallel
sort over 64-bit keys — and falls back to NumPy.  A jittable on-device variant
(:func:`coo_to_csc_device`) is provided for graphs constructed inside a
program (e.g. re-partitioning), using XLA sort.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graph import CscGraph, CsrGraph, make_graph


def ind2ptr_np(ind: np.ndarray, m: int) -> np.ndarray:
    """Sorted leading-index array -> pointer array (storage.rs:67-101).

    Vectorised: ptr[i] = number of entries < i = searchsorted(ind, i, 'left').
    """
    ind = np.asarray(ind)
    return np.searchsorted(ind, np.arange(m + 1), side="left").astype(ind.dtype if ind.size else np.int64)


def ind2ptr(ind: jax.Array, m: int) -> jax.Array:
    """Device ind2ptr: ptr = searchsorted(sorted_ind, arange(m+1))."""
    ind = jnp.asarray(ind)
    return jnp.searchsorted(ind, jnp.arange(m + 1, dtype=ind.dtype), side="left")


def _coo_sort_np(row: np.ndarray, col: np.ndarray, num_rows: int, num_cols: int,
                 csc: bool) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stable argsort of edges matching storage.rs:110-124 key scheme."""
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    if csc:
        key = col * num_rows + row
    else:
        key = row * num_cols + col
    perm = np.argsort(key, kind="stable")
    return row[perm], col[perm], perm


def _native_csx(row_col, num_rows, num_cols, csc):
    """C++ counting-sort builder when available (native/graph_builder.cpp);
    None if the native library is unavailable."""
    try:
        from .. import native
    except Exception:
        return None
    if not native.available():
        return None
    row_col = np.asarray(row_col)
    return native.coo_to_csx(row_col[0], row_col[1], num_rows, num_cols, csc)


def _check_coo_bounds(row_col, num_rows, num_cols):
    """Reject out-of-range node ids before the native counting sort.

    The reference surfaces bad inputs as PyValueError (tensor.rs:22-27 /
    a Rust bounds panic); the C++ histogram would instead corrupt memory,
    so validation is mandatory here.  A frequent trigger is passing an
    int ``size`` for a rectangular (hetero-relation) COO whose src count
    differs from its dst count — pass ``(num_rows, num_cols)``."""
    row_col = np.asarray(row_col)
    if row_col.ndim != 2 or row_col.shape[0] != 2:
        raise ValueError(f"row_col must be (2, E), got {row_col.shape}")
    if row_col.shape[1] == 0:
        return row_col
    rmin, rmax = row_col[0].min(), row_col[0].max()
    cmin, cmax = row_col[1].min(), row_col[1].max()
    if rmin < 0 or rmax >= num_rows or cmin < 0 or cmax >= num_cols:
        raise ValueError(
            f"COO indices out of range: rows in [{rmin}, {rmax}] vs "
            f"num_rows={num_rows}, cols in [{cmin}, {cmax}] vs "
            f"num_cols={num_cols}; for rectangular graphs pass "
            "size=(num_rows, num_cols)")
    return row_col


def to_csc(row_col, size) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference-parity ``to_csc`` (src/python.rs:27-39): COO (2, E) ->
    (col_ptrs, row_indices, perm) as host arrays."""
    num_rows, num_cols = _norm_size(size)
    row_col = _check_coo_bounds(row_col, num_rows, num_cols)
    nat = _native_csx(row_col, num_rows, num_cols, csc=True)
    if nat is not None:
        return nat
    row_col = np.asarray(row_col)
    row, col, perm = _coo_sort_np(row_col[0], row_col[1], num_rows, num_cols, csc=True)
    col_ptrs = ind2ptr_np(col, num_cols)
    return col_ptrs, row, perm


def to_csr(row_col, size) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference-parity ``to_csr`` (src/python.rs:41-53)."""
    num_rows, num_cols = _norm_size(size)
    row_col = _check_coo_bounds(row_col, num_rows, num_cols)
    nat = _native_csx(row_col, num_rows, num_cols, csc=False)
    if nat is not None:
        return nat
    row_col = np.asarray(row_col)
    row, col, perm = _coo_sort_np(row_col[0], row_col[1], num_rows, num_cols, csc=False)
    row_ptrs = ind2ptr_np(row, num_rows)
    return row_ptrs, col, perm


def _norm_size(size) -> Tuple[int, int]:
    """GraphSize: int or (rows, cols) pair (src/python.rs:12-25)."""
    if isinstance(size, (tuple, list)):
        return int(size[0]), int(size[1])
    return int(size), int(size)


def csc_graph_from_coo(row_col, size) -> CscGraph:
    """COO -> device CscGraph (in-neighbor adjacency) with perm."""
    num_rows, num_cols = _norm_size(size)
    col_ptrs, row_indices, perm = to_csc(row_col, (num_rows, num_cols))
    return make_graph(col_ptrs, row_indices, perm, num_src=num_rows, num_dst=num_cols)


def csr_graph_from_coo(row_col, size) -> CsrGraph:
    """COO -> device CsrGraph (out-neighbor adjacency) with perm."""
    num_rows, num_cols = _norm_size(size)
    row_ptrs, col_indices, perm = to_csr(row_col, (num_rows, num_cols))
    return make_graph(row_ptrs, col_indices, perm, num_src=num_rows, num_dst=num_cols)


def coo_to_csc_device(row: jax.Array, col: jax.Array, num_rows: int, num_cols: int):
    """Jittable COO->CSC: XLA stable sort by (col*num_rows+row).

    Returns (col_ptrs, row_indices, perm) device arrays.  For use inside jit
    (e.g. on repartitioned shards); host ingest should prefer the native path.
    """
    key = col.astype(jnp.int64) * num_rows + row.astype(jnp.int64)
    perm = jnp.argsort(key, stable=True)
    sorted_col = col[perm]
    col_ptrs = ind2ptr(sorted_col, num_cols)
    return col_ptrs, row[perm], perm
