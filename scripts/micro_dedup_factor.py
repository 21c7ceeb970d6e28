"""Measure the duplication factor of the blocked-SpMM fetch multiset.

VERDICT r2 weak-item 1: the measured "gather wall" counts the kernel's own
padded fetch multiset, which contains (a) ~5% padding lanes and (b)
duplicate hub-row fetches on power-law graphs.  A kernel that fetches each
distinct row once per chunk (or once per block, or routes hot rows to a
compact table) fetches FEWER rows than the floor counts — so before
building any dedup kernel, measure how much duplication actually exists at
each granularity, with plain numpy over the exact chunk layout the kernel
uses (ops/spmm_blocked._build_blocked_np chunking rule).

Granularities (fetch-count reduction available if deduped there):
  chunk  — the gather is (T, C, F); per-chunk unique is what a
           per-chunk-unique + one-hot-expansion kernel can exploit.
  block  — unique (row-block, src) pairs; host-side pre-dedup with
           multiplicity folded into an edge weight exploits this.
  hot    — fraction of fetches hitting the top-K sources; a compact
           VMEM/small-table hot path exploits this (big tables gather at
           ~86 Macc/s vs ~380 for <=64 MB tables, BASELINE.md).
"""
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chunk_layout(indptr, W):
    """Replicate _build_blocked_np's auto chunk sizing (numpy, O(B))."""
    N = indptr.shape[0] - 1
    B = -(-N // W)
    blk_first = indptr[np.minimum(np.arange(B + 1) * W, N)]
    blk_e = np.diff(blk_first)
    mean_blk = float(blk_e.mean()) if B else 256.0
    lo = max(256, int(mean_blk * 0.5) // 128 * 128)
    hi = max(lo + 128, int(blk_e.max()) // 128 * 128 + 128) if B else lo + 128
    cands = np.unique(np.linspace(lo, hi, 64, dtype=np.int64) // 128 * 128)
    totals = [(int(np.sum(-(-blk_e // C1))) * int(C1), int(C1))
              for C1 in cands]
    C = min(totals)[1]
    return blk_first, blk_e, C


def measure(name, indptr, indices, W=256, hot_ks=(1024, 4096, 16384, 65536)):
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    N, E = indptr.shape[0] - 1, indices.shape[0]
    t0 = time.time()
    blk_first, blk_e, C = chunk_layout(indptr, W)
    B = blk_e.shape[0]
    chunks_per_blk = np.maximum(-(-blk_e // C), 1)
    T = int(chunks_per_blk.sum())
    lanes = T * C

    # per-edge block id and chunk id (edges are CSR-ordered)
    blk_of_edge = np.repeat(np.arange(B, dtype=np.int64), blk_e)
    chunk0_of_blk = np.concatenate([[0], np.cumsum(chunks_per_blk)])[:-1]
    off_in_blk = np.arange(E, dtype=np.int64) - blk_first[blk_of_edge]
    chunk_of_edge = chunk0_of_blk[blk_of_edge] + off_in_blk // C

    # unique (chunk, src) and (block, src) pair counts — one sort each
    uniq_chunk = np.unique(chunk_of_edge * N + indices).shape[0]
    uniq_block = np.unique(blk_of_edge * N + indices).shape[0]

    # hot-set coverage: top-K sources by global frequency
    freq = np.bincount(indices, minlength=N)
    order = np.argsort(freq)[::-1]
    hot_cov = {}
    hot_uniq_chunk = {}
    for K in hot_ks:
        hot = order[:K]
        hot_mask = np.zeros(N, bool)
        hot_mask[hot] = True
        sel = hot_mask[indices]
        hot_cov[K] = float(sel.mean())
        if sel.any():
            hkey = chunk_of_edge[sel] * N + indices[sel]
            hot_uniq_chunk[K] = np.unique(hkey).shape[0] / max(sel.sum(), 1)
        else:
            hot_uniq_chunk[K] = 1.0

    pad = lanes / E
    print(f"\n== {name}: N={N} E={E} W={W} C={C} T={T} "
          f"(measure {time.time()-t0:.1f}s)")
    print(f"  padding ratio (lanes/E):          {pad:.4f}")
    print(f"  chunk-level dup (E/uniq):         {E/uniq_chunk:.4f}  "
          f"(lanes/uniq = {lanes/uniq_chunk:.4f})")
    print(f"  block-level dup (E/uniq):         {E/uniq_block:.4f}  "
          f"(lanes/uniq = {lanes/uniq_block:.4f})")
    for K in hot_ks:
        print(f"  top-{K:>6d} src coverage:          {hot_cov[K]*100:5.1f}% "
              f"of edges; hot uniq/chunk-hot = {hot_uniq_chunk[K]:.3f}")
    return dict(pad=pad, chunk_dup=E / uniq_chunk, block_dup=E / uniq_block,
                hot_cov=hot_cov)


def main():
    # 1. the headline bench graph (uniform random sources)
    rng = np.random.default_rng(0)
    N, E = 1 << 18, 1 << 22
    dst = rng.integers(0, N, E, dtype=np.int64)
    src = rng.integers(0, N, E, dtype=np.int64)
    order = np.argsort(dst, kind="stable")
    indptr = np.searchsorted(dst[order], np.arange(N + 1))
    measure("bench.py uniform (N=262k E=4.2M)", indptr, src[order])

    # 2. synthetic ogbn-products (power-law sources), full scale
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    from tch_geometric_tpu.data.ogb import synthetic_ogbn
    d = synthetic_ogbn("ogbn-products", scale=scale)
    src, dst = d.edge_index[0], d.edge_index[1]
    order = np.argsort(dst, kind="stable")
    n = int(max(src.max(), dst.max())) + 1
    indptr = np.searchsorted(dst[order], np.arange(n + 1))
    measure(f"products power-law (scale={scale})", indptr, src[order])


if __name__ == "__main__":
    main()
