"""Products-scale SpMM: hot/cold split vs plain segmented blocked-ELL.

VERDICT r3 item 1's build step.  Measured inputs (micro_dedup_factor.py,
products power-law at scale 1.0): top-16k sources cover 31% of edges with
16% within-chunk duplication; top-64k cover 44%.  Big-table gathers run
~86 Macc/s vs ~380+ for small tables (BASELINE.md), so routing the hot
fetches (deduped per (row, hub)) to the compact ``x[hot_ids]`` table
attacks both the access count AND the per-access rate.

Reports ms/layer + effective edges/s for the plain segmented kernel and
the hot-split at several hot_k, on the full synthetic ogbn-products graph
(N=2.45M, E=62M) on one chip.

Run: python scripts/bench_spmm_hotsplit.py [scale]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

F = 128
S = 32
K_ITERS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args):
    # the graph MUST be a jit ARGUMENT: closing over it embeds GB-scale
    # constants in the HLO and the axon remote-compile service rejects the
    # request with HTTP 413 (BASELINE.md)
    f = jax.jit(fn)
    t0 = time.time()
    float(f(*args))
    cs = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K_ITERS, cs


def chain(fn):
    def run(g, x):
        def body(c, _):
            out = fn(g, x + c * 1e-30)
            return (c + out.sum()).astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_ITERS)
        return c
    return run


def main():
    from tch_geometric_tpu.data.ogb import synthetic_ogbn
    from tch_geometric_tpu.ops.spmm_blocked import (
        build_blocked_hot_segmented, build_blocked_segmented)
    from tch_geometric_tpu.ops.spmm_pallas import (
        spmm_blocked_segmented, spmm_hot_split_segmented)

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    log(f"devices: {jax.devices()}")
    t0 = time.time()
    d = synthetic_ogbn("ogbn-products", scale=scale)
    src, dst = d.edge_index[0], d.edge_index[1]
    order = np.argsort(dst, kind="stable")
    N = int(max(src.max(), dst.max())) + 1
    E = src.shape[0]
    indptr = np.searchsorted(dst[order], np.arange(N + 1))
    src = src[order]
    log(f"graph N={N} E={E} (gen {time.time()-t0:.0f}s)")

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    t0 = time.time()
    seg = build_blocked_segmented(indptr, src, num_segments=S,
                                  rows_per_block=256)
    log(f"plain segmented build: {time.time()-t0:.0f}s "
        f"(S={seg.num_segments} Tp={seg.edge_src.shape[1]} "
        f"C={seg.chunk_edges})")
    dt, cs = timed(chain(lambda g, xx: spmm_blocked_segmented(
        g, xx, agg="mean")), seg, x)
    log(f"plain segmented   : {dt*1e3:8.1f} ms/layer  {E/dt/1e6:7.0f} "
        f"Medge/s (compile {cs:.0f}s)")
    base = dt
    del seg

    # the honest floor for THIS shape: a pure gather of the plain layout's
    # padded fetch multiset from the 627 MB bf16 table (chunked scan keeps
    # the (M, F) intermediate bounded like the kernel does)
    xb = x.astype(jnp.bfloat16)
    seg2 = build_blocked_segmented(indptr, src, num_segments=S,
                                   rows_per_block=256)

    def g_floor(g, xb):
        def body(c, es):
            shift = jnp.int32(jnp.abs(c)) % N
            return (c + xb[(es.reshape(-1) + shift) % N].sum()
                    .astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), g.edge_src)
        return c

    dtf, cs = timed(lambda g, xb: g_floor(g, xb), seg2, xb)
    n_acc = int(np.prod(seg2.edge_src.shape))
    log(f"pure-gather floor : {dtf*K_ITERS*1e3:8.1f} ms/pass "
        f"({n_acc/(dtf*K_ITERS)/1e6:.0f} Macc/s) -> plain kernel at "
        f"{dtf*K_ITERS/base*100:.0f}% of it")
    del seg2

    # W > 512 OOMs the 16 MB scoped VMEM in the weighted kernel (the
    # (W, C) one-hot tile); W=256 is the sweet spot
    for hot_k, wcold in ((65536, 256), (262144, 256)):
        t0 = time.time()
        hs = build_blocked_hot_segmented(indptr, src, hot_k=hot_k,
                                         num_segments=S,
                                         rows_per_block=wcold)
        ce = int(np.asarray(hs.cold.edge_src.shape).prod())
        he = int(np.asarray(hs.hot.edge_src.shape).prod())
        log(f"hot-split build (K={hot_k} W={wcold}): {time.time()-t0:.0f}s "
            f"— cold lanes {ce/1e6:.1f}M + hot lanes {he/1e6:.1f}M "
            f"(plain would be ~{E*1.03/1e6:.1f}M)")
        dt, cs = timed(chain(
            lambda g, xx: spmm_hot_split_segmented(g, xx, agg="mean")),
            hs, x)
        log(f"hot-split K={hot_k:6d} W={wcold:4d}: {dt*1e3:8.1f} ms/layer  "
            f"{E/dt/1e6:7.0f} Medge/s  ({base/dt:.2f}x vs plain, "
            f"compile {cs:.0f}s)")
        del hs


if __name__ == "__main__":
    main()
