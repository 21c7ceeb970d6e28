"""SpMM roofline decomposition: where is the hardware ceiling?

BENCH_r01 left SpMM at ~0.35 Gedge/s = ~22% of the 819 GB/s HBM peak.
This script establishes the *achievable* ceiling for the access pattern the
workload actually has (random 256-512 B row fetches from a ~70-130 MB
table), then places the kernel against it:

  A. stream-read speed of light        (contiguous, the 819 GB/s regime)
  B. pure gather, read side only       (gather fused into a reduction)
  C. pure gather, materialized         (read + write of the gathered tensor)
  D. sequential-index gather           (isolates engine issue rate from
                                        DRAM-page randomness)
  E. fp32 512 B-row random gather      (access-rate vs bandwidth bound?)
  F. 1024 B-row random gather          (widening the access)
  G. spmm_blocked_auto end to end      (the product)

If D >> B the limit is DRAM randomness (nothing a kernel can do about the
gather itself); if D ~= B the limit is the gather engine's issue rate and
multi-row DMA batching could win.  Reference context: the aggregation the
reference delegates to PyG (`/root/reference/examples/neighbor_sampling.py:21-24`).

Run: python scripts/bench_spmm_roofline.py
"""
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, ".")

N = 1 << 18
E = 1 << 22
F = 128
K = 8          # chained iterations inside one jit


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps=3):
    """K-chained jitted scalar-returning fn; median of reps, per iteration."""
    f = jax.jit(fn)
    t0 = time.time()
    float(f(*args))
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K, compile_s


def chain_gather(x, idx):
    """K data-dependent gathers fused into reductions (no materialization)."""
    n = x.shape[0]

    def body(c, _):
        shift = jnp.int32(jnp.abs(c)) % n          # data-dependent, defeats CSE
        s = x[(idx + shift) % n].sum()
        return s.astype(jnp.float32), None

    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
    return c


def chain_gather_mat(x, idx):
    """K gathers each materialized (forced by per-row post-op then reduce)."""
    n = x.shape[0]

    def body(c, _):
        shift = jnp.int32(jnp.abs(c)) % n
        g = x[(idx + shift) % n]
        # per-row mult forces the (E, F) tensor to exist before reduction
        g = g * (1.0 + c * 0)
        s = jax.lax.stop_gradient(g).sum()
        return s.astype(jnp.float32), None

    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
    return c


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # ---- A. stream read ----------------------------------------------------
    big = jnp.asarray(rng.normal(size=(E, F // 2)).astype(np.float32))  # 1.07 GB

    def stream(x):
        def body(c, _):
            return (x.sum() + c * 1e-30).astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    dt, cs = timed(stream, big)
    bytes_ = E * (F // 2) * 4
    bw_stream = bytes_ / dt / 1e9
    log(f"A stream read        : {dt*1e3:7.2f} ms  {bw_stream:7.1f} GB/s  (compile {cs:.0f}s)")

    # ---- gather variants ---------------------------------------------------
    idx = jnp.asarray(rng.integers(0, N, E, dtype=np.int32))
    idx_seq = jnp.asarray((np.arange(E, dtype=np.int64) % N).astype(np.int32))

    xb = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32)).astype(jnp.bfloat16)
    xf = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    xw = jnp.asarray(rng.normal(size=(N, 2 * F)).astype(np.float32))

    rows = [
        ("B gather bf16 256B random", xb, idx, chain_gather, 256),
        ("C gather bf16 256B random materialized", xb, idx, chain_gather_mat, 256),
        ("D gather bf16 256B sequential", xb, idx_seq, chain_gather, 256),
        ("E gather fp32 512B random", xf, idx, chain_gather, 512),
        ("F gather fp32 1024B random", xw, idx, chain_gather, 1024),
    ]
    results = {}
    for name, x, i, fn, rowb in rows:
        dt, cs = timed(fn, x, i)
        acc_rate = E / dt / 1e6
        bw = E * rowb / dt / 1e9
        results[name[0]] = dt
        log(f"{name:42s}: {dt*1e3:7.2f} ms  {acc_rate:7.1f} Macc/s  {bw:7.1f} GB/s  (compile {cs:.0f}s)")

    # ---- G. the product ----------------------------------------------------
    from tch_geometric_tpu.ops.spmm_blocked import build_blocked
    from tch_geometric_tpu.ops.spmm_pallas import spmm_blocked_auto

    dst = rng.integers(0, N, E, dtype=np.int64)
    src = rng.integers(0, N, E, dtype=np.int64)
    order = np.argsort(dst, kind="stable")
    dst, src = dst[order], src[order]
    indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int32)
    g = build_blocked(indptr, src.astype(np.int32), rows_per_block=128)
    T, C = g.edge_src.shape
    padded = T * C
    log(f"blocked layout: T={T} C={C} padded={padded} pad_ratio={padded/E:.3f}")

    x0 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    def spmm_chain(gg, x):
        def body(h, _):
            return spmm_blocked_auto(gg, h, agg="mean").astype(jnp.float32), None
        h, _ = jax.lax.scan(body, x, None, length=K)
        return h.sum()

    dt, cs = timed(spmm_chain, g, x0)
    log(f"G spmm_blocked_auto  : {dt*1e3:7.2f} ms  {E/dt/1e9:7.3f} Gedge/s  (compile {cs:.0f}s)")

    # the honest roofline: the same padded multiset of row fetches, pure
    padded_idx = g.edge_src.reshape(-1)
    dt_floor, _ = timed(chain_gather, x0.astype(jnp.bfloat16), padded_idx)
    log(f"H gather floor (padded idx, bf16): {dt_floor*1e3:7.2f} ms  "
        f"{padded/dt_floor/1e6:7.1f} Macc/s")
    log(f"==> kernel at {dt_floor/dt*100:.1f}% of its own gather floor; "
        f"gather floor at {E*256/dt_floor/1e9/bw_stream*100 if bw_stream else 0:.1f}%"
        f" of stream bandwidth")

    # ---- I. engine parallelism: two independent half-gathers ------------
    def chain_gather2(x, idx):
        n = x.shape[0]
        h = idx.shape[0] // 2
        i1, i2 = idx[:h], idx[h:]

        def body(c, _):
            shift = jnp.int32(jnp.abs(c)) % n
            s = x[(i1 + shift) % n].sum() + x[(i2 + shift + 1) % n].sum()
            return s.astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    dt2, _ = timed(chain_gather2, xb, idx)
    log(f"I two half-gathers   : {dt2*1e3:7.2f} ms  {E/dt2/1e6:7.1f} Macc/s "
        f"(parallel engines iff >> B)")

    # ---- J/K. table-size scaling: small tables + hot-prefix --------------
    for nbits, tag in ((14, "J 4MB table"), (16, "16MB table"),
                       (17, "32MB table")):
        nn = 1 << nbits
        xs = jnp.asarray(rng.normal(size=(nn, F)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        idx_s = jnp.asarray(rng.integers(0, nn, E, dtype=np.int32))
        dts, _ = timed(chain_gather, xs, idx_s)
        log(f"{tag:21s}: {dts*1e3:7.2f} ms  {E/dts/1e6:7.1f} Macc/s  "
            f"{E*256/dts/1e9:7.1f} GB/s")

    # hot-prefix: 64MB table, 80% of accesses in the first 4MB
    idx_hot = np.where(rng.random(E) < 0.8,
                       rng.integers(0, 1 << 14, E),
                       rng.integers(0, N, E)).astype(np.int32)
    dth, _ = timed(chain_gather, xb, jnp.asarray(idx_hot))
    log(f"K hot-prefix 80/4MB  : {dth*1e3:7.2f} ms  {E/dth/1e6:7.1f} Macc/s")

    # ---- L. W=256 blocked layout (padding lever) -------------------------
    g256 = build_blocked(indptr, src.astype(np.int32), rows_per_block=256)
    T2, C2 = g256.edge_src.shape
    log(f"W=256 layout: T={T2} C={C2} pad_ratio={T2*C2/E:.3f}")
    dtl, _ = timed(spmm_chain, g256, x0)
    log(f"L spmm W=256         : {dtl*1e3:7.2f} ms  {E/dtl/1e9:7.3f} Gedge/s")


if __name__ == "__main__":
    main()
