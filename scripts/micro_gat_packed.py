"""Multi-head GAT attend: composed vs flash vs HEAD-PACKED flash (r4 #5).

Production shape class (N=262k, E=4.19M, F=H*D=128, H=4, d=32).  Timing is
K data-dependent chained iterations inside one jit (BASELINE.md: a
loop-invariant harness over-reports by 2x through the tunnel).  Also prints
the 1-gather floor (pure gather of the widened (T, C, H*D+H) multiset) so
the winner can be stated as a % of an explicit floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from tch_geometric_tpu.ops.attention_blocked import (
    gat_attend_blocked, gat_attend_blocked_flash, gat_attend_blocked_packed)
from tch_geometric_tpu.ops.spmm_blocked import build_blocked

N = 1 << 18
E = 1 << 22
H, D = 4, 32
K = 8

rng = np.random.default_rng(0)
dst = np.sort(rng.integers(0, N, E))
src = rng.integers(0, N, E)
indptr = np.searchsorted(dst, np.arange(N + 1)).astype(np.int64)
W = int(os.environ.get("GAT_W", "128"))
CE = os.environ.get("GAT_CHUNK")
b = build_blocked(indptr, src.astype(np.int64), rows_per_block=W,
                  **({"chunk_edges": int(CE)} if CE else {}))
h = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
a_s = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
a_d = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
print("device:", jax.devices()[0], "blocks:", b.num_blocks,
      "chunks:", b.edge_src.shape, flush=True)


def bench(name, fn, check_against=None):
    @jax.jit
    def chain(h, a_s, a_d):
        def body(c, _):
            out = fn(b, c, a_s, a_d)          # (N, H, D) f32
            return (c + 1e-6 * out[: N]).astype(h.dtype), None
        hh, _ = jax.lax.scan(body, h, None, length=K)
        return hh.sum()

    t0 = time.time()
    float(chain(h, a_s, a_d))
    print(f"  [{name}] compile+run {time.time()-t0:.1f}s", flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(h, a_s, a_d))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1e3
    out = None
    if check_against is not None:
        out = np.asarray(fn(b, h, a_s, a_d))
        err = np.max(np.abs(out - check_against))
        print(f"{name:10s} {ms:7.2f} ms  max|err| vs composed {err:.2e}",
              flush=True)
    else:
        print(f"{name:10s} {ms:7.2f} ms", flush=True)
    return ms, out


# 1-gather floor: the widened fetch multiset as a pure gather
hw = jnp.concatenate([h.reshape(N, H * D).astype(jnp.bfloat16),
                      a_s.astype(jnp.bfloat16)], axis=-1)
idx = b.edge_src.reshape(-1)


@jax.jit
def floor_chain(hw, idx):
    def body(c, _):
        shift = jnp.int32(jnp.abs(c)) % N
        return hw[(idx + shift) % N].sum().astype(jnp.float32), None
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
    return c


float(floor_chain(hw, idx))
best = np.inf
for _ in range(3):
    t0 = time.perf_counter()
    float(floor_chain(hw, idx))
    best = min(best, time.perf_counter() - t0)
floor_ms = best / K * 1e3
print(f"1-gather floor (widened multiset): {floor_ms:.2f} ms", flush=True)

ms_c, ref = bench("composed", gat_attend_blocked, check_against=None)
ref = np.asarray(gat_attend_blocked(b, h, a_s, a_d))
ms_p, _ = bench("packed", gat_attend_blocked_packed, check_against=ref)
if os.environ.get("GAT_RUN_FLASH"):
    ms_f, _ = bench("flash", gat_attend_blocked_flash, check_against=ref)
print(f"composed {ms_c:.2f} ms ({floor_ms/ms_c*100:.0f}% of floor) | "
      f"packed {ms_p:.2f} ms ({floor_ms/ms_p*100:.0f}% of floor, "
      f"{ms_c/ms_p:.2f}x vs composed)", flush=True)
