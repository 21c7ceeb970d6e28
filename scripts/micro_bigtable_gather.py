"""Where is the big-table gather cliff, and can a hot/cold table split beat it?

BASELINE.md round-2 facts: 256 B-row gathers run ~380 Macc/s from <=64 MB
tables but only ~86 Macc/s from the 1.25 GB products feature table; and two
independent half-gathers from the SAME table are 2.5x worse than one gather.
The products-scale SpMM/trainer gathers are the cost center, so two design
questions decide the dedup/hot-split kernel (VERDICT r3 item 1):

  A. rate vs table size at constant access count — where is the cliff?
  B. one big gather of M accesses  VS  cold gather (M_cold from big table)
     + hot gather (M_hot from a compact hot table): does splitting pay the
     two-gather penalty, or is the penalty same-table-specific?

All rows: 256 B rows (F=128 bf16), 4.19M accesses total, K=6 chained
data-dependent iters inside one jit (defeats async dispatch), median of 3.
"""
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

K = 6
M = 1 << 22          # 4,194,304 accesses
F = 128


def timed(name, fn, *args, n_acc=M):
    # host scalar fetch = true barrier (block_until_ready on a remote
    # buffer does not guarantee execution completed through the tunnel)
    t0 = time.time()
    float(fn(*args))
    c = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / K
    print(f"{name:44s} {dt*1e3:8.2f} ms/iter  {n_acc/dt/1e6:7.0f} Macc/s"
          f"  (compile {c:.0f}s)", flush=True)
    return dt


def gather_fn(table_rows):
    @jax.jit
    def f(xb, idx):
        def body(c, _):
            shift = jnp.int32(jnp.abs(c)) % table_rows
            return xb[(idx + shift) % table_rows].sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c
    return f


def split_fn(big_rows, hot_rows):
    @jax.jit
    def f(xb, xh, idx_cold, idx_hot):
        def body(c, _):
            shift = jnp.int32(jnp.abs(c))
            a = xb[(idx_cold + shift % big_rows) % big_rows].sum()
            b = xh[(idx_hot + shift % hot_rows) % hot_rows].sum()
            return (a + b).astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c
    return f


def main():
    key = jax.random.key(0)
    print("== A. rate vs table size (4.19M accesses, 256 B rows) ==")
    for n_rows, label in [(1 << 18, "64 MB"), (1 << 19, "128 MB"),
                          (1 << 20, "256 MB"), (1 << 21, "512 MB"),
                          (2449029, "627 MB (products N)"),
                          (1 << 22, "1 GB")]:
        xb = jax.random.normal(key, (n_rows, F), jnp.bfloat16)
        idx = jax.random.randint(jax.random.key(n_rows), (M,), 0, n_rows,
                                 jnp.int32)
        timed(f"gather {label}", gather_fn(n_rows), xb, idx)
        del xb, idx

    print("\n== B. hot/cold split at products-like skew ==")
    N = 2449029
    xb = jax.random.normal(key, (N, F), jnp.bfloat16)
    idx = jax.random.randint(jax.random.key(1), (M,), 0, N, jnp.int32)
    timed("one gather, 627 MB, 4.19M acc", gather_fn(N), xb, idx)

    for hot_frac, hot_rows, label in [
            (0.31, 1 << 14, "31% hot -> 4 MB table"),
            (0.31, 1 << 16, "31% hot -> 16 MB table"),
            (0.44, 1 << 16, "44% hot -> 16 MB table")]:
        Mh = int(M * hot_frac) // 128 * 128
        Mc = M - Mh
        xh = jax.random.normal(key, (hot_rows, F), jnp.bfloat16)
        ic = jax.random.randint(jax.random.key(2), (Mc,), 0, N, jnp.int32)
        ih = jax.random.randint(jax.random.key(3), (Mh,), 0, hot_rows,
                                jnp.int32)
        timed(f"split {label} ({Mc/1e6:.1f}M cold + {Mh/1e6:.1f}M hot)",
              split_fn(N, hot_rows), xb, xh, ic, ih)
        del xh, ic, ih

    # same-table split control (the round-2 2.5x penalty, reproduced here
    # so A/B rows are comparable within one harness)
    ic = jax.random.randint(jax.random.key(4), (M // 2,), 0, N, jnp.int32)
    ih = jax.random.randint(jax.random.key(5), (M - M // 2,), 0, N, jnp.int32)
    timed("control: two half-gathers, SAME table", split_fn(N, N),
          xb, xb, ic, ih)


if __name__ == "__main__":
    main()
