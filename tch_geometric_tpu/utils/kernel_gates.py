"""On-chip numerical gates for every Pallas kernel (VERDICT r3 item 2).

The interpret-mode tests (tests/test_attention_blocked.py) validate kernel
math on CPU, but real Mosaic lowering has diverged from interpret mode twice
in this project's history (BASELINE.md attention fix history: cross-tile
lane concatenates accepted by interpret and rejected/miscompiled on
hardware; 2-D/1-D stat blocks failing lowering).  This module runs each
production kernel ON THE ACTUAL BACKEND against a pure-XLA segment-op
reference and reports max-abs-error, so ``bench.py`` can certify
correctness of the exact binaries it times, and a ``tpu``-marked pytest
module can gate them in CI on real hardware.

Reference semantics: the XLA gather + segment_sum/segment_softmax path
(ops/segment.py), the same downstream-aggregation math the reference
delegates to PyG (SURVEY §2.3 / examples/neighbor_sampling.py:21-24).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _build_testbed(n: int = 4096, e: int = 65536, f: int = 128,
                   heads: int = 4, seed: int = 0):
    """Power-law graph + features sized to exercise multi-chunk, multi-block
    kernel paths while compiling fast through the remote-compile tunnel."""
    rng = np.random.default_rng(seed)
    pop = (1.0 / (np.arange(n) + 10.0)) ** 0.8
    pop /= pop.sum()
    src = rng.choice(n, size=e, p=pop).astype(np.int64)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int64)
    indptr = np.searchsorted(dst, np.arange(n + 1)).astype(np.int64)
    x = rng.normal(size=(n, f)).astype(np.float32)
    h = rng.normal(size=(n, heads, 32)).astype(np.float32)
    a_s = rng.normal(size=(n, heads)).astype(np.float32)
    a_d = rng.normal(size=(n, heads)).astype(np.float32)
    rows = np.repeat(np.arange(n), np.diff(indptr)).astype(np.int32)
    return indptr, src, rows, x, h, a_s, a_d


def _maxerr(a, b) -> float:
    return float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32)
                                 - jnp.asarray(b, jnp.float32))))


def run_kernel_gates(compute_dtype=jnp.float32,
                     n: int = 4096, e: int = 65536,
                     interpret: bool = False) -> Dict[str, float]:
    """Run every production Pallas kernel on the current default backend and
    return ``{kernel_name: max_abs_err}`` vs the XLA reference.

    ``compute_dtype=jnp.float32`` isolates lowering bugs from rounding;
    callers may re-run with ``jnp.bfloat16`` (the bench dtype) and a looser
    threshold.  All comparisons are jitted so the kernels run exactly as the
    benchmarks run them.  ``interpret=True`` exists only for CPU smoke
    tests of this harness itself — it defeats the purpose of the gate
    (catching real-Mosaic divergence) and must stay False on hardware.
    """
    # f32 exactness mode: TPU dots DEFAULT to bf16-precision MXU passes
    # even on f32 operands — every kernel's and reference's unannotated
    # matmul is traced under highest precision so the f32 gate checks TRUE
    # f32 math (this is how the round-4 gate caught the packed-GAT select
    # matmuls silently computing at bf16 on hardware).  The bf16 pass uses
    # the production default.
    import contextlib
    prec_ctx = (jax.default_matmul_precision("highest")
                if jnp.dtype(compute_dtype) == jnp.dtype(jnp.float32)
                else contextlib.nullcontext())
    with prec_ctx:
        return _run_kernel_gates_inner(compute_dtype, n, e, interpret)


def _run_kernel_gates_inner(compute_dtype, n, e, interpret):
    from ..ops.attention_blocked import (attend_blocked_flash,
                                         gat_attend_blocked,
                                         gat_attend_blocked_flash,
                                         gat_attend_blocked_packed,
                                         sddmm_blocked_pallas_v2)
    from ..ops.segment import segment_softmax, segment_sum
    from ..ops.spmm_blocked import (build_blocked, build_blocked_hot,
                                    build_blocked_hot_segmented)
    from ..ops.spmm_pallas import (spmm_blocked_auto, spmm_hot_split,
                                   spmm_hot_split_segmented)

    indptr, src, rows_np, x_np, h_np, a_s_np, a_d_np = _build_testbed(n, e)
    f = x_np.shape[-1]
    b = build_blocked(indptr, src, rows_per_block=256)
    hs = build_blocked_hot(indptr, src, hot_k=256, rows_per_block=256)
    hseg = build_blocked_hot_segmented(indptr, src, hot_k=256,
                                       num_segments=4, rows_per_block=256)
    x = jnp.asarray(x_np)
    rows = jnp.asarray(rows_np)
    srcj = jnp.asarray(src.astype(np.int32))
    deg = jnp.asarray(np.diff(indptr).astype(np.float32))

    errs: Dict[str, float] = {}

    # --- SpMM family: mean aggregation (the headline bench config) -------
    @jax.jit
    def ref_spmm(x):
        s = segment_sum(x[srcj], rows, n)
        return s / jnp.maximum(deg, 1.0)[:, None]

    ref = ref_spmm(x)
    # spmm_blocked_auto self-dispatches: Pallas on TPU, XLA blocked path
    # elsewhere (so the CPU smoke test exercises the XLA path here)
    out = jax.jit(lambda x: spmm_blocked_auto(
        b, x, agg="mean", compute_dtype=compute_dtype))(x)
    errs["spmm_blocked_auto"] = _maxerr(out[:n], ref)
    out = jax.jit(lambda x: spmm_hot_split(
        hs, x, agg="mean", compute_dtype=compute_dtype,
        interpret=interpret))(x)
    errs["spmm_hot_split"] = _maxerr(out[:n], ref)
    out = jax.jit(lambda x: spmm_hot_split_segmented(
        hseg, x, agg="mean", compute_dtype=compute_dtype,
        interpret=interpret))(x)
    errs["spmm_hot_split_segmented"] = _maxerr(out[:n], ref)

    # --- SDDMM v2: per-edge dst·src scores -------------------------------
    @jax.jit
    def ref_sddmm(x):
        return (x[rows] * x[srcj]).sum(-1)

    sref = ref_sddmm(x)
    eptr = jnp.asarray(np.asarray(b.edge_ptr))
    evalid = jnp.asarray(np.asarray(b.edge_valid))

    @jax.jit
    def run_sddmm(x):
        s = sddmm_blocked_pallas_v2(b, x, x, compute_dtype=compute_dtype,
                                    interpret=interpret)
        flat = s.reshape(-1)
        ev = evalid.reshape(-1)
        ep = jnp.clip(eptr.reshape(-1), 0, e - 1)
        return jnp.where(ev, flat - sref[ep], 0.0)

    errs["sddmm_blocked_pallas_v2"] = float(
        jnp.max(jnp.abs(run_sddmm(x))))

    # --- flash attend (single head), both stat variants ------------------
    @jax.jit
    def ref_attend(x):
        s = ref_sddmm(x) / np.sqrt(f).astype(np.float32)
        att = segment_softmax(s, rows, n)
        return segment_sum(x[srcj] * att[:, None], rows, n)

    aref = ref_attend(x)
    for rs in (True, False):
        out = jax.jit(lambda x, rs=rs: attend_blocked_flash(
            b, x, x, compute_dtype=compute_dtype, row_stats=rs,
            interpret=interpret))(x)
        errs[f"attend_blocked_flash[row_stats={rs}]"] = _maxerr(out[:n],
                                                                aref)

    # --- multi-head GAT: composed kernels and the flash variant ----------
    h = jnp.asarray(h_np)
    a_s = jnp.asarray(a_s_np)
    a_d = jnp.asarray(a_d_np)

    @jax.jit
    def ref_gat(h, a_s, a_d):
        logits = jax.nn.leaky_relu(a_s[srcj] + a_d[rows], 0.2)  # (E, H)
        outs = []
        for hd in range(h.shape[1]):
            att = segment_softmax(logits[:, hd], rows, n)
            outs.append(segment_sum(h[srcj, hd] * att[:, None], rows, n))
        return jnp.stack(outs, axis=1)                          # (N, H, d)

    gref = ref_gat(h, a_s, a_d)
    out = jax.jit(lambda h, a_s, a_d: gat_attend_blocked(
        b, h, a_s, a_d, compute_dtype=compute_dtype,
        interpret=interpret))(h, a_s, a_d)
    errs["gat_attend_blocked"] = _maxerr(out[:n], gref)
    out = jax.jit(lambda h, a_s, a_d: gat_attend_blocked_flash(
        b, h, a_s, a_d, compute_dtype=compute_dtype,
        interpret=interpret))(h, a_s, a_d)
    errs["gat_attend_blocked_flash"] = _maxerr(out[:n], gref)
    out = jax.jit(lambda h, a_s, a_d: gat_attend_blocked_packed(
        b, h, a_s, a_d, compute_dtype=compute_dtype,
        interpret=interpret))(h, a_s, a_d)
    errs["gat_attend_blocked_packed"] = _maxerr(out[:n], gref)

    return errs


# Thresholds: f32 kernels vs f32 XLA reference differ only by summation
# order (and the softmax exp/rescale path), NOT by precision class; bf16
# kernels round each product/accumulant to 8 mantissa bits.
F32_THRESHOLD = 5e-4
BF16_THRESHOLD = 0.25


def gate(errs: Dict[str, float], threshold: float) -> Tuple[bool, str]:
    """(all_pass, worst_description)."""
    worst = max(errs, key=lambda k: errs[k])
    ok = all(v <= threshold for v in errs.values())
    return ok, f"{worst}={errs[worst]:.2e}"
