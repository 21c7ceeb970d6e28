"""The on-chip kernel-gate harness itself, smoke-tested on CPU.

The real gate runs on hardware (bench.py + tests_tpu/) — interpret mode
cannot catch Mosaic lowering divergence.  This pins the harness's
reference math and plumbing so a broken gate can't silently pass/fail on
the TPU host.
"""
import jax.numpy as jnp

from tch_geometric_tpu.utils.kernel_gates import (F32_THRESHOLD, gate,
                                                  run_kernel_gates)


def test_gate_harness_interpret_f32():
    errs = run_kernel_gates(compute_dtype=jnp.float32, n=1024, e=16384,
                            interpret=True)
    # every production kernel is covered
    for k in ("spmm_blocked_auto", "spmm_hot_split",
              "spmm_hot_split_segmented", "sddmm_blocked_pallas_v2",
              "attend_blocked_flash[row_stats=True]",
              "attend_blocked_flash[row_stats=False]",
              "gat_attend_blocked", "gat_attend_blocked_flash",
              "gat_attend_blocked_packed"):
        assert k in errs, k
    ok, worst = gate(errs, F32_THRESHOLD)
    assert ok, worst
