"""On-chip numerical gates for every production Pallas kernel.

interpret=True kernel tests (tests/test_attention_blocked.py) cannot catch
real-Mosaic lowering divergence — the bug class that has bitten twice here
(BASELINE.md attention fix history).  These tests run the kernels on the
REAL backend against the pure-XLA segment-op reference (the aggregation
semantics the reference delegates to PyG,
/root/reference/examples/neighbor_sampling.py:21-24).
"""
import jax
import jax.numpy as jnp
import pytest

from tch_geometric_tpu.utils.kernel_gates import (BF16_THRESHOLD,
                                                  F32_THRESHOLD, gate,
                                                  run_kernel_gates)

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs real TPU hardware (found %s)" % jax.default_backend())


@requires_tpu
@pytest.mark.tpu
def test_kernels_f32_match_xla_on_chip():
    errs = run_kernel_gates(compute_dtype=jnp.float32)
    ok, worst = gate(errs, F32_THRESHOLD)
    assert ok, f"f32 kernel gate failed on hardware: {worst} ({errs})"


@requires_tpu
@pytest.mark.tpu
def test_kernels_bf16_within_rounding_on_chip():
    errs = run_kernel_gates(compute_dtype=jnp.bfloat16)
    ok, worst = gate(errs, BF16_THRESHOLD)
    assert ok, f"bf16 kernel gate failed on hardware: {worst} ({errs})"
