"""Multi-host (multi-process) execution: SURVEY §2.5 communication backend.

Runs the correctness rig (scripts/run_multihost.py): 2 real OS processes x
2 virtual CPU devices each, ``jax.distributed.initialize`` + Gloo
collectives, the config-5 sampler family (neighbor/budget/CTDNE) over the
partitioned graph + one partitioned-trainer step — and asserts every result
is BIT-IDENTICAL to the 1-process x 4-device run.  This is the
device-count-invariance contract extended across process boundaries.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multihost_bit_identical_2x2_vs_1x4():
    env = dict(os.environ)
    # the rig sets its own per-worker XLA_FLAGS/JAX_PLATFORM env
    env.pop("XLA_FLAGS", None)
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_multihost.py"),
         "--port", "12543"],
        capture_output=True, text=True, timeout=560, cwd=REPO, env=env)
    assert rc.returncode == 0, rc.stdout[-2000:] + rc.stderr[-2000:]
    assert "bit-identical" in rc.stdout, rc.stdout[-2000:]


def test_make_mesh_single_process_shapes():
    """make_mesh outside a distributed context: plain local mesh."""
    from tch_geometric_tpu.parallel.multihost import make_mesh
    m = make_mesh(("data",))
    import jax
    assert m.shape["data"] == len(jax.devices())
    m2 = make_mesh(("data", "model"), ici_shape=(2, 4))
    assert m2.shape == {"data": 2, "model": 4}


def test_local_seed_shard_single():
    from tch_geometric_tpu.parallel.multihost import local_seed_shard
    lo, hi = local_seed_shard(100)
    assert (lo, hi) == (0, 100)
