"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run on a virtual
CPU mesh per SURVEY.md §4 ("multi-host tests can run on CPU with
--xla_force_host_platform_device_count").  Must run before jax import.
"""
import os
import sys

# NOTE: a site-packages .pth hook pre-imports jax (the axon plugin) at
# interpreter startup, so env vars set here are too late for jax's config
# defaults.  jax.config.update BEFORE first backend use is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"          # for any subprocesses
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent compilation cache: repeat test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def karate():
    from tch_geometric_tpu.data.io import load_karate_graph
    return load_karate_graph()


@pytest.fixture(scope="session")
def fake_dataset():
    from tch_geometric_tpu.data.io import load_fake_dataset
    return load_fake_dataset()


@pytest.fixture(scope="session")
def fake_hetero():
    from tch_geometric_tpu.data.io import load_fake_hetero_graph
    return load_fake_hetero_graph()
