"""On-hardware test tier: runs on whatever real accelerator JAX finds.

Unlike tests/ (which pins an 8-device virtual CPU mesh), this tier does NOT
force a platform — invoke it explicitly on a TPU host:

    python -m pytest tests_tpu/ -q

The driver's bench run covers the same gates (bench.py calls
utils.kernel_gates and embeds the errors in the BENCH json); this tier is
the CI-shaped equivalent for real-hardware checkouts.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent cache: repeat runs skip the slow remote compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
