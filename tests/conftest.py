"""Test bootstrap: force the CPU backend with 8 virtual devices.

The full suite must run without a TPU (SURVEY.md §4): single-host determinism
on CPU, and multi-chip sharding logic exercised on a virtual 8-device mesh.
Must run before any jax import in the tests.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; jax.config wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the sim step is a large graph; caching keeps
# repeated test runs fast on the single-core CI host.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
