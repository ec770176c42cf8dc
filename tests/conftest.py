"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding behavior is validated on host CPU devices
(xla_force_host_platform_device_count), per the reference-rebuild test
strategy (SURVEY.md §4): the reference had no distributed tests at all.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pre-register an external TPU plugin (JAX_PLATFORMS is
# overridden at interpreter start); force the CPU backend after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the suite is dominated by XLA compile time
# (every rasterizer/engine jit at a new shape); cache hits make re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
