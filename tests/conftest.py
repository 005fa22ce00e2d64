"""Test harness: force CPU backend with 8 virtual devices.

Standard JAX practice for testing shard_map/pjit parallelism without a pod
(SURVEY.md §4): set platform flags BEFORE jax initializes.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The machine's sitecustomize force-registers the experimental `axon` TPU
# platform and prepends it to jax_platforms, overriding JAX_PLATFORMS=cpu.
# Updating the config before first backend use restores a CPU-only backend
# with 8 virtual devices for sharding tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache (same as the entry points): CPU compiles dominate
# suite wall time on this 1-core host — a warm cache cuts the default tier
# severalfold. Keyed by platform, so TPU entries are unaffected.
from dtt.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process spawn, etc.)")
