"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices so mesh/sharding and
collective tests run without TPU hardware (SURVEY.md §4.4). Must run before
jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may have imported jax already (registering
# a TPU backend before this file runs), so the env var alone is not enough —
# update the live config too. Backends are created lazily, so this still
# takes effect as long as no array op has run yet.
import jax

jax.config.update("jax_platforms", "cpu")

# Compilation dominates the suite's wall time on this 1-core host; the
# persistent cache makes repeat runs (CI, driver re-runs) pay it once.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/nspeech_jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
