"""Test configuration: run on CPU with a virtual 8-device mesh.

This gives the multi-chip sharding tests something to shard over without
TPU hardware — the trick the reference framework had no equivalent of
(its distributed paths were only exercisable on a live GPU cluster).

Note: this machine's interpreter registers a TPU PJRT plugin at startup
(sitecustomize), so the JAX_PLATFORMS env var alone is not enough; we
override the platform through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite recompiles the same jitted
# graphs (backbone, train steps, RANSAC) every session — caching them on
# disk cuts the fast tier's wall clock severalfold on repeat runs.
_CACHE_DIR = os.environ.get(
    "FAR_TPU_TEST_CACHE", os.path.expanduser("~/.cache/far_tpu_xla_tests"))
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
