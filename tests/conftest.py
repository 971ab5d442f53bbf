"""Test config: force CPU backend with a virtual 8-device mesh so CI needs
no TPU; sharding tests exercise real pjit/shard_map partitioning."""

import os

# Force-set: the environment may pin JAX_PLATFORMS to a TPU plugin.
# TRIDENT_TPU_TESTS=1 keeps the real backend instead (the hardware-gated
# parity tests in test_raster_tpu.py run only then).
if not os.environ.get("TRIDENT_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the SPMD tests are compile-bound (the
# banded shard_map graphs take 1-4 min EACH to build on a loaded machine);
# cached repeat runs bring the whole suite back under the documented ~6 min.
import jax as _jax

_jax.config.update("jax_compilation_cache_dir",
                   os.environ.get("TRIDENT_JAX_CACHE",
                                  "/tmp/trident_jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
