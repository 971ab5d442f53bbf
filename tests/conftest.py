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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
