"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
imports so multi-chip sharding tests run without TPU hardware."""

import os

# Force CPU with 8 virtual devices (the ambient environment may point JAX at
# a TPU and may override jax_platforms from sitecustomize, so set both the
# env var AND the config); set PERO_TEST_TPU=1 to run on real hardware.
if not os.environ.get("PERO_TEST_TPU"):
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
    return np.random.RandomState(1234)
