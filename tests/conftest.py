"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Tests must not require TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh.  Note the environment presets ``JAX_PLATFORMS=axon`` (the
TPU tunnel plugin registered from sitecustomize), so we must override the
platform via jax.config *after* import — env vars alone are not enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
