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


# The full suite compiles several hundred XLA programs in one process;
# letting them all stay live eventually segfaults the CPU backend's
# compiler (deterministically, in whatever large program compiles last
# — observed in jaxlib 0.9.0 at ~320 tests; each half of the suite
# passes alone).  Dropping executables at module boundaries bounds the
# accumulation; cross-module cache reuse only costs recompiles of the
# small shared helpers.
_last_module = [None]


@pytest.fixture(autouse=True)
def _bound_live_executables(request):
    mod = getattr(request, "module", None)
    name = getattr(mod, "__name__", None)
    if name is not None and _last_module[0] not in (None, name):
        jax.clear_caches()
    if name is not None:
        _last_module[0] = name
    yield
