"""Test environment: force the CPU backend with a virtual 8-device mesh so
sharding tests run without TPU hardware.

The image pins ``JAX_PLATFORMS=axon`` (a tunneled TPU backend) via
sitecustomize, so plain env-var defaults don't stick — we override the jax
config directly before any backend is initialized.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable the persistent compilation cache here — XLA:CPU AOT
# artifacts reload with mismatched host machine features in this image and
# segfault ("Target machine feature +prefer-no-scatter is not supported").

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap cumulative XLA:CPU compiler state: hundreds of compiles in one
    process eventually segfault inside backend_compile (observed at ~150
    tests in); clearing the executable caches between modules avoids it."""
    yield
    jax.clear_caches()


@pytest.fixture(autouse=True)
def _seed_numpy():
    """Deterministic test data: unseeded np.random draws can land exactly on
    quantization-bin edges and flip assertions run-to-run."""
    import numpy as np

    np.random.seed(20260816)
