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
# persistent compilation cache: the suite's cost is dominated by jit
# compiles of many small unique shapes — cache them across runs
_cache_dir = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
