"""Test configuration: force an 8-device virtual CPU mesh so every sharding
test runs without TPU hardware.

Note: this image registers a TPU PJRT plugin from sitecustomize with
JAX_PLATFORMS baked at interpreter start, so env vars set here are too late —
we must go through jax.config before any backend initialization."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite is dominated by CPU jit compiles;
# warm runs drop from ~23 min to a few minutes
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
