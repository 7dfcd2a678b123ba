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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
