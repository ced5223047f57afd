"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run fast and without TPU hardware.

Note: the environment's sitecustomize imports jax and registers a remote TPU
('axon') backend before conftest runs, so JAX_PLATFORMS env edits are too
late — use jax.config.update instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0xC0FFEE)
