"""Test configuration: run all tests on an 8-device virtual CPU mesh.

This is the standard JAX substitute for multi-device testing without
hardware (SURVEY.md §4): sharding/collective code paths compile and execute
exactly as on a TPU slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var set this late;
# the config flag wins (verified: env alone still yields the TPU device).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
