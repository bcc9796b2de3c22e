"""Test harness: force CPU with 8 virtual devices BEFORE jax initializes.

The container's default JAX platform is the axon TPU tunnel
(JAX_PLATFORMS=axon); tests must run hermetically on the host CPU with a
virtual 8-device mesh so that multi-chip sharding paths compile and execute
without real chips.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
    yield


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
