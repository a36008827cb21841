"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first jax import anywhere in the test process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment pre-sets JAX_PLATFORMS=axon (real TPU) and the axon
# sitecustomize merges it back in — the config update is the reliable override
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
