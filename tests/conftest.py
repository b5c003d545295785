"""Test harness config: force CPU JAX with a virtual 8-device mesh.

The container's sitecustomize pins the axon TPU platform; tests must run
on CPU (and exercise multi-device sharding on fake devices), so the
platform is switched in-process before any jax use.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
