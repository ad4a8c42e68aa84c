"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (the
`xla_force_host_platform_device_count` fake-mesh strategy from SURVEY §4).

Note: this environment pre-sets JAX_PLATFORMS=axon (TPU tunnel), which wins
over os.environ edits — jax.config.update is the reliable override.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def np_rng():
    return np.random.default_rng(1984)
