"""Test config: force JAX onto a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 implication).

Note: the environment's axon site hook rewrites ``jax_platforms`` to
'axon,cpu' AFTER reading JAX_PLATFORMS, so the env var alone is not enough —
the config must be updated explicitly before backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
