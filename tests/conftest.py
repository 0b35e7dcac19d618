"""Test configuration: hermetic CPU backend with a virtual 8-device mesh.

Note: under the axon TPU tunnel the JAX_PLATFORMS *env var* is ignored, so
we must force the CPU backend through jax.config before any computation
(SURVEY.md §4: multi-device tests without a cluster via
xla_force_host_platform_device_count).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on CPU"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
