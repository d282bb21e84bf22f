"""Test config: force an 8-device virtual CPU platform BEFORE jax imports.

Multi-device sharding is validated on a simulated mesh
(xla_force_host_platform_device_count), the pattern the reference entirely
lacks (SURVEY.md §4: no multi-device tests exist for make_parallel).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize force-registers a TPU PJRT plugin and pre-empts
# JAX_PLATFORMS; the config update below reliably pins tests to CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() >= 8, "virtual 8-device CPU mesh not active"


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
