"""Test configuration: force CPU with 8 virtual devices BEFORE jax imports.

This is the idiomatic JAX substitute for a fake distributed backend: pjit /
sharding tests run on an 8-device host-platform mesh without TPUs
(SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the TPU PJRT plugin and pins
# jax_platforms before user code runs; override it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
