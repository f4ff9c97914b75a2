"""Test configuration: force a virtual 8-device CPU mesh.

Logic/parity tests run on the CPU backend; mesh-sharding tests use the 8
virtual devices (SURVEY.md section 4 "multi-node testing").

Note: the environment's sitecustomize pre-imports jax (TPU tunnel), so
JAX_PLATFORMS in os.environ is too late here — the platform must be forced
through jax.config AFTER import. XLA_FLAGS is still honored at backend
initialization, which hasn't happened yet at conftest time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
