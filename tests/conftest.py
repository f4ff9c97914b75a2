"""Test configuration: force a virtual 8-device CPU mesh before jax import.

Logic/parity tests run on the CPU backend; mesh-sharding tests use the 8
virtual devices (SURVEY.md section 4 "multi-node testing").
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
