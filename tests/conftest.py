"""Test environment: 8 virtual CPU devices (SURVEY.md §4.3).

Must set env BEFORE jax is imported anywhere: tests run the distributed code
paths (shard_map DP training, GSPMD halo-exchange inference) on a fake
8-device CPU mesh, per the build rules ("test sharding on a virtual 8-device
CPU mesh").
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_debug_nans", False)  # flipped on in specific tests

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
