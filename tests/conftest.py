"""Test environment: 8 virtual CPU devices (SURVEY.md §4.3).

Tests run the distributed code paths (shard_map DP training, GSPMD
halo-exchange inference) on a fake 8-device CPU mesh, per the build rules
("test sharding on a virtual 8-device CPU mesh").

Platform selection note: this image's sitecustomize registers the axon TPU
PJRT plugin in EVERY python process and force-sets
``jax.config.jax_platforms = "axon,cpu"`` — env vars alone cannot override
it. So the override happens at the jax.config level here, before any backend
initializes. Set TPUSEG_TEST_TPU=1 to run the suite single-device on the real
chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("TPUSEG_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
