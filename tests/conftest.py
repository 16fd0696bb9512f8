"""Test configuration: force an 8-device virtual CPU platform.

Tests must exercise multi-chip sharding without TPU hardware (SURVEY.md §4),
so we pin JAX to CPU with 8 virtual devices BEFORE jax initializes. Benchmarks
(bench.py / test.py) run on the real chip and do not import this conftest.
"""

import os

# Force-override: the session environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must NOT compete for the single chip.
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
    return np.random.default_rng(42)
