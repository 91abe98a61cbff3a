"""Test environment: force an 8-device virtual CPU mesh before JAX loads.

This is the JAX-native way to exercise multi-chip sharding logic without
TPU hardware (SURVEY.md §4.4): every test sees 8 'devices' backed by host
threads, so pjit/shard_map paths compile and run for real.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism and speed for tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's sitecustomize pins jax_platforms to the TPU tunnel
# ("axon,cpu"); tests must run on the virtual 8-device CPU backend. Set the
# env var too: framework entry modules re-apply JAX_PLATFORMS at import.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
