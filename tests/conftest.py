"""Test config: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding logic is validated on host CPU devices
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
dryrun_multichip; real-TPU numerics are covered by bench.py runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# NOTE: the env may pre-register a TPU backend via sitecustomize and force
# JAX_PLATFORMS — the config update below wins over both.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
