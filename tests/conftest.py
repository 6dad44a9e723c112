"""Test config: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding logic is validated on host CPU devices
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
dryrun_multichip; real-TPU numerics are covered by bench.py runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA CPU collectives abort the process (F-level) if all device threads
    # don't reach a rendezvous within 40s; on a loaded 1-core host the 8
    # virtual device threads can easily be scheduled further apart than that.
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
os.environ["XLA_FLAGS"] = flags

import jax

# NOTE: the env may pre-register a TPU backend via sitecustomize and force
# JAX_PLATFORMS — the config update below wins over both.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: almost all of the suite's wall clock is XLA
# recompiling the same programs every run (tests/test_multihost.py workers
# already rely on this). Second full run drops from ~19 min to minutes.
_CACHE_DIR = os.environ.get("GDRNET_TEST_CACHE",
                            "/tmp/gdrnet_xla_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
