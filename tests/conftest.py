"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding is validated on a host-platform device mesh
(xla_force_host_platform_device_count), per the multi-chip test strategy in
SURVEY.md §4/§5.
"""

import os
import sys

# Force the CPU backend: the session environment pins JAX_PLATFORMS=axon (a
# tunneled TPU with remote compilation), which makes unit tests slow and flaky.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# keep the axon PJRT plugin from even being discovered during tests
sys.path = [p for p in sys.path if ".axon_site" not in p]

# The axon sitecustomize runs register() at interpreter start, which force-sets
# jax_platforms="axon,cpu" via jax.config (trumping the env var). Override it
# back before any computation so tests really run on the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
