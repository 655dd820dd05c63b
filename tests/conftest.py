"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require the real TPU chip; sharding tests use
``--xla_force_host_platform_device_count=8`` (the driver separately
dry-run-compiles the multi-chip path via ``__graft_entry__.dryrun_multichip``).
"""
import os

# The environment presets JAX_PLATFORMS=axon (real TPU via a tunnel) and a
# sitecustomize module imports jax at interpreter startup — so setting env
# vars here is not enough; we must also update jax.config directly before
# any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
