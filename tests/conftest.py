"""Test configuration: force an 8-virtual-device CPU JAX platform.

Multi-chip sharding logic is exercised on a virtual CPU mesh (the driver
separately dry-runs the multichip path); Pallas kernels run in interpreter
mode on CPU.  Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the axon TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter start, so the env vars
# above can arrive after import — force the platform via config too (the
# backend itself initialises lazily, so this still takes effect).
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_protein(rng, n):
    """Random encoded protein sequence (codes 0..22)."""
    return rng.integers(0, 23, size=n, dtype=np.int8)
