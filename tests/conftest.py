"""Test configuration: force an 8-device virtual CPU mesh.

Real-TPU runs happen via bench.py; tests validate semantics and sharding on
the host platform (the axon sitecustomize registers a remote-TPU backend at
interpreter start, so the platform must be forced back to CPU here, before
any test touches jax)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
