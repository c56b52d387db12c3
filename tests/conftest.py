"""Test harness: run everything on a virtual 8-device CPU mesh.

The XLA CPU backend is the 'fake backend' — the same jitted code runs on CPU in
CI and on TPU in production (SURVEY §4 implication). Must set env before jax
import.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; the config update does force CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
