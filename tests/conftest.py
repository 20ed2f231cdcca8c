"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

This lets sharding/pjit tests exercise real multi-device code paths without
TPU hardware (the driver separately dry-runs the multi-chip path).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests run on the virtual CPU mesh
# force EXACTLY 8 virtual devices, replacing any pre-existing count — a
# CI image exporting a different value would silently run the sharding
# tests single-device
flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax

# the axon TPU plugin overrides JAX_PLATFORMS at import; force CPU explicitly
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
