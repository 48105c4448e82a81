"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests exercise a virtual 8-device CPU mesh (the driver
separately dry-runs the multi-chip path); real-TPU perf is bench.py's job.
Must set flags before jax initializes its backends.
"""

import os

# Force-override: the ambient environment pins JAX_PLATFORMS=axon (TPU
# tunnel); tests must run on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# belt-and-braces: pytest plugins (jaxtyping) import jax before this file
# runs, so pin the platform through the config API as well
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
