"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding layer is exercised without TPU hardware (per SURVEY.md
section 4 point 7).

Note: the environment's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (the remote-TPU tunnel), so we must update jax's config
directly — mutating os.environ alone is too late."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
