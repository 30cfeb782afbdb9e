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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound accumulated XLA:CPU compiler state.

    With 300+ tests in one process, XLA:CPU intermittently segfaults
    while COMPILING late in the run (observed twice at ~92%, inside
    backend_compile_and_load / the cache-write path, always on the first
    fresh compile of a large pipeline after ~270 prior tests).  Dropping
    live executables between modules keeps the process below the poison
    threshold; modules are compile-wise self-contained, so the cost is
    only cross-module executable reuse."""
    yield
    jax.clear_caches()
