"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

import jax

# The platform's default matmul precision is reduced (bf16-like passes);
# parity tests compare against float64/numpy oracles, so pin full precision.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)
