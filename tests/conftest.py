"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Both the env-var and the programmatic routes are used: pytest plugins (e.g.
jaxtyping) may import jax before this conftest runs, in which case the env
vars are too late — but jax.config updates still apply as long as the
backend has not been initialized (no jax.devices() call yet).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# The platform's default matmul precision is reduced (bf16-like passes);
# parity tests compare against float64/numpy oracles, so pin full precision.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the train-step tests compile large graphs;
# cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pytest_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
