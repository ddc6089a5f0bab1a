"""
Test configuration: run everything on a virtual 8-device CPU mesh in f64.

Mirrors the strategy mandated for TPU-targeted code: correctness is checked
on CPU with x64; sharding tests use the 8 virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("VF_FEM_TPU_X64", "1")

import numpy as np
import pytest

import jax

# NOTE: the environment's sitecustomize imports jax at interpreter startup
# (axon TPU plugin), so JAX_PLATFORMS in os.environ is read too early to
# help; the config update below is what actually forces CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
