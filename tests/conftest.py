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


# Markers: `slow` (measured >=10 s call time on the 1-core CI box, from
# tests/_slow_ids.py — except golden physics regressions, always fast-set)
# and `multichip` (exercises the 8-virtual-device mesh / shard_map).
# `pytest -m "not slow"` is the ~8-min smoke set covering golden physics
# plus at least one test per subsystem; the full suite is the merge gate.
_MULTICHIP_MODULES = ("test_ddstep.py", "test_parallel.py")


def pytest_collection_modifyitems(config, items):
    try:
        from _slow_ids import SLOW
    except ImportError:
        SLOW = {}
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in SLOW:
            item.add_marker(pytest.mark.slow)
        if rel.split("::")[0] in _MULTICHIP_MODULES:
            item.add_marker(pytest.mark.multichip)
