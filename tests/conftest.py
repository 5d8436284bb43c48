"""Test env bootstrap.

The container pins the remote-TPU ("axon") backend in every interpreter:
a PYTHONPATH sitecustomize registers an IFRT-proxy backend at startup and
calls ``jax.config.update("jax_platforms", "axon,cpu")``, which overrides
the JAX_PLATFORMS env var and routes every op through the TPU tunnel
(seconds per eager op).  JAX backends initialise lazily, so flipping the
config back *before any test touches a device* restores plain CPU.

We also expose 8 virtual CPU devices so sharding / halo-exchange tests
exercise real multi-device code paths without a TPU pod (SURVEY §4: the
TPU-native analogue of a fake multi-node backend).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the engine step compiles to a large XLA program (minutes on CPU);
# cache compilations across test runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 weak #4): `pytest -m quick` is the fast CI gate.
# The listed files are the unit/oracle core — ~110 s green on a warm
# compilation cache (measured per-file 2026-08-20); the full suite is a
# 25-40 min commitment from a cold cache (engine-step compiles dominate).
# ---------------------------------------------------------------------------

_QUICK_FILES = {
    "test_fractions",
    "test_sdf",
    "test_cg",
    "test_2d",
    "test_utils",
    "test_oracle",
    "test_quirks",
    "test_pressure",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _QUICK_FILES:
            item.add_marker(pytest.mark.quick)
