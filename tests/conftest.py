"""Test harness config.

Force the CPU backend with 8 virtual devices BEFORE jax initializes: golden
tests are deterministic on CPU, and rt.dist sharding tests get an 8-device
mesh without TPU hardware (the documented JAX pattern for testing
multi-chip code paths single-host).
"""

import os

# Force CPU even when a TPU plugin (e.g. the axon sitecustomize) has already
# pinned JAX_PLATFORMS to itself: env alone is NOT enough once the plugin is
# registered — jax.config.update is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow (full 100-frame golden) tests")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: full-convergence golden tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="needs --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
