"""Test configuration: run JAX on 8 virtual CPU devices with x64 enabled.

This is the fake-multi-device capability the reference lacks (it can only test
MPI paths under real mpirun, SURVEY.md §4): shard_map/ppermute/psum code paths
run for real on one host. Must run before any jax import in the tests.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the axon sitecustomize forces tpu otherwise
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """quick = everything not marked slow: `pytest -m quick` is the fast
    iteration tier (VERDICT round-2 weak #7 — the full suite's interpreter-
    heavy distributed tail passed the 10-minute mark)."""
    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.quick)
