"""Test harness: force JAX onto CPU with 8 virtual devices.

This is the standard fake-multi-device setup (SURVEY.md §4): sharding /
collective code paths are exercised on a virtual 8-device CPU mesh so
multi-chip behaviour is testable without a pod slice. Must run before
jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup, so
# JAX_PLATFORMS from the env was already captured — override via config
# (effective as long as no backend has been initialized yet).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute integration tests")


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
