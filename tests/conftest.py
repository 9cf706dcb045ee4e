"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Multi-host logic is tested on a single host exactly as SURVEY.md section 4
prescribes: XLA_FLAGS=--xla_force_host_platform_device_count=8 plus shard_map.
Must run before the first jax import.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the (slow, remote)
# TPU tunnel; unit tests run on the host with virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The interpreter-startup TPU plugin (sitecustomize) force-sets
# jax_platforms='axon,cpu' via jax.config, overriding the env var — override
# it back: unit tests must never claim the remote TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    return REFERENCE


def pytest_collection_modifyitems(config, items):
    if not REFERENCE.exists():
        skip = pytest.mark.skip(reason="reference artifacts not mounted")
        for item in items:
            if "parity" in item.keywords:
                item.add_marker(skip)
