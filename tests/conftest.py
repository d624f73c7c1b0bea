"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding is exercised without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # the image presets axon (TPU); tests run on CPU

import jax

# the axon TPU plugin overrides JAX_PLATFORMS, so force the config directly
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_EXAMPLE = pathlib.Path("/root/reference/example/voxpopuli")


@pytest.fixture(scope="session")
def example_dir() -> pathlib.Path:
    if not REFERENCE_EXAMPLE.exists():
        pytest.skip("reference example data not available")
    return REFERENCE_EXAMPLE
