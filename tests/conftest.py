"""Test harness: run everything on a virtual 8-device CPU mesh so DP/sharding
collectives are exercised without TPU hardware."""

import os

# Must be set before jax is imported anywhere. Force-override: the session
# environment pins JAX_PLATFORMS=axon (single real TPU chip); unit tests run
# on a virtual 8-device CPU platform instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" via jax.config
# (overriding the env var), which would route tests onto the real TPU chip
# with bf16 matmuls. Point jax back at the virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
