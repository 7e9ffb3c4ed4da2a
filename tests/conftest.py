"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax is imported anywhere (SURVEY.md §4: multi-device
tests via xla_force_host_platform_device_count replace the reference's
absent distributed-testing story).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment's sitecustomize registers the remote-TPU ("axon") PJRT
# plugin at interpreter startup and forces jax_platforms=axon, overriding
# the env var — override it back at config level.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture(scope="session")
def mesh(devices):
    from fastvision_tpu.core import create_mesh

    return create_mesh()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
