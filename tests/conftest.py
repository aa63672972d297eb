"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are
validated on XLA's host platform with 8 virtual devices (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__).
"""

import os

# Hard override: the machine env pins JAX_PLATFORMS=axon (real TPU), so a
# setdefault would silently leave tests running on the hardware chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize calls register() which sets the jax_platforms
# *config* to "axon,cpu" — config beats the env var, so the env override
# above is not enough to keep tests off the hardware chip.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from valkey_search_tpu.runtime import jaxinit  # noqa: E402

jaxinit.init()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running multi-process integration tests"
    )
