"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated via XLA's host-platform device emulation
(the driver separately dry-runs the multichip path); real-TPU execution is
covered by bench.py.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin registers itself in sitecustomize before conftest
# runs, so the env var alone does not switch platforms — force it here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
