"""Test harness: force JAX onto a simulated 8-device CPU mesh.

This environment boots every interpreter with a TPU PJRT plugin pre-loaded
(sitecustomize) and ``JAX_PLATFORMS`` pinned to it, so plain env overrides
are not enough: XLA_FLAGS must be set before the CPU backend is created,
and the platform list forced through jax.config.  The single real TPU chip
is reserved for benchmarks; all tests run on the virtual CPU mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(params=["host", "device"])
def backend(request):
    """Run parity tests on both the numpy scalar path and the JAX path."""
    return request.param
