"""Test configuration: force a virtual 8-device CPU backend.

Tests must run without TPU hardware; multi-device sharding paths are
exercised on a virtual CPU mesh (the JAX-world fake backend replacing the
reference's nonexistent multi-node story — SURVEY.md §4).

Must run before jax initialises its backends, hence env vars set at import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform and overrides
# JAX_PLATFORMS; config.update wins over both.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0)
