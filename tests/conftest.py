"""Test configuration: force a virtual 8-device CPU backend.

Tests must run without TPU hardware; multi-device sharding paths are
exercised on a virtual CPU mesh (the JAX-world fake backend replacing the
reference's nonexistent multi-node story — SURVEY.md §4).

Must run before jax initialises its backends, hence env vars set at import.
"""

import os

# HT_TESTS_ON_TPU=1 keeps the session's real TPU backend so the
# `skipif(not ON_TPU)` kernel-statistics tests (Pallas on-core PRNG) can
# run on hardware: e.g.
#   HT_TESTS_ON_TPU=1 python -m pytest tests/test_kernels.py -q
# Everything else (virtual 8-device mesh paths) expects the CPU default.
_ON_TPU = os.environ.get("HT_TESTS_ON_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon default
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    # The axon sitecustomize force-registers the TPU platform and overrides
    # JAX_PLATFORMS; config.update wins over both.
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The suite compiles many hundreds of XLA CPU programs; with all of them
    held live, the CPU backend's JIT was observed to segfault inside
    backend_compile_and_load late in a full single-process run (twice, at
    different tests ~80% in).  Per-module cache clearing bounds the
    accumulation; within-module sharing (the expensive scans) is preserved.
    """
    yield
    jax.clear_caches()
