"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-native stand-in for multi-chip testing (SURVEY.md §4): all
sharding/collective tests run against ``--xla_force_host_platform_device_count=8``
on CPU, mirroring how the driver dry-runs the multi-chip path.

The session environment routes every Python process at the real TPU through a
single-claim tunnel (sitecustomize registers the plugin and pre-imports jax
before this file runs), so plain env vars are not enough: tests that silently
land on the TPU serialize against every other process on the machine. We both
set the env (for subprocesses) and update jax's already-imported config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not claim the tunneled TPU"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_ROOT = "/root/reference"


def require_reference():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference checkout not available")
    return REFERENCE_ROOT


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Drop compiled executables between test modules. With ~100 programs on
    the 8-virtual-device CPU backend the runtime eventually hard-aborts
    (SIGABRT inside device_get) — clearing caches keeps the live-executable
    count bounded."""
    yield
    jax.clear_caches()
