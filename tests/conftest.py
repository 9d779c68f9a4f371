"""Test config: force an 8-device virtual CPU mesh BEFORE jax initializes.

Mirrors the reference's testing stance (SURVEY.md §4): multi-host logic is
exercised on one host the way task_mgr_local runs the distributed framework
in-process — same sharded code path, virtual devices.
"""

import os

# Force CPU: the ambient environment may pin JAX_PLATFORMS to a remote TPU
# backend (axon), where every new op/shape pays a remote compile round-trip.
# Set BGT_TEST_TPU=1 to run the suite against the real chip instead.
if not os.environ.get("BGT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not os.environ.get("BGT_TEST_TPU"):
    # The ambient sitecustomize re-registers the axon TPU backend and resets
    # JAX_PLATFORMS at interpreter startup; the config flag takes precedence.
    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def golden_dir():
    return os.path.join(REFERENCE, "golden")


@pytest.fixture(scope="session")
def datasets_dir():
    return os.path.join(REFERENCE, "datasets")


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
