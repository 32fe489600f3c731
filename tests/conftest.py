"""Test harness config: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths compile and run without TPU hardware
(SURVEY.md §4 test strategy)."""
import os

# hard override: the session environment pre-sets JAX_PLATFORMS=axon (the
# real TPU tunnel); tests must run on the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# a pytest plugin imports jax before this file runs, so the env var alone is
# snapshotted too late — update the live config as well
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def reference_importable():
    """Make the read-only reference repo importable as a test oracle."""
    import sys
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    return REFERENCE_PATH


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
