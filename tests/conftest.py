"""Test harness: force CPU with 8 virtual devices BEFORE jax import.

Multi-device tests run on a host-CPU mesh (the standard JAX answer to
testing sharding without a cluster); parity tests compare against torch-cpu
oracles built from the read-only reference.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU-tunnel plugin overrides JAX_PLATFORMS; the config route wins.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def _has_torch():
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


def _has_reference():
    return os.path.isdir("/root/reference/anatomix")


requires_torch = pytest.mark.skipif(
    not _has_torch(), reason="torch oracle not available"
)
requires_reference = pytest.mark.skipif(
    not (_has_torch() and _has_reference()),
    reason="reference repo or torch not available",
)
