"""Test harness: force CPU with 8 virtual devices BEFORE jax import.

Multi-device tests run on a host-CPU mesh (the standard JAX answer to
testing sharding without a cluster); parity tests compare against torch-cpu
oracles built from the read-only reference.

Real-hardware tier: `ANATOMIX_TPU_TESTS=1 pytest -m tpu` keeps the default
(TPU) platform and runs the `tpu`-marked exact-numerics tests; in the
default CPU suite those tests are auto-skipped.
"""

import os

TPU_TIER = bool(os.environ.get("ANATOMIX_TPU_TESTS"))

import jax

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon TPU-tunnel plugin overrides JAX_PLATFORMS; config route wins.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    if TPU_TIER:
        return
    skip_tpu = pytest.mark.skip(
        reason="real-TPU tier (set ANATOMIX_TPU_TESTS=1 and run -m tpu)"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)


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
