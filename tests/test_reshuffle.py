"""Pallas s2d/d2s reshuffle kernels vs the XLA reference permutation
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anatomix_tpu.ops.pallas.conv3x3 import _depth_to_space, _space_to_depth
from anatomix_tpu.ops.pallas.reshuffle import depth_to_space, space_to_depth


@pytest.mark.parametrize("C,B,D", [(8, 1, 8), (16, 2, 16), (1, 1, 8)])
def test_reshuffle_roundtrip_and_parity(rng, C, B, D):
    x = jnp.asarray(
        rng.standard_normal((B, D, D, D, C)).astype(np.float32)
    )
    blk_p = space_to_depth(x, interpret=True)
    blk_x = _space_to_depth(x)
    np.testing.assert_array_equal(np.asarray(blk_p), np.asarray(blk_x))
    back = depth_to_space(blk_p, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_reshuffle_vjps_are_adjoint(rng):
    from anatomix_tpu.ops.pallas.conv_block_train import (
        depth_to_space_vjp, space_to_depth_vjp,
    )

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 8)).astype(np.float32))
    y, vjp = jax.vjp(lambda v: space_to_depth_vjp(v, True), x)
    (dx,) = vjp(y)
    # s2d is a permutation: vjp(s2d(x)) == x
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(x))
    b, vjp2 = jax.vjp(lambda v: depth_to_space_vjp(v, True), y)
    (dy,) = vjp2(b)
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(y))
