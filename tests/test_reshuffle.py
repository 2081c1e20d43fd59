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


@pytest.mark.parametrize("C", [16, 32, 64])
def test_depth_to_space_fold_matches_reshape(rng, C):
    """Folded exit == depth_to_space + flat reshape (the scatter kernel's
    input form), including the fused per-lane subtract variant."""
    from anatomix_tpu.ops.pallas.reshuffle import (
        depth_to_space_fold,
        fold_supported,
    )

    B, d = 1, 8
    assert fold_supported(C, d)
    y = jnp.asarray(
        rng.standard_normal((B, d, d, d, 8 * C)).astype(np.float32)
    )
    want = np.asarray(depth_to_space(y, interpret=True)).reshape(
        B, 2 * d, 2 * d, 2 * d * C // 128, 128
    )
    got = np.asarray(depth_to_space_fold(y, interpret=True))
    np.testing.assert_array_equal(got, want)

    # bf16 input with bf16 output: exercises the internal f32 upcast
    # (Mosaic strided loads are 32-bit-only) + store-side downcast
    yb = y.astype(jnp.bfloat16)
    got_b = depth_to_space_fold(yb, interpret=True)
    assert got_b.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got_b, np.float32),
        np.asarray(
            depth_to_space(yb, interpret=True), np.float32
        ).reshape(B, 2 * d, 2 * d, 2 * d * C // 128, 128),
    )
    # f32 input downcast to bf16 output (the UNet f32 exit-conv case)
    got_fb = depth_to_space_fold(
        y, out_dtype=jnp.bfloat16, interpret=True
    )
    assert got_fb.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got_fb, np.float32),
        np.asarray(want.astype(np.float32).astype(jnp.bfloat16), np.float32),
    )

    sub = jnp.asarray(
        rng.standard_normal((B, 8 * C)).astype(np.float32)
    )
    got_s = np.asarray(
        depth_to_space_fold(
            y, sub=sub, out_dtype=jnp.float32, interpret=True
        )
    )
    want_s = np.asarray(
        depth_to_space(
            y, sub=sub, out_dtype=jnp.float32, interpret=True
        )
    ).reshape(B, 2 * d, 2 * d, 2 * d * C // 128, 128)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6, atol=1e-6)


def test_sliding_fold_exit_matches_spatial(rng):
    """sliding_window kernel path with a pre-folded apply_fn == the same
    model emitting spatial windows (both interpret mode)."""
    import os

    from anatomix_tpu.ops.pallas.reshuffle import depth_to_space_fold
    from anatomix_tpu.ops.pallas.conv3x3 import _space_to_depth
    from anatomix_tpu.ops.sliding_window import sliding_window_inference

    C = 16
    vol = jnp.asarray(
        rng.standard_normal((1, 32, 32, 64, C)).astype(np.float32)
    )

    def model_block(w):
        # toy model ending in block space: s2d then elementwise
        return _space_to_depth(jnp.tanh(w))

    def apply_spatial(w):
        from anatomix_tpu.ops.pallas.reshuffle import depth_to_space

        return depth_to_space(model_block(w), interpret=True)

    def apply_fold(w):
        return depth_to_space_fold(model_block(w), interpret=True)

    kw = dict(out_channels=C, roi_size=(16, 16, 32), sw_batch_size=2,
              overlap=0.25, mode="gaussian", interpret=True)
    old = os.environ.get("ANATOMIX_SCATTER_KERNEL")
    os.environ["ANATOMIX_SCATTER_KERNEL"] = "1"
    try:
        a = np.asarray(sliding_window_inference(vol, apply_spatial, **kw))
        b = np.asarray(sliding_window_inference(vol, apply_fold, **kw))
    finally:
        if old is None:
            del os.environ["ANATOMIX_SCATTER_KERNEL"]
        else:
            os.environ["ANATOMIX_SCATTER_KERNEL"] = old
    np.testing.assert_allclose(b, a, rtol=2e-6, atol=2e-6)


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


@pytest.mark.parametrize("C", [16, 32])
def test_depth_to_space_interleave_matches_plain(rng, C):
    """The interleave-exit variant (spatial minor layout produced
    in-kernel) == plain depth_to_space, with and without the fused
    demean subtract."""
    from anatomix_tpu.ops.pallas.reshuffle import (
        depth_to_space,
        depth_to_space_interleave,
    )

    y = jnp.asarray(
        rng.standard_normal((1, 8, 8, 8, 8 * C)).astype(np.float32)
    )
    ref = np.asarray(depth_to_space(y, interpret=True))
    got = np.asarray(depth_to_space_interleave(y, interpret=True))
    np.testing.assert_array_equal(got, ref)

    sub = jnp.asarray(rng.standard_normal((1, 8 * C)).astype(np.float32))
    ref = np.asarray(
        depth_to_space(y, sub=sub, out_dtype=jnp.float32, interpret=True)
    )
    got = np.asarray(depth_to_space_interleave(
        y, sub=sub, out_dtype=jnp.float32, interpret=True
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_space_to_depth_c1_matches_4d_reference(rng):
    """The channel-less Pallas entry kernel == the XLA space_to_depth_4d
    reference (same (ad, ah, aw)-major lane order)."""
    from anatomix_tpu.ops.pallas.conv3x3 import space_to_depth_4d
    from anatomix_tpu.ops.pallas.reshuffle import space_to_depth_c1

    x4 = jnp.asarray(
        rng.standard_normal((2, 16, 16, 16)).astype(np.float32)
    )
    ref = np.asarray(space_to_depth_4d(x4))
    got = np.asarray(space_to_depth_c1(x4, interpret=True))
    np.testing.assert_array_equal(got, ref)


def _d2s8_ref(y: np.ndarray) -> np.ndarray:
    """Numpy oracle: three composed ×2 depth-to-space steps, channel
    order (a1, a2, a3, c), a_i = (z_i*4 + y_i*2 + x_i)."""
    B, d, h, w, c512 = y.shape
    C = c512 // 512
    t = y.reshape(B, d, h, w, 2, 2, 2, 2, 2, 2, 2, 2, 2, C)
    t = t.transpose(0, 1, 4, 7, 10, 2, 5, 8, 11, 3, 6, 9, 12, 13)
    return t.reshape(B, 8 * d, 8 * h, 8 * w, C)


def test_depth_to_space8_matches_composed(rng):
    """Factor-8 exit kernel == the three-step reference permutation,
    packed and spatial emits, with and without the fused subtract."""
    from anatomix_tpu.ops.pallas.reshuffle import (
        d2s8_supported,
        depth_to_space8,
    )

    B, d, C = 1, 2, 32
    assert d2s8_supported(C)
    y = jnp.asarray(
        rng.standard_normal((B, d, d, d, 512 * C)).astype(np.float32)
    )
    ref = _d2s8_ref(np.asarray(y))
    got = np.asarray(depth_to_space8(y, emit="spatial", interpret=True))
    np.testing.assert_array_equal(got, ref)

    # packed emit: row-major byte image of the spatial tensor
    packed = np.asarray(depth_to_space8(y, interpret=True))
    assert packed.shape == (B, 8 * d, 8 * d, d, 8 * C)
    np.testing.assert_array_equal(packed.reshape(ref.shape), ref)

    sub = jnp.asarray(
        rng.standard_normal((B, 512 * C)).astype(np.float32)
    )
    ref_s = _d2s8_ref(np.asarray(y) - np.asarray(sub)[:, None, None, None])
    got_s = np.asarray(depth_to_space8(
        y, sub=sub, out_dtype=jnp.float32, emit="spatial", interpret=True
    ))
    np.testing.assert_allclose(got_s, ref_s, rtol=1e-6, atol=1e-6)

    # bf16 input, packed emit with subtract (the ViT packed-fwd config)
    yb = y.astype(jnp.bfloat16)
    got_b = depth_to_space8(
        yb, sub=sub, out_dtype=jnp.bfloat16, interpret=True
    )
    assert got_b.dtype == jnp.bfloat16
    ref_b = _d2s8_ref(
        np.asarray(yb, np.float32)
        - np.asarray(sub)[:, None, None, None]
    )
    np.testing.assert_allclose(
        np.asarray(got_b, np.float32).reshape(ref_b.shape), ref_b,
        rtol=1e-2, atol=1e-2,
    )
