"""Custom-VJP sparse conv (training path): value + gradients vs XLA
autodiff of the same math (interpret mode on CPU, f32)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anatomix_tpu.ops.conv import conv3d
from anatomix_tpu.ops.pallas.conv_block_train import (
    conv3x3_same_train,
    pack_sparse_weights_jnp,
)
from anatomix_tpu.ops.pallas.conv_block import pack_sparse_block_weights


def test_jnp_packer_matches_numpy(rng):
    w = rng.standard_normal((3, 3, 3, 4, 6)).astype(np.float32)
    ref = pack_sparse_block_weights(w)
    got = pack_sparse_weights_jnp(jnp.asarray(w))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), r, atol=1e-6)


@pytest.mark.parametrize(
    "pad,act", [("zeros", "none"), ("reflect", "lrelu"), ("zeros", "relu")]
)
def test_train_conv_grads_match_xla(rng, pad, act):
    ci, co = 16, 16
    x = jnp.asarray(
        rng.standard_normal((2, 8, 8, 8, ci)).astype(np.float32)
    )
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.1
    )
    b = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    t = jnp.asarray(
        rng.standard_normal((2, 8, 8, 8, co)).astype(np.float32)
    )

    def act_fn(z):
        if act == "relu":
            return jnp.maximum(z, 0)
        if act == "lrelu":
            return jnp.where(z >= 0, z, 0.2 * z)
        return z

    def loss_ref(x, w, b):
        y = act_fn(
            conv3d(x, w, b, padding="SAME", pad_type=pad,
                   compute_dtype=jnp.float32)
        )
        return jnp.sum((y - t) ** 2)

    def loss_fused(x, w, b):
        y = conv3x3_same_train(
            x, w, b, act=act, pad_type=pad, compute_dtype=jnp.float32,
            interpret=True,
        )
        return jnp.sum((y - t) ** 2)

    ref_val, ref_g = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        x, w, b
    )
    got_val, got_g = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
        x, w, b
    )
    assert abs(float(got_val) - float(ref_val)) / abs(float(ref_val)) < 1e-3
    for name, r, g in zip("xwb", ref_g, got_g):
        r, g = np.asarray(r), np.asarray(g)
        denom = np.abs(r).max() + 1e-8
        assert np.abs(g - r).max() / denom < 2e-2, (
            f"d{name} mismatch: {np.abs(g - r).max()} vs scale {denom}"
        )


def test_pretrain_step_pallas_train_matches_xla():
    """One NCE loss+grad evaluation with conv_impl='pallas_train' vs XLA
    (f32, tiny UNet with lane-group channel counts)."""
    from anatomix_tpu.models.unet import UnetConfig, build_plan
    from anatomix_tpu.pretraining.train_step import (
        NCEOptions, init_train_state, nce_forward,
    )

    cfg = UnetConfig(dimension=3, input_nc=1, output_nc=8, num_downs=2,
                     ngf=16)
    plan = build_plan(cfg)
    taps = (plan.encoder_idx[-1], plan.num_layers - 1)
    state = init_train_state(
        plan, jax.random.PRNGKey(0), tap_layers=taps, num_patches=16,
        netf_nc=16, lr=1e-3,
    )
    rng_np = np.random.default_rng(0)
    views = jnp.asarray(
        rng_np.standard_normal((1, 2, 16, 16, 16, 1)).astype(np.float32)
    )
    segs = jnp.asarray(
        rng_np.integers(0, 3, (1, 16, 16, 16, 1)).astype(np.int32)
    )
    nce = NCEOptions(temperature=0.33, lambda_nce=1.0, weigh_rarity=False,
                     balance_denominator=False, weighting_mode="raw")

    def loss(params_g, params_f, impl):
        out, _ = nce_forward(
            plan, params_g, params_f, views, segs, jax.random.PRNGKey(7),
            tap_layers=taps, num_patches=16, nce=nce, train=True,
            compute_dtype=jnp.float32, conv_impl=impl,
        )
        return out

    ref, ref_g = jax.value_and_grad(loss, argnums=(0, 1))(
        state.params_g, state.params_f, "xla"
    )
    got, got_g = jax.value_and_grad(loss, argnums=(0, 1))(
        state.params_g, state.params_f, "pallas_train"
    )
    assert abs(float(got) - float(ref)) / (abs(float(ref)) + 1e-8) < 1e-2
    flat_r = jax.tree_util.tree_leaves(ref_g)
    flat_g = jax.tree_util.tree_leaves(got_g)
    for r, g in zip(flat_r, flat_g):
        r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
        scale = np.abs(r).max() + 1e-6
        assert np.abs(g - r).max() / scale < 5e-2
