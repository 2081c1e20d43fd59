"""Primus 3D ViT tests: shapes, interface modes, parameter scale, RoPE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anatomix_tpu.models.vit3d import (
    PRIMUS_CONFIGS,
    PrimusConfig,
    init_primus_params,
    primus_apply,
    primus_param_count,
)

TINY = PrimusConfig(
    input_channels=1, num_classes=4, embed_dim=48, eva_depth=2,
    eva_numheads=4, patch_embed_size=(8, 8, 8), input_shape=(16, 16, 16),
    num_register_tokens=2, init_values=0.1, scale_attn_inner=True,
    qk_norm=True, out_norm="demean", out_norm_eps=1e-2,
    register_init_std=0.02, in_eps=1e-2,
)


@pytest.fixture(scope="module")
def tiny():
    params = init_primus_params(TINY, jax.random.PRNGKey(0))
    return TINY, params


def test_forward_shape_and_norm(tiny):
    cfg, params = tiny
    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((2, 16, 16, 16, 1))
        .astype(np.float32)
    )
    out = primus_apply(cfg, params, x)
    assert out.shape == (2, 16, 16, 16, 4)
    # demean out-norm: per-channel spatial mean ~ 0
    means = np.asarray(jnp.mean(out, axis=(1, 2, 3)))
    np.testing.assert_allclose(means, 0.0, atol=1e-5)


def test_pretraining_interface_modes(tiny):
    cfg, params = tiny
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    out, feats = primus_apply(cfg, params, x, layers=[-1])
    assert len(feats) == 1
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats[0]))
    feats_only = primus_apply(cfg, params, x, layers=[-1], encode_only=True)
    assert len(feats_only) == 1


def test_input_shape_enforced(tiny):
    cfg, params = tiny
    with pytest.raises(ValueError, match="bound to input_shape"):
        primus_apply(cfg, params, jnp.zeros((1, 8, 8, 8, 1)))


def test_param_count_anatomix_dev_vit_scale():
    """The registry S-config (12×396×6h) should land near the published 26M."""
    from anatomix_tpu.models.registry import ANATOMIX_VARIANTS

    kw = ANATOMIX_VARIANTS["anatomix-dev-vit"]["vit_kwargs"]
    cfg = PrimusConfig(
        input_channels=kw["input_channels"], num_classes=kw["num_classes"],
        embed_dim=kw["embed_dim"], eva_depth=kw["eva_depth"],
        eva_numheads=kw["eva_numheads"],
        patch_embed_size=tuple(kw["patch_embed_size"]),
        input_shape=tuple(kw["input_shape"]),
        num_register_tokens=kw["num_register_tokens"],
        qk_norm=kw["qk_norm"], scale_attn_inner=kw["scale_attn_inner"],
        out_norm=kw["out_norm"], version="v2",
    )
    params = init_primus_params(cfg, jax.random.PRNGKey(0))
    count = primus_param_count(params)
    assert 20e6 < count < 33e6, count
    assert PRIMUS_CONFIGS["S"]["embed_dim"] == 396


def test_rope_changes_with_position(tiny):
    """Permuting spatial content must not be equivalent to permuting the
    output (position information is injected)."""
    cfg, params = tiny
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1), ).astype(
        np.float32))
    out1 = np.asarray(primus_apply(cfg, params, x))
    out2 = np.asarray(primus_apply(cfg, params, jnp.flip(x, axis=1)))
    assert not np.allclose(out1, np.flip(out2, axis=1), atol=1e-3)


def test_gradients_flow(tiny):
    cfg, params = tiny
    x = jnp.ones((1, 16, 16, 16, 1), jnp.float32)

    def loss(p):
        return jnp.mean(primus_apply(cfg, p, x) ** 2)

    grads = jax.grad(loss)(params)
    gnorm = np.sqrt(
        sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads))
    )
    assert np.isfinite(gnorm) and gnorm > 0
