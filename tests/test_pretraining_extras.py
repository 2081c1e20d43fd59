"""Primus pretraining path + layer freezing."""

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.models.unet import UnetConfig, build_plan
from anatomix_tpu.models.vit3d import PrimusConfig
from anatomix_tpu.pretraining.train_step import (
    build_train_step,
    frozen_layer_ids,
    init_train_state,
)


def test_primus_pretraining_step():
    cfg = PrimusConfig(
        input_channels=1, num_classes=4, embed_dim=32, eva_depth=1,
        eva_numheads=2, patch_embed_size=(8, 8, 8),
        input_shape=(16, 16, 16), num_register_tokens=2,
        qk_norm=True, out_norm="demean", version="v2",
    )
    state = init_train_state(
        cfg, jax.random.PRNGKey(0), tap_layers=(-1,), num_patches=16,
        netf_nc=16, lr=1e-3,
    )
    step = build_train_step(
        cfg, tap_layers=(-1,), num_patches=16, nce_temperature=0.33,
        lr=1e-3, donate=False,
    )
    rng = np.random.default_rng(0)
    views = jnp.asarray(
        rng.standard_normal((1, 2, 16, 16, 16, 1)).astype(np.float32)
    )
    segs = jnp.asarray(
        rng.integers(0, 3, (1, 16, 16, 16, 1)).astype(np.int32)
    )
    losses = []
    for i in range(4):
        state, metrics = step(state, views, segs, jax.random.PRNGKey(5))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_layer_freezing():
    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4)
    )
    taps = (plan.num_layers - 1,)
    # unfreeze only the stem conv (layer 0): everything else frozen
    frozen = frozen_layer_ids(plan, [0], taps)
    assert 0 not in frozen
    assert len(frozen) > 10

    state = init_train_state(
        plan, jax.random.PRNGKey(0), tap_layers=taps, num_patches=8,
        netf_nc=8, n_mlps=2, lr=1e-2, frozen_layers=frozen,
    )
    step = build_train_step(
        plan, tap_layers=taps, num_patches=8, lr=1e-2, donate=False,
        frozen_layers=frozen,
    )
    rng = np.random.default_rng(1)
    views = jnp.asarray(
        rng.standard_normal((1, 2, 16, 16, 16, 1)).astype(np.float32)
    )
    segs = jnp.asarray(
        rng.integers(0, 2, (1, 16, 16, 16, 1)).astype(np.int32)
    )
    frozen_conv = next(
        i for i in frozen if plan.layers[i].kind == "conv"
    )
    before_frozen = np.asarray(state.params_g[str(frozen_conv)]["w"]).copy()
    before_stem = np.asarray(state.params_g["0"]["w"]).copy()
    state, _ = step(state, views, segs, jax.random.PRNGKey(2))
    after_frozen = np.asarray(state.params_g[str(frozen_conv)]["w"])
    after_stem = np.asarray(state.params_g["0"]["w"])
    np.testing.assert_array_equal(before_frozen, after_frozen)
    assert not np.allclose(before_stem, after_stem)
