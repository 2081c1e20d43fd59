"""Segmentation stack tests: Dice/DiceCE oracles, augmentations, few-shot
data handler, and an end-to-end overfit run on synthetic data."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dice_loss_manual_oracle():
    from anatomix_tpu.segmentation.losses import dice_loss

    # 2 classes + background, tiny volume, hand-computable
    logits = np.full((1, 2, 2, 2, 3), -10.0, np.float32)
    labels = np.zeros((1, 2, 2, 2), np.int32)
    labels[0, 0] = 1  # 4 voxels class 1
    # logits predict class 1 in exactly those voxels
    logits[0, 0, :, :, 1] = 10.0
    logits[0, 1, :, :, 0] = 10.0
    loss = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    # class 1: perfect overlap -> dice ~1; class 2: absent entirely ->
    # intersection 0, denom 0 -> smooth terms -> dice ~1
    assert loss == pytest.approx(0.0, abs=1e-3)


def test_dice_ce_loss_decreases_with_correct_preds():
    from anatomix_tpu.segmentation.losses import dice_ce_loss

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 3, (1, 4, 4, 4)).astype(np.int32)
    good = jax.nn.one_hot(labels, 3) * 8.0
    bad = jnp.asarray(
        rng.standard_normal((1, 4, 4, 4, 3)).astype(np.float32)
    )
    assert float(dice_ce_loss(good, labels)) < float(
        dice_ce_loss(bad, labels)
    )


def test_dice_loss_vs_monai_formula(rng):
    """Independent numpy re-derivation of MONAI DiceLoss defaults."""
    from anatomix_tpu.segmentation.losses import dice_loss

    logits = rng.standard_normal((2, 4, 4, 4, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 4, 4, 4)).astype(np.int32)

    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    onehot = np.eye(4, dtype=np.float32)[labels]
    p = probs[..., 1:]
    o = onehot[..., 1:]
    inter = (p * o).sum((1, 2, 3))
    denom = p.sum((1, 2, 3)) + o.sum((1, 2, 3))
    dice = (2 * inter + 1e-5) / (denom + 1e-5)
    ref = float(np.mean(1 - dice))
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(ref, rel=1e-5)


def test_train_transform_shapes_and_determinism(rng):
    from anatomix_tpu.segmentation.transforms import train_transform

    img = jnp.asarray(rng.standard_normal((24, 24, 24)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 3, (24, 24, 24)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    im1, lb1 = train_transform(key, img, lab, 16)
    im2, lb2 = train_transform(key, img, lab, 16)
    assert im1.shape == (16, 16, 16)
    assert lb1.shape == (16, 16, 16)
    np.testing.assert_array_equal(np.asarray(im1), np.asarray(im2))
    np.testing.assert_array_equal(np.asarray(lb1), np.asarray(lb2))
    # labels stay integral under nearest resampling
    vals = np.unique(np.asarray(lb1))
    assert np.allclose(vals, np.round(vals))
    # image rescaled to [0, 1]
    assert 0.0 <= float(jnp.min(im1)) and float(jnp.max(im1)) <= 1.0 + 1e-5


def test_augment_primitives(rng):
    from anatomix_tpu.ops.augment import (
        gibbs_noise,
        rand_bias_field,
        rand_flip,
        rand_gaussian_noise,
        scale_intensity,
    )

    x = jnp.asarray(rng.standard_normal((8, 8, 8)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    assert float(jnp.min(scale_intensity(x))) == pytest.approx(0.0)
    assert float(jnp.max(scale_intensity(x))) == pytest.approx(1.0)
    # gibbs alpha=0 is identity
    np.testing.assert_allclose(
        np.asarray(gibbs_noise(x, 0.0)), np.asarray(x), atol=1e-4
    )
    assert not np.allclose(
        np.asarray(gibbs_noise(x, 0.7)), np.asarray(x), atol=1e-3
    )
    noised = rand_gaussian_noise(key, x)
    assert noised.shape == x.shape
    biased = rand_bias_field(key, x, coeff_range=(0.3, 0.5))
    assert not np.allclose(np.asarray(biased), np.asarray(x))
    flipped = rand_flip(key, x)
    assert flipped.shape == x.shape


def test_data_handler(tmp_path):
    from anatomix_tpu.segmentation.data import data_handler, natsorted
    from anatomix_tpu.utils.nifti import save_volume

    assert natsorted(["x10", "x2", "x1"]) == ["x1", "x2", "x10"]

    for sub in ["imagesTr", "labelsTr", "imagesVal", "labelsVal"]:
        os.makedirs(tmp_path / sub)
    for i in range(5):
        vol = np.zeros((4, 4, 4), np.float32)
        save_volume(str(tmp_path / "imagesTr" / f"im{i}.nii.gz"), vol)
        save_volume(str(tmp_path / "labelsTr" / f"im{i}.nii.gz"), vol)
    save_volume(str(tmp_path / "imagesVal" / "v0.nii.gz"),
                np.zeros((4, 4, 4), np.float32))
    save_volume(str(tmp_path / "labelsVal" / "v0.nii.gz"),
                np.zeros((4, 4, 4), np.float32))

    tri, trs, vai, vas = data_handler(
        str(tmp_path), finetuning_amount=2, iters_per_epoch=5, batch_size=2,
    )
    assert len(set(tri)) == 2  # few-shot subset
    assert len(tri) == 2 * (5 * 2 // 2)  # replicated to fill the epoch
    assert len(vai) == len(vas) == 1
    # image/label pairing preserved under the seeded permutation
    for im, se in zip(tri, trs):
        assert os.path.basename(im) == os.path.basename(se)


def test_seg_overfit_tiny(tmp_path):
    """End-to-end: finetune a tiny scratch model on one synthetic volume and
    verify the train loss drops (the reference's only 'test' was exactly
    this kind of smoke validation)."""
    import optax

    from anatomix_tpu.segmentation.losses import dice_ce_loss
    from anatomix_tpu.segmentation.model import load_seg_model, seg_forward
    from anatomix_tpu.segmentation.train import build_seg_train_step

    plan, params = load_seg_model(
        2, ckpt_path="scratch", num_downs=2, ngf=4, output_nc=4,
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 16, 16, 16, 1)).astype(np.float32)
    lab = np.zeros((1, 16, 16, 16), np.int32)
    lab[0, :8] = 1
    lab[0, 8:, :8] = 2
    img = jnp.asarray(img + lab[..., None] * 2.0)
    lab = jnp.asarray(lab)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = build_seg_train_step(plan, tx)

    losses = []
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, img, lab)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
