"""Segmentation losses: Dice and DiceCE with MONAI-default semantics.

Matches `monai.losses.DiceCELoss(softmax=True, to_onehot_y=True,
include_background=False)` and `DiceLoss(...)` as used by the reference
(`/root/reference/anatomix/segmentation/train_segmentation.py:105-111`):
softmax over channel logits, one-hot targets, background channel excluded,
smooth_nr = smooth_dr = 1e-5, reduction mean over batch and classes; DiceCE
adds an unweighted cross-entropy term (mean over voxels, all classes).

Layout: logits (B, D, H, W, C); labels (B, D, H, W) integer or
(B, D, H, W, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _prep(logits: jax.Array, labels: jax.Array):
    if labels.ndim == logits.ndim:
        labels = labels[..., 0]
    labels = labels.astype(jnp.int32)
    return logits.astype(jnp.float32), labels


def dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    include_background: bool = False,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
) -> jax.Array:
    logits, labels = _prep(logits, labels)
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    start = 0 if include_background else 1
    probs = probs[..., start:]
    onehot = onehot[..., start:]
    reduce_axes = (1, 2, 3)
    intersection = jnp.sum(probs * onehot, axis=reduce_axes)
    denom = jnp.sum(probs, axis=reduce_axes) + jnp.sum(
        onehot, axis=reduce_axes
    )
    dice = (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(1.0 - dice)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logits, labels = _prep(logits, labels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    n_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def dice_ce_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    include_background: bool = False,
    lambda_dice: float = 1.0,
    lambda_ce: float = 1.0,
) -> jax.Array:
    return lambda_dice * dice_loss(
        logits, labels, include_background=include_background
    ) + lambda_ce * cross_entropy_loss(logits, labels)
