"""Segmentation train/val transform chains (jittable).

Matches `get_train_transforms` / `get_val_transforms`
(`/root/reference/anatomix/segmentation/segmentation_utils.py:159-228`):
scale-intensity → random crop³ → p=0.33 each of {GaussianNoise,
BiasField(≤0.05), GibbsNoise(α≤0.33), AdjustContrast, GaussianSmooth(σ≤0.1),
GaussianSharpen} → RandAffine p=0.98 (rot π/4, scale 0.2, shear 0.2,
zeros padding; bilinear image / nearest label) → final rescale.
Validation: scale-intensity only.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from anatomix_tpu.ops.augment import (
    apply_affine,
    maybe,
    rand_adjust_contrast,
    rand_affine_params,
    rand_bias_field,
    rand_gaussian_noise,
    rand_gaussian_sharpen,
    rand_gaussian_smooth,
    rand_gibbs_noise,
    rand_spatial_crop,
    scale_intensity,
)


@functools.partial(jax.jit, static_argnums=(3,))
def train_transform(
    key: jax.Array,
    image: jax.Array,  # (D, H, W)
    label: jax.Array,  # (D, H, W)
    crop_size: int,
):
    """One training sample -> (image (crop³), label (crop³))."""
    keys = jax.random.split(key, 9)
    img = scale_intensity(image.astype(jnp.float32))
    img, lab = rand_spatial_crop(keys[0], [img, label], crop_size)

    img = maybe(keys[1], 0.33, rand_gaussian_noise, img)
    img = maybe(
        keys[2], 0.33,
        lambda k, v: rand_bias_field(k, v, coeff_range=(0.0, 0.05)),
        img,
    )
    img = maybe(
        keys[3], 0.33,
        lambda k, v: rand_gibbs_noise(k, v, alpha_range=(0.0, 0.33)),
        img,
    )
    img = maybe(keys[4], 0.33, rand_adjust_contrast, img)
    img = maybe(
        keys[5], 0.33,
        lambda k, v: rand_gaussian_smooth(k, v, sigma_range=(0.0, 0.1)),
        img,
    )
    img = maybe(keys[6], 0.33, rand_gaussian_sharpen, img)

    def affine_both(k, pair):
        im, lb = pair
        mat = rand_affine_params(
            k, rotate_range=math.pi / 4, scale_range=0.2, shear_range=0.2,
        )
        return (
            apply_affine(im, mat, mode="bilinear"),
            apply_affine(lb.astype(jnp.float32), mat, mode="nearest"),
        )

    do_affine = jax.random.uniform(keys[7]) < 0.98
    img, lab = jax.lax.cond(
        do_affine,
        lambda pair: affine_both(keys[8], pair),
        lambda pair: (pair[0], pair[1].astype(jnp.float32)),
        (img, lab),
    )
    img = scale_intensity(img)
    return img, lab


def val_transform(image: jax.Array) -> jax.Array:
    return scale_intensity(image.astype(jnp.float32))
