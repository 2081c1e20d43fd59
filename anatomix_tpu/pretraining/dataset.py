"""Two-view HDF5 dataset + on-device paired augmentation.

Host side matches `H5SupCLDataset` (`/root/reference/pretraining/data/
h5supcl_dataset.py`): per item, pick two distinct timepoints of a subject
(`img` shape (T, D, H, W), shared `seg`), percentile min-max normalize
(`data/data_utils.py:4-46`). The reference re-opens the HDF5 per item to
dodge a DataLoader-worker leak; with a single-process host loop we hold one
handle.

Augmentation runs ON DEVICE as one jitted function per sample: spatial
transforms (flip p=0.9, affine p=0.5 scale 0.4 / 45°) are *shared* across
the two views and the seg (the reference replays torchio's composed history
onto view B, `h5supcl_dataset.py:279-303` — here both views simply consume
the same PRNG key), intensity transforms (blur/noise p=.33, bias/gamma
p=.5, motion p=.33) are per-view or shared per
`apply_same_inten_augment`, then a shared random crop to crop³.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.ops.augment import (
    affine_matrix_3d,
    apply_affine,
    maybe,
    rand_bias_field,
    rand_gamma,
    rand_motion_ghosting,
    rand_spatial_crop,
)


def normalize_img(
    array: np.ndarray,
    percentile: float | None = None,
    zero_centered: bool = True,
) -> np.ndarray:
    """[0,1] (or [-1,1]) normalization with percentile upper bound
    (`data/data_utils.py:4-46`)."""
    array = np.asarray(array, np.float32)
    min_ = array.min()
    max_ = np.percentile(array, percentile) if percentile is not None else array.max()
    if max_ - min_ > 0:
        array = (array - min_) / (max_ - min_)
    if zero_centered:
        array = array * 2 - 1
    return array


def _rand_blur(key, x):
    """torchio RandomBlur: per-axis σ ~ U(0, 2)."""
    from anatomix_tpu.ops.augment import _smooth_axis_dynamic

    sigmas = jax.random.uniform(key, (3,), minval=0.0, maxval=2.0)
    y = x
    for axis in range(3):
        y = _smooth_axis_dynamic(y, sigmas[axis], axis, max_sigma=2.0)
    return y


def _rand_noise(key, x):
    """torchio RandomNoise: std ~ U(0, 0.25), mean 0."""
    k1, k2 = jax.random.split(key)
    std = jax.random.uniform(k1, (), minval=0.0, maxval=0.25)
    return x + jax.random.normal(k2, x.shape, x.dtype) * std


def _rand_bias(key, x):
    """torchio RandomBiasField: order-3 polynomial, coeffs U(-0.5, 0.5)."""
    return rand_bias_field(key, x, coeff_range=(-0.5, 0.5), degree=3)


def _intensity_chain(key, x, cfg):
    keys = jax.random.split(key, 5)
    if cfg.blur:
        x = maybe(keys[0], 0.33, _rand_blur, x)
    if cfg.noise:
        x = maybe(keys[1], 0.33, _rand_noise, x)
    if cfg.bias:
        x = maybe(keys[2], 0.5, _rand_bias, x)
    if cfg.gamma:
        x = maybe(
            keys[3], 0.5,
            lambda k, v: rand_gamma(k, v, log_gamma=(-0.4, 0.4)),
            x,
        )
    if cfg.motion:
        x = maybe(keys[4], 0.33, rand_motion_ghosting, x)
    return x


def make_pair_augment(cfg):
    """Build the jitted `(key, img_a, img_b, seg) -> (views, seg)` aug fn.

    img_* are (D, H, W) float; seg is (D, H, W). Returns views
    (2, c, c, c, 1) and seg (c, c, c, 1) with c = cfg.crop_size.
    """
    crop = cfg.crop_size

    @jax.jit
    def augment(key, img_a, img_b, seg):
        kflip, kaff_p, kaff, kint_a, kint_b, kcrop = jax.random.split(key, 6)
        seg = seg.astype(jnp.float32)

        if cfg.augment and cfg.geo_augment:
            # shared flips (p=0.9 per-transform, then 0.5 per axis inside)
            def flip_all(k, vols):
                flips = jax.random.bernoulli(k, 0.5, (3,))
                outs = []
                for v in vols:
                    y = v
                    for axis in range(3):
                        y = jnp.where(flips[axis], jnp.flip(y, axis=axis), y)
                    outs.append(y)
                return outs

            kp, kf = jax.random.split(kflip)
            do_flip = jax.random.uniform(kp) < 0.9
            img_a, img_b, seg = jax.lax.cond(
                do_flip,
                lambda vols: tuple(flip_all(kf, list(vols))),
                lambda vols: vols,
                (img_a, img_b, seg),
            )

            # shared affine p=0.5 (torchio: scales (1±0.4), degrees ±45)
            def affine_all(vols):
                kr, ks = jax.random.split(kaff)
                deg = jnp.deg2rad(45.0)
                rot = jax.random.uniform(kr, (3,), minval=-deg, maxval=deg)
                scale = 1.0 + jax.random.uniform(
                    ks, (3,), minval=-0.4, maxval=0.4
                )
                mat = affine_matrix_3d(rotate=rot, scale=scale)
                a, b, s = vols
                return (
                    apply_affine(a, mat, mode="bilinear"),
                    apply_affine(b, mat, mode="bilinear"),
                    apply_affine(s, mat, mode="nearest"),
                )

            img_a, img_b, seg = jax.lax.cond(
                jax.random.uniform(kaff_p) < 0.5,
                affine_all,
                lambda vols: vols,
                (img_a, img_b, seg),
            )

        if cfg.augment and cfg.inten_augment:
            if cfg.apply_same_inten_augment:
                img_a = _intensity_chain(kint_a, img_a, cfg)
                img_b = _intensity_chain(kint_a, img_b, cfg)
            else:
                img_a = _intensity_chain(kint_a, img_a, cfg)
                img_b = _intensity_chain(kint_b, img_b, cfg)

        if crop > 0:
            img_a, img_b, seg = rand_spatial_crop(
                kcrop, [img_a, img_b, seg], crop
            )
        views = jnp.stack([img_a, img_b])[..., None]
        return views, seg[..., None]

    return augment


class H5TwoViewDataset:
    """Host-side reader yielding (img_i, img_j, seg) numpy triples."""

    def __init__(self, h5_path: str, cfg, train: bool = True):
        import h5py

        self.h5 = h5py.File(h5_path, "r")
        self.subjects = list(self.h5.keys())
        self.cfg = cfg
        self.train = train

    def __len__(self):
        # padded up to batch_size so one epoch always yields >= 1 full
        # batch; with fewer subjects than batch_size a batch can repeat a
        # subject (the reference drops incomplete batches instead,
        # `data/__init__.py:95` drop_last — different views/augs per
        # occurrence keep the repeats non-degenerate)
        return max(len(self.subjects), self.cfg.batch_size)

    def get(self, item: int, rng: np.random.Generator):
        subj = self.subjects[item % len(self.subjects)]
        grp = self.h5[subj]
        n_tps = grp["img"].shape[0]
        if self.cfg.view_order and n_tps > 1:
            i = int(rng.integers(0, n_tps - 1))
            j = i + 1
        elif n_tps > 1:
            i, j = rng.choice(n_tps, size=2, replace=False)
        else:
            i = j = 0
        img_a = normalize_img(
            grp["img"][int(i)], self.cfg.percentile, self.cfg.zero_centered
        )
        img_b = normalize_img(
            grp["img"][int(j)], self.cfg.percentile, self.cfg.zero_centered
        )
        seg = np.asarray(grp["seg"], np.float32)
        return img_a, img_b, seg

    def close(self):
        self.h5.close()
