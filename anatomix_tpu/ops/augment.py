"""Jittable 3D augmentation library (JAX PRNG, channel-last volumes).

Rebuilds the MONAI/torchio transforms the reference workloads depend on
(SURVEY.md §2.7): intensity scaling, random crops, Gaussian noise/smooth/
sharpen, polynomial bias fields, Gibbs (k-space low-pass) noise, k-space
spikes, gamma/contrast adjustment, nnUNet-style low-res simulation, random
flips, and random affines (rotation/scale/shear) via affine grid +
grid_sample — all pure functions of (key, volume) so they fuse under jit and
replay deterministically (the two-view shared-transform semantics of the
pretraining dataset, `/root/reference/pretraining/data/h5supcl_dataset.py:
260-303`, falls out of reusing the same key).

Volumes are (D, H, W) or (D, H, W, C); intensity transforms operate on the
whole array.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# -----------------------------------------------------------------------------
# intensity

def scale_intensity(x: jax.Array, *, eps: float = 1e-8) -> jax.Array:
    """Min-max to [0, 1] (MONAI ScaleIntensity default)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / jnp.maximum(hi - lo, eps)


def rand_gaussian_noise(
    key: jax.Array, x: jax.Array, *, std: float = 0.1
) -> jax.Array:
    """Additive N(0, u(0, std)²) noise (MONAI RandGaussianNoise)."""
    k1, k2 = jax.random.split(key)
    sampled_std = jax.random.uniform(k1, (), minval=0.0, maxval=std)
    return x + jax.random.normal(k2, x.shape, x.dtype) * sampled_std


def rand_adjust_contrast(
    key: jax.Array, x: jax.Array, *, gamma: tuple = (0.5, 4.5)
) -> jax.Array:
    """Gamma adjustment preserving the intensity range
    (MONAI RandAdjustContrast)."""
    g = jax.random.uniform(key, (), minval=gamma[0], maxval=gamma[1])
    lo, hi = jnp.min(x), jnp.max(x)
    rng = jnp.maximum(hi - lo, 1e-8)
    return ((x - lo) / rng) ** g * rng + lo


def rand_gamma(
    key: jax.Array, x: jax.Array, *, log_gamma: tuple = (-0.3, 0.3)
) -> jax.Array:
    """torchio RandomGamma: x^(e^u) on the [0,1]-scaled volume."""
    g = jnp.exp(
        jax.random.uniform(key, (), minval=log_gamma[0], maxval=log_gamma[1])
    )
    lo, hi = jnp.min(x), jnp.max(x)
    rng = jnp.maximum(hi - lo, 1e-8)
    return ((x - lo) / rng) ** g * rng + lo


def bias_field(
    coeffs: jax.Array, shape: Sequence[int], degree: int = 3
) -> jax.Array:
    """exp(polynomial) multiplicative bias field over [-1, 1]³ coords
    (MONAI RandBiasField)."""
    D, H, W = shape[:3]
    zs = jnp.linspace(-1.0, 1.0, D)
    ys = jnp.linspace(-1.0, 1.0, H)
    xs = jnp.linspace(-1.0, 1.0, W)
    field = jnp.zeros((D, H, W), jnp.float32)
    idx = 0
    for i in range(degree + 1):
        for j in range(degree + 1 - i):
            for k in range(degree + 1 - i - j):
                term = (
                    (zs ** i)[:, None, None]
                    * (ys ** j)[None, :, None]
                    * (xs ** k)[None, None, :]
                )
                field = field + coeffs[idx] * term
                idx += 1
    return jnp.exp(field)


def n_bias_coeffs(degree: int = 3) -> int:
    return sum(
        1
        for i in range(degree + 1)
        for j in range(degree + 1 - i)
        for _ in range(degree + 1 - i - j)
    )


def rand_bias_field(
    key: jax.Array,
    x: jax.Array,
    *,
    coeff_range: tuple = (0.0, 0.1),
    degree: int = 3,
) -> jax.Array:
    n = n_bias_coeffs(degree)
    coeffs = jax.random.uniform(
        key, (n,), minval=coeff_range[0], maxval=coeff_range[1]
    )
    field = bias_field(coeffs, x.shape[:3], degree)
    if x.ndim == 4:
        field = field[..., None]
    return x * field


# -----------------------------------------------------------------------------
# Gaussian filtering (separable, erf-discretized, torch/MONAI-style)

def _gaussian_kernel1d(sigma: float, truncated: float = 4.0) -> np.ndarray:
    tail = max(int(truncated * sigma + 0.5), 1)
    i = np.arange(-tail, tail + 1, dtype=np.float64)
    denom = sigma * math.sqrt(2.0) if sigma > 0 else 1.0
    w = 0.5 * (
        np.vectorize(math.erf)((i + 0.5) / denom)
        - np.vectorize(math.erf)((i - 0.5) / denom)
    )
    w = w / w.sum()
    return w.astype(np.float32)


def gaussian_smooth(
    x: jax.Array, sigma, *, truncated: float = 4.0
) -> jax.Array:
    """Separable Gaussian blur over the three leading spatial axes. `sigma`
    is a static float or per-axis triple (σ<=0 axes are identity)."""
    if not isinstance(sigma, (tuple, list)):
        sigma = (sigma,) * 3
    y = x if x.ndim == 4 else x[..., None]
    for axis, s in enumerate(sigma):
        if s is None or s <= 0:
            continue
        k = jnp.asarray(_gaussian_kernel1d(float(s), truncated))
        pad = (len(k) - 1) // 2
        moved = jnp.moveaxis(y, axis, -2)  # (..., L, C)
        lead = moved.shape[:-2]
        L, C = moved.shape[-2:]
        flat = moved.reshape(-1, L, C)
        padded = jnp.pad(
            flat, ((0, 0), (pad, pad), (0, 0)), mode="edge"
        )
        out = jax.lax.conv_general_dilated(
            padded,
            k[:, None, None] * jnp.eye(C)[None],
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = jnp.moveaxis(out.reshape(*lead, L, C), -2, axis)
    return y if x.ndim == 4 else y[..., 0]


def _smooth_dynamic(x: jax.Array, sigma: jax.Array, max_sigma: float):
    """Gaussian blur with a *traced* sigma: fixed-width erf kernel evaluated
    at runtime (width from max_sigma)."""
    tail = max(int(4.0 * max_sigma + 0.5), 1)
    i = jnp.arange(-tail, tail + 1, dtype=jnp.float32)
    denom = jnp.maximum(sigma, 1e-6) * math.sqrt(2.0)
    w = 0.5 * (
        jax.lax.erf((i + 0.5) / denom) - jax.lax.erf((i - 0.5) / denom)
    )
    # sigma -> 0 degenerates to identity
    w = jnp.where(sigma > 1e-4, w, (i == 0).astype(jnp.float32))
    w = w / jnp.sum(w)
    y = x if x.ndim == 4 else x[..., None]
    pad = tail
    for axis in range(3):
        moved = jnp.moveaxis(y, axis, -2)
        lead = moved.shape[:-2]
        L, C = moved.shape[-2:]
        flat = moved.reshape(-1, L, C)
        padded = jnp.pad(flat, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        out = jax.lax.conv_general_dilated(
            padded,
            w[:, None, None] * jnp.eye(C)[None],
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = jnp.moveaxis(out.reshape(*lead, L, C), -2, axis)
    return y if x.ndim == 4 else y[..., 0]


def rand_gaussian_smooth(
    key: jax.Array, x: jax.Array, *, sigma_range: tuple = (0.0, 0.1)
) -> jax.Array:
    """MONAI RandGaussianSmooth with per-axis σ ~ U(range). Uses one shared
    dynamic kernel per axis draw."""
    s = jax.random.uniform(
        key, (3,), minval=sigma_range[0], maxval=sigma_range[1]
    )
    # apply per-axis sequentially with axis-specific sigma
    y = x
    for axis in range(3):
        y = _smooth_axis_dynamic(y, s[axis], axis, max_sigma=sigma_range[1])
    return y


def _smooth_axis_dynamic(x, sigma, axis, max_sigma):
    tail = max(int(4.0 * max_sigma + 0.5), 1)
    i = jnp.arange(-tail, tail + 1, dtype=jnp.float32)
    denom = jnp.maximum(sigma, 1e-6) * math.sqrt(2.0)
    w = 0.5 * (
        jax.lax.erf((i + 0.5) / denom) - jax.lax.erf((i - 0.5) / denom)
    )
    w = jnp.where(sigma > 1e-4, w, (i == 0).astype(jnp.float32))
    w = w / jnp.sum(w)
    y = x if x.ndim == 4 else x[..., None]
    moved = jnp.moveaxis(y, axis, -2)
    lead = moved.shape[:-2]
    L, C = moved.shape[-2:]
    flat = moved.reshape(-1, L, C)
    padded = jnp.pad(flat, ((0, 0), (tail, tail), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        padded,
        w[:, None, None] * jnp.eye(C)[None],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    y = jnp.moveaxis(out.reshape(*lead, L, C), -2, axis)
    return y if x.ndim == 4 else y[..., 0]


def rand_gaussian_sharpen(
    key: jax.Array,
    x: jax.Array,
    *,
    sigma1_range: tuple = (0.5, 1.0),
    sigma2_range: tuple = (0.5, 1.0),
    alpha_range: tuple = (10.0, 30.0),
) -> jax.Array:
    """MONAI RandGaussianSharpen: b1 = blur(x, σ1); b2 = blur(b1, σ2);
    out = b1 + α·(b1 − b2)."""
    k1, k2, k3 = jax.random.split(key, 3)
    s1 = jax.random.uniform(
        k1, (), minval=sigma1_range[0], maxval=sigma1_range[1]
    )
    s2 = jax.random.uniform(
        k2, (), minval=sigma2_range[0], maxval=sigma2_range[1]
    )
    alpha = jax.random.uniform(
        k3, (), minval=alpha_range[0], maxval=alpha_range[1]
    )
    b1 = _smooth_dynamic(x, s1, max_sigma=sigma1_range[1])
    b2 = _smooth_dynamic(b1, s2, max_sigma=sigma2_range[1])
    return b1 + alpha * (b1 - b2)


# -----------------------------------------------------------------------------
# k-space transforms

def gibbs_noise(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Gibbs/truncation artifact: low-pass the centered 3D FFT, keeping a
    centered box of relative half-extent (1 − α) per axis (MONAI
    GibbsNoise semantics; α=0 identity, α=1 removes everything)."""
    vol = x if x.ndim == 3 else x[..., 0]
    f = jnp.fft.fftshift(jnp.fft.fftn(vol))
    D, H, W = vol.shape
    masks = []
    for size in (D, H, W):
        coords = jnp.abs(
            jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
        ) / (size / 2.0)
        masks.append(coords <= (1.0 - alpha))
    mask = (
        masks[0][:, None, None]
        & masks[1][None, :, None]
        & masks[2][None, None, :]
    )
    out = jnp.real(jnp.fft.ifftn(jnp.fft.ifftshift(f * mask)))
    out = out.astype(x.dtype)
    return out if x.ndim == 3 else out[..., None]


def rand_gibbs_noise(
    key: jax.Array, x: jax.Array, *, alpha_range: tuple = (0.0, 1.0)
) -> jax.Array:
    alpha = jax.random.uniform(
        key, (), minval=alpha_range[0], maxval=alpha_range[1]
    )
    return gibbs_noise(x, alpha)


def rand_kspace_spike(
    key: jax.Array, x: jax.Array, *, intensity_range: tuple = (11.0, 12.5)
) -> jax.Array:
    """k-space spike artifact (MONAI RandKSpaceSpikeNoise): boost one random
    frequency's log-magnitude."""
    vol = x if x.ndim == 3 else x[..., 0]
    D, H, W = vol.shape
    k1, k2 = jax.random.split(key)
    loc = jax.random.randint(
        k1, (3,), jnp.asarray([D // 4, H // 4, W // 4]),
        jnp.asarray([3 * D // 4, 3 * H // 4, 3 * W // 4]),
    )
    intensity = jax.random.uniform(
        k2, (), minval=intensity_range[0], maxval=intensity_range[1]
    )
    f = jnp.fft.fftshift(jnp.fft.fftn(vol))
    flat_idx = (loc[0] * H + loc[1]) * W + loc[2]
    f_flat = f.reshape(-1)
    phase = jnp.angle(f_flat[flat_idx])
    new_val = jnp.exp(intensity) * jnp.exp(1j * phase)
    f_flat = f_flat.at[flat_idx].set(new_val)
    out = jnp.real(jnp.fft.ifftn(jnp.fft.ifftshift(f_flat.reshape(D, H, W))))
    out = out.astype(x.dtype)
    return out if x.ndim == 3 else out[..., None]


def rand_motion_ghosting(
    key: jax.Array,
    x: jax.Array,
    *,
    num_ghosts_range: tuple = (2, 10),
    intensity_range: tuple = (0.1, 0.5),
) -> jax.Array:
    """torchio RandomMotion-style ghosting: attenuate every n-th k-space
    plane along a random axis."""
    vol = x if x.ndim == 3 else x[..., 0]
    k1, k2, k3 = jax.random.split(key, 3)
    axis = jax.random.randint(k1, (), 0, 3)
    n_ghosts = jax.random.randint(
        k2, (), num_ghosts_range[0], num_ghosts_range[1] + 1
    )
    intensity = jax.random.uniform(
        k3, (), minval=intensity_range[0], maxval=intensity_range[1]
    )
    f = jnp.fft.fftn(vol)
    D, H, W = vol.shape

    def mask_for(size):
        idx = jnp.arange(size)
        return jnp.where(idx % jnp.maximum(n_ghosts, 1) == 0,
                         1.0 - intensity, 1.0)

    m0 = mask_for(D)[:, None, None]
    m1 = mask_for(H)[None, :, None]
    m2 = mask_for(W)[None, None, :]
    ones0 = jnp.ones((D, 1, 1))
    ones1 = jnp.ones((1, H, 1))
    ones2 = jnp.ones((1, 1, W))
    mask = jax.lax.switch(
        axis,
        [
            lambda: m0 * ones1 * ones2,
            lambda: ones0 * m1 * ones2,
            lambda: ones0 * ones1 * m2,
        ],
    )
    out = jnp.real(jnp.fft.ifftn(f * mask)).astype(x.dtype)
    return out if x.ndim == 3 else out[..., None]


# -----------------------------------------------------------------------------
# resolution / spatial

def simulate_low_res(
    key: jax.Array, x: jax.Array, *, zoom_range: tuple = (0.5, 1.0)
) -> jax.Array:
    """nnUNet-style low-resolution simulation: nearest-downsample by a random
    zoom then trilinear-upsample back. Static shapes: computed at max zoom
    and blended by the sampled zoom via coordinate scaling."""
    from anatomix_tpu.ops.grid_sample import grid_sample, identity_grid

    vol = x if x.ndim == 4 else x[..., None]
    D, H, W = vol.shape[:3]
    zoom = jax.random.uniform(
        key, (), minval=zoom_range[0], maxval=zoom_range[1]
    )
    # nearest-downsample to a fixed small grid scaled by zoom, then
    # trilinear back. Grid size fixed at the minimum zoom for static shapes.
    d2 = max(int(D * zoom_range[0]), 1)
    h2 = max(int(H * zoom_range[0]), 1)
    w2 = max(int(W * zoom_range[0]), 1)
    # effective sampling: sample the volume on a (d2,h2,w2) grid covering a
    # zoom-dependent fraction, then resample back — approximates variable
    # zoom with static shapes.
    ident_small = identity_grid((d2, h2, w2), align_corners=False)
    small = grid_sample(
        vol[None], ident_small, mode="nearest", align_corners=False
    )
    ident_big = identity_grid((D, H, W), align_corners=False)
    big = grid_sample(
        small, ident_big, mode="bilinear", align_corners=False
    )[0]
    out = jnp.where(zoom < 0.999, big, vol)
    return out if x.ndim == 4 else out[..., 0]


def rand_flip(key: jax.Array, x: jax.Array, *, axes=(0, 1, 2)) -> jax.Array:
    """Random independent flips along spatial axes (torchio RandomFlip)."""
    flips = jax.random.bernoulli(key, 0.5, (len(axes),))
    y = x
    for i, axis in enumerate(axes):
        y = jnp.where(flips[i], jnp.flip(y, axis=axis), y)
    return y


def affine_matrix_3d(
    rotate=(0.0, 0.0, 0.0),
    scale=(1.0, 1.0, 1.0),
    shear=(0.0, 0.0, 0.0),
    translate=(0.0, 0.0, 0.0),
):
    """Compose a 3×4 affine (rotation ∘ shear ∘ scale + translation) in
    normalized coordinates, MONAI-style ordering."""
    rz, ry, rx = rotate[0], rotate[1], rotate[2]
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    Rz = jnp.array(
        [[1, 0, 0], [0, cz, -sz], [0, sz, cz]]
    )  # rotation about axis 0
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = jnp.array([[cx, -sx, 0], [sx, cx, 0], [0, 0, 1]])
    R = Rz @ Ry @ Rx
    Sh = jnp.array(
        [
            [1.0, shear[0], shear[1]],
            [0.0, 1.0, shear[2]],
            [0.0, 0.0, 1.0],
        ]
    )
    Sc = jnp.diag(jnp.asarray(scale, jnp.float32))
    M = R @ Sh @ Sc
    t = jnp.asarray(translate, jnp.float32)
    return jnp.concatenate([M, t[:, None]], axis=1)  # (3, 4)


def apply_affine(
    vol: jax.Array,  # (D, H, W) or (D, H, W, C)
    matrix: jax.Array,  # (3, 4) acting on normalized (z, y, x) coords
    *,
    mode: str = "bilinear",
    out_shape=None,
) -> jax.Array:
    """Resample `vol` through an affine in normalized [-1, 1] coordinates
    (zero padding, align_corners=False — torch affine_grid semantics)."""
    from anatomix_tpu.ops.grid_sample import grid_sample, identity_grid

    x = vol if vol.ndim == 4 else vol[..., None]
    out_shape = tuple(out_shape or x.shape[:3])
    ident = identity_grid(out_shape, align_corners=False)  # (1,...,3) xyz
    zyx = ident[..., ::-1]  # (z, y, x)
    src = (
        jnp.einsum("ij,...j->...i", matrix[:, :3], zyx) + matrix[:, 3]
    )
    grid = src[..., ::-1]  # back to (x, y, z)
    out = grid_sample(x[None], grid, mode=mode, align_corners=False)[0]
    return out if vol.ndim == 4 else out[..., 0]


def rand_affine_params(
    key: jax.Array,
    *,
    rotate_range: float = math.pi / 4,
    scale_range: float = 0.2,
    shear_range: float = 0.2,
):
    """Sample MONAI RandAffine-style parameters (uniform in ±range; scale
    factor 1 + u)."""
    kr, ks, kh = jax.random.split(key, 3)
    rot = jax.random.uniform(
        kr, (3,), minval=-rotate_range, maxval=rotate_range
    )
    scale = 1.0 + jax.random.uniform(
        ks, (3,), minval=-scale_range, maxval=scale_range
    )
    shear = jax.random.uniform(
        kh, (3,), minval=-shear_range, maxval=shear_range
    )
    return affine_matrix_3d(rotate=rot, scale=scale, shear=shear)


def rand_spatial_crop(
    key: jax.Array, vols: Sequence[jax.Array], crop: int
):
    """Shared random crop of aligned volumes to crop³ (MONAI
    RandSpatialCrop(random_size=False); also the pretraining shared
    `random_crop`, `pretraining/data/data_utils.py:81-175`)."""
    D, H, W = vols[0].shape[:3]
    kz, ky, kx = jax.random.split(key, 3)
    oz = jax.random.randint(kz, (), 0, max(D - crop, 0) + 1)
    oy = jax.random.randint(ky, (), 0, max(H - crop, 0) + 1)
    ox = jax.random.randint(kx, (), 0, max(W - crop, 0) + 1)
    outs = []
    for v in vols:
        if v.ndim == 3:
            outs.append(
                jax.lax.dynamic_slice(v, (oz, oy, ox), (crop, crop, crop))
            )
        else:
            outs.append(
                jax.lax.dynamic_slice(
                    v, (oz, oy, ox, 0), (crop, crop, crop, v.shape[-1])
                )
            )
    return outs


def maybe(key: jax.Array, prob: float, fn, x: jax.Array) -> jax.Array:
    """Apply `fn(key, x)` with probability `prob` (static shapes, lax.cond)."""
    kp, kf = jax.random.split(key)
    return jax.lax.cond(
        jax.random.uniform(kp) < prob,
        lambda v: fn(kf, v),
        lambda v: v,
        x,
    )
