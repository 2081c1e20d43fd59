"""Resampling ops (NDHWC) with torch `F.interpolate` / `nn.Upsample` parity.

* 'nearest': torch's legacy nearest (src = floor(dst * in/out)) — the UNet
  decoder default (`/root/reference/anatomix/model/network.py:407`).
* 'trilinear': align_corners True/False (half-pixel) both supported; used by
  the decoder ('anatomix-dev'), stage-1 upsampling and instance-opt output
  (`/root/reference/anatomix/registration/instance_optimization.py:212-217,
  388-393`).

Implemented as separable 1-D gathers/linear maps per axis so XLA lowers them
to cheap dot/gather fusions instead of a generic gather-scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _nearest_indices(out_size: int, in_size: int) -> np.ndarray:
    # torch 'nearest' (not 'nearest-exact'): floor(i * in / out)
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(
        np.int64
    )
    return np.clip(idx, 0, in_size - 1)


def _linear_weights(
    out_size: int, in_size: int, align_corners: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (idx0, idx1, frac) for 1-D linear interpolation, torch rules."""
    out = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = out * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (out + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, None)  # torch clamps negative to 0
    idx0 = np.floor(src).astype(np.int64)
    idx0 = np.clip(idx0, 0, in_size - 1)
    idx1 = np.minimum(idx0 + 1, in_size - 1)
    frac = (src - idx0).astype(np.float32)
    return idx0, idx1, frac


def _interp_axis(x, axis, idx0, idx1, frac):
    a = jnp.take(x, jnp.asarray(idx0), axis=axis)
    b = jnp.take(x, jnp.asarray(idx1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = -1
    f = jnp.asarray(frac).reshape(shape).astype(jnp.float32)
    return a.astype(jnp.float32) * (1 - f) + b.astype(jnp.float32) * f


def resize3d(
    x: jax.Array,
    size: tuple[int, int, int],
    *,
    mode: str = "trilinear",
    align_corners: bool = False,
) -> jax.Array:
    """Resize spatial dims of NDHWC `x` to `size` with torch semantics."""
    in_sizes = x.shape[1:4]
    if tuple(size) == tuple(in_sizes):
        return x
    if mode == "nearest":
        for axis, (o, i) in enumerate(zip(size, in_sizes)):
            if o != i:
                x = jnp.take(
                    x, jnp.asarray(_nearest_indices(o, i)), axis=axis + 1
                )
        return x
    if mode == "trilinear":
        dtype = x.dtype
        y = x
        for axis, (o, i) in enumerate(zip(size, in_sizes)):
            if o != i:
                idx0, idx1, frac = _linear_weights(o, i, align_corners)
                y = _interp_axis(y, axis + 1, idx0, idx1, frac)
        return y.astype(dtype)
    raise ValueError(f"Unsupported resize mode: {mode}")


def upsample2x(x: jax.Array, mode: str = "nearest") -> jax.Array:
    """The UNet decoder's `nn.Upsample(scale_factor=2, mode=...)`."""
    size = tuple(2 * s for s in x.shape[1:4])
    return resize3d(x, size, mode=mode, align_corners=False)
