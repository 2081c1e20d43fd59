"""Feature merging: MIND-SSC ‖ network features, with optional mask infill.

Semantics match `merge_features` (`/root/reference/anatomix/registration/
instance_optimization.py:16-119`): with masks, the image outside the mask is
filled with its nearest in-mask intensity (computed on a ::2 subsample via a
Euclidean distance transform with indices, then trilinearly upsampled, with
in-mask voxels overwritten by the original image) before MIND, and network
features are zeroed outside the mask.

The EDT runs on device (`ops/edt.py`, exact separable min-plus transform) —
the reference leaves the device for scipy here, but through a slow host link
that round trip costs more than the transform. Distances match scipy
exactly; at exact-tie sites a different (equidistant) source voxel may be
chosen, so infilled values can differ there (see `ops/edt.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.ops.edt import edt_feature_transform
from anatomix_tpu.ops.pool import avg_pool3d
from anatomix_tpu.ops.resize import resize3d
from anatomix_tpu.registration.mind import mindssc


def _edt_infill(img: jax.Array, mask: jax.Array) -> jax.Array:
    """Replace out-of-mask voxels with nearest in-mask intensities
    (reference recipe: ::2 subsample EDT -> gather -> trilinear ×2 ->
    overwrite in-mask voxels)."""
    H, W, D = img.shape
    sub_mask = mask[::2, ::2, ::2]
    idx, _ = edt_feature_transform(sub_mask)
    sub_img = img[::2, ::2, ::2]
    filled_sub = sub_img[idx[0], idx[1], idx[2]]
    filled = resize3d(
        filled_sub.astype(jnp.float32)[None, ..., None],
        (H, W, D),
        mode="trilinear",
        align_corners=False,
    )[0, ..., 0]
    return jnp.where(mask > 0, img, filled).astype(jnp.float32)


def merge_features(
    use_mask: bool,
    pred_fixed: jax.Array,  # (1, H, W, D, C) network features
    pred_moving: jax.Array,
    mask_fixed: np.ndarray | None,  # (H, W, D) binary
    mask_moving: np.ndarray | None,
    fixed_img: np.ndarray,  # (H, W, D) raw intensities
    moving_img: np.ndarray,
):
    """Returns (mind_fixed, mind_moving, merged_fixed, merged_moving),
    merged = concat([MIND (12ch), network features], channel-last)."""
    if use_mask:
        H, W, D = fixed_img.shape

        def smooth_mask(m):
            sm = avg_pool3d(
                jnp.pad(
                    jnp.asarray(m, jnp.float32)[None, ..., None],
                    ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                    mode="edge",
                ),
                3,
                stride=1,
                padding=0,
            )
            return (sm[0, ..., 0] > 0.9).astype(jnp.float32)

        mf = smooth_mask(mask_fixed)
        mm = smooth_mask(mask_moving)
        fixed_r = _edt_infill(jnp.asarray(fixed_img, jnp.float32), mf)
        moving_r = _edt_infill(jnp.asarray(moving_img, jnp.float32), mm)

        mind_fixed = mindssc(fixed_r[None, ..., None], 1, 2)
        mind_moving = mindssc(moving_r[None, ..., None], 1, 2)
        pred_fixed = pred_fixed * jnp.asarray(mask_fixed, jnp.float32)[
            None, ..., None
        ]
        pred_moving = pred_moving * jnp.asarray(mask_moving, jnp.float32)[
            None, ..., None
        ]
    else:
        mind_fixed = mindssc(
            jnp.asarray(fixed_img, jnp.float32)[None, ..., None], 1, 2
        )
        mind_moving = mindssc(
            jnp.asarray(moving_img, jnp.float32)[None, ..., None], 1, 2
        )

    merged_fixed = jnp.concatenate([mind_fixed, pred_fixed], axis=-1)
    merged_moving = jnp.concatenate([mind_moving, pred_moving], axis=-1)
    return mind_fixed, mind_moving, merged_fixed, merged_moving
