"""Feature merging: MIND-SSC ‖ network features, with optional mask infill.

Semantics match `merge_features` (`/root/reference/anatomix/registration/
instance_optimization.py:16-119`): with masks, the image outside the mask is
filled with its nearest in-mask intensity (computed on a ::2 subsample via a
Euclidean distance transform with indices, then trilinearly upsampled, with
in-mask voxels overwritten by the original image) before MIND, and network
features are zeroed outside the mask.

The EDT runs on host (scipy) — it is a preprocessing step outside the jitted
solver loop, exactly where the reference also leaves the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.ops.pool import avg_pool3d
from anatomix_tpu.ops.resize import resize3d
from anatomix_tpu.registration.mind import mindssc


def _edt_infill(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Replace out-of-mask voxels with nearest in-mask intensities
    (reference recipe: ::2 subsample EDT -> gather -> trilinear ×2 ->
    overwrite in-mask voxels)."""
    from scipy.ndimage import distance_transform_edt as edt

    H, W, D = img.shape
    sub_mask = mask[::2, ::2, ::2]
    _, idx = edt(sub_mask == 0, return_indices=True)
    sub_img = img[::2, ::2, ::2]
    filled_sub = sub_img[idx[0], idx[1], idx[2]]
    filled = np.asarray(
        resize3d(
            jnp.asarray(filled_sub, jnp.float32)[None, ..., None],
            (H, W, D),
            mode="trilinear",
            align_corners=False,
        )
    )[0, ..., 0]
    out = np.where(mask > 0, img, filled)
    return out.astype(np.float32)


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
            return np.asarray((sm[0, ..., 0] > 0.9), np.float32)

        mf = smooth_mask(mask_fixed)
        mm = smooth_mask(mask_moving)
        fixed_r = _edt_infill(np.asarray(fixed_img, np.float32), mf)
        moving_r = _edt_infill(np.asarray(moving_img, np.float32), mm)

        mind_fixed = mindssc(
            jnp.asarray(fixed_r)[None, ..., None], 1, 2
        )
        mind_moving = mindssc(
            jnp.asarray(moving_r)[None, ..., None], 1, 2
        )
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
