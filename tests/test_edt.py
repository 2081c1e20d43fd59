"""Device EDT (`ops/edt.py`) vs the scipy oracle the reference uses.

Reference semantics: `distance_transform_edt(mask == 0, return_indices=True)`
(`/root/reference/anatomix/registration/instance_optimization.py:67-96`) —
for every voxel, the nearest voxel where mask != 0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import distance_transform_edt as scipy_edt

from anatomix_tpu.ops.edt import edt_feature_transform, edt_infill


def _random_mask(rng, shape, p):
    return (rng.random(shape) < p).astype(np.int32)


@pytest.mark.parametrize(
    "shape,p",
    [
        ((16, 16, 16), 0.05),
        ((24, 16, 12), 0.02),  # non-cube, non-power-of-2 axis
        ((13, 17, 9), 0.3),  # odd sizes (chunking fallback path)
        ((32, 32, 32), 0.001),  # sparse foreground, long distances
    ],
)
def test_distances_match_scipy_exactly(shape, p):
    rng = np.random.default_rng(hash(shape) % 2**31)
    mask = _random_mask(rng, shape, p)
    if mask.sum() == 0:
        mask[tuple(s // 2 for s in shape)] = 1

    idx, dist2 = jax.jit(edt_feature_transform)(jnp.asarray(mask))
    dist = scipy_edt(mask == 0)

    np.testing.assert_array_equal(
        np.asarray(dist2), np.round(dist**2).astype(np.int64)
    )

    # every returned index must point AT a foreground voxel at exactly the
    # optimal distance (ties may differ from scipy's pick)
    ix, iy, iz = np.asarray(idx)
    assert mask[ix, iy, iz].all()
    gx, gy, gz = np.indices(shape)
    d2_at_idx = (gx - ix) ** 2 + (gy - iy) ** 2 + (gz - iz) ** 2
    np.testing.assert_array_equal(d2_at_idx, np.asarray(dist2))


def test_all_foreground_is_identity():
    mask = np.ones((8, 9, 10), np.int32)
    idx, dist2 = edt_feature_transform(jnp.asarray(mask))
    assert int(np.asarray(dist2).max()) == 0
    gx, gy, gz = np.indices(mask.shape)
    np.testing.assert_array_equal(np.asarray(idx), np.stack([gx, gy, gz]))


def test_single_voxel_foreground():
    mask = np.zeros((11, 11, 11), np.int32)
    mask[3, 7, 2] = 1
    idx, dist2 = edt_feature_transform(jnp.asarray(mask))
    ix, iy, iz = np.asarray(idx)
    assert (ix == 3).all() and (iy == 7).all() and (iz == 2).all()
    gx, gy, gz = np.indices(mask.shape)
    np.testing.assert_array_equal(
        np.asarray(dist2), (gx - 3) ** 2 + (gy - 7) ** 2 + (gz - 2) ** 2
    )


def test_infill_matches_scipy_at_unique_nearest():
    """Infilled values equal the scipy recipe everywhere the nearest
    foreground voxel is unique (tie sites may legitimately differ)."""
    rng = np.random.default_rng(0)
    shape = (20, 18, 14)
    mask = _random_mask(rng, shape, 0.04)
    mask[5, 5, 5] = 1
    img = rng.random(shape).astype(np.float32)

    ours = np.asarray(edt_infill(jnp.asarray(img), jnp.asarray(mask)))

    _, sidx = scipy_edt(mask == 0, return_indices=True)
    ref = img[sidx[0], sidx[1], sidx[2]]
    ref = np.where(mask > 0, img, ref)

    # tie detection: a site is a tie iff scipy's pick and ours are different
    # voxels at equal distance; at non-tie sites values must match exactly
    idx, dist2 = edt_feature_transform(jnp.asarray(mask))
    ix, iy, iz = np.asarray(idx)
    same_voxel = (ix == sidx[0]) & (iy == sidx[1]) & (iz == sidx[2])
    np.testing.assert_array_equal(ours[same_voxel], ref[same_voxel])
    # and at differing picks, both must be optimal
    gx, gy, gz = np.indices(shape)
    d2_scipy = (gx - sidx[0]) ** 2 + (gy - sidx[1]) ** 2 + (gz - sidx[2]) ** 2
    np.testing.assert_array_equal(
        d2_scipy[~same_voxel], np.asarray(dist2)[~same_voxel]
    )
