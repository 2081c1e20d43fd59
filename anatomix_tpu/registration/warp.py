"""Displacement-field utilities: inverse consistency, warping, regularizers,
Jacobian determinant.

Layout conventions (matching the reference's torch tensors, channel-last):
volumes (1, H, W, D, C); displacement fields (1, H, W, D, 3) with channels
(dH, dW, dD) in *voxel* units, or (x, y, z)-ordered *normalized* fields for
grid_sample (x ↔ D axis), exactly like the reference flips between the two
(`instance_optimization.py:206-217`, `run_convex_adam...py:243-246`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from anatomix_tpu.ops.grid_sample import (
    grid_sample,
    identity_grid,
    make_packed_sampler,
)
from anatomix_tpu.ops.pool import box_filter


def diffusion_regularizer(
    disp_sample: jax.Array, lambda_weight: float
) -> jax.Array:
    """First-difference MSE over the three spatial axes
    (`convex_adam_utils.py:81-102`); input (1, H, W, D, 3)."""
    d = disp_sample[0]
    loss = (
        jnp.mean((d[:, 1:, :] - d[:, :-1, :]) ** 2)
        + jnp.mean((d[1:, :, :] - d[:-1, :, :]) ** 2)
        + jnp.mean((d[:, :, 1:] - d[:, :, :-1]) ** 2)
    )
    return lambda_weight * loss


def inverse_consistency(
    disp1: jax.Array,  # (1, H, W, D, 3) normalized, (x, y, z)-ordered
    disp2: jax.Array,
    iterations: int = 20,
):
    """Fixed-point inverse-consistency iterations
    (`convex_adam_utils.py:555-603`): dispᵢ ← ½(disp − sample(dispⱼ at
    id+dispᵢ)), both directions, bilinear zero-padded sampling with
    align_corners=False."""
    spatial = disp1.shape[1:4]
    ident = identity_grid(spatial, align_corners=False)

    def body(_, carry):
        d1, d2 = carry
        # packed single-row-gather sampling (see make_packed_sampler)
        s2 = make_packed_sampler(d2, align_corners=False)(ident + d1)
        s1 = make_packed_sampler(d1, align_corners=False)(ident + d2)
        return 0.5 * (d1 - s2), 0.5 * (d2 - s1)

    d1, d2 = jax.lax.fori_loop(0, iterations, body, (disp1, disp2))
    return d1, d2


def normalize_disp(disp_vox: jax.Array) -> jax.Array:
    """(1,H,W,D,3) voxel-unit (dH,dW,dD) -> normalized (x,y,z)-ordered field
    suitable for grid_sample with align_corners=False (the `disp / denom * 2
    ... flip` step, `run_convex_adam...py:243-246`)."""
    H, W, D = disp_vox.shape[1:4]
    denom = jnp.asarray([H - 1, W - 1, D - 1], jnp.float32)
    normalized = disp_vox / denom * 2.0
    return normalized[..., ::-1]  # (dH,dW,dD) -> (dD,dW,dH) = (x,y,z)


def warp_volume(
    vol: jax.Array,  # (1, H, W, D, C)
    disp_vox: jax.Array,  # (1, H, W, D, 3) voxel units (dH, dW, dD)
    *,
    mode: str = "bilinear",
) -> jax.Array:
    """Warp `vol` by the displacement field (the reference's final image /
    label warping, `run_convex_adam...py:238-266`)."""
    spatial = vol.shape[1:4]
    grid = identity_grid(spatial, align_corners=False) + normalize_disp(
        disp_vox
    )
    return grid_sample(vol, grid, mode=mode, align_corners=False)


def smooth_disp(disp: jax.Array, kernel_size: int, num_repeats: int = 3):
    """Optional post-smoothing (`instance_optimization.py:396-397`)."""
    return box_filter(disp, kernel_size, num_repeats)


def generate_grid(imgshape) -> jax.Array:
    """Voxel-coordinate grid (H, W, D, 3), channels (x=D, y=W, z=H) order
    matching the reference's `generate_grid` (`convex_adam_utils.py:
    226-246`)."""
    H, W, D = imgshape
    z, y, x = jnp.meshgrid(
        jnp.arange(H), jnp.arange(W), jnp.arange(D), indexing="ij"
    )
    return jnp.stack([x, y, z], axis=-1).astype(jnp.float32)


def jacobian_det(disp: jax.Array, sample_grid: jax.Array) -> jax.Array:
    """Finite-difference Jacobian determinant of a deformation
    (`convex_adam_utils.py:249-282`); disp (1, H, W, D, 3) + grid
    (H, W, D, 3) -> (1, H-1, W-1, D-1)."""
    J = disp + sample_grid[None]
    dy = J[:, 1:, :-1, :-1, :] - J[:, :-1, :-1, :-1, :]
    dx = J[:, :-1, 1:, :-1, :] - J[:, :-1, :-1, :-1, :]
    dz = J[:, :-1, :-1, 1:, :] - J[:, :-1, :-1, :-1, :]
    det0 = dx[..., 0] * (dy[..., 1] * dz[..., 2] - dy[..., 2] * dz[..., 1])
    det1 = dx[..., 1] * (dy[..., 0] * dz[..., 2] - dy[..., 2] * dz[..., 0])
    det2 = dx[..., 2] * (dy[..., 0] * dz[..., 1] - dy[..., 1] * dz[..., 0])
    return det0 - det1 + det2
