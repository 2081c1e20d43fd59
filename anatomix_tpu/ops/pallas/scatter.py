"""Pallas TPU kernel: Gaussian-blend sliding-window scatter-accumulate.

The XLA lane-folded scatter (ops/sliding_window.py `scatter_one`) costs
~3.9-4.2 ms per 128-cube window and is canvas-size-independent
(tools/_exp_scatter2.py) — the cost is the unaligned dynamic-update-slice
chain itself, ~6x over its HBM traffic floor. This kernel does the
read-modify-write with manual DMAs at the traffic floor:

* The canvas keeps the lane-folded layout (D, H, Wf, fold*C=128) f32 and
  is updated IN PLACE (input_output_aliases) — only the touched slabs
  move; window d/h offsets land on untiled dims and the folded w offset
  needs no alignment on the HBM side.
* The window product arrives lane-merged as (B, r0, r1, r2*C): the
  window's intra-fold phase k = s2 % fold becomes ONE dynamic lane roll
  by k*C (pltpu.roll, f32), after which every folded canvas column reads
  a static 128-lane slice.
* The blend weights are applied in-kernel from separable factors
  (gdh = gd x gh outer product, per-phase folded gw tables with boundary
  zeros) with MONAI's max(m, min_nonzero) clamp computed per element —
  matching `gaussian_importance_map` to f32 rounding.

Reference semantics: MONAI sliding_window_inference gaussian blending
(`convex_adam_utils.py:202-219`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 40 * 2 ** 20


ALIGN = 8  # f32 sublane tile: canvas slab column bases must be 8-aligned
# (a DMA with a dynamic UNALIGNED offset on the second-to-last dim crashes
# the TPU worker — tools/_exp_scatterprobe.py probe_hbm_sublane_slice); the
# residual column shift is absorbed into the lane roll, growing the phase
# space to fold*ALIGN and the slab by ALIGN columns.


def fold_tables(imp_axes, minv: float, fold: int, C: int):
    """Per-phase folded w-weight and validity tables (host-side, f64).

    imp_axes: the three per-axis window functions from
    `gaussian_importance_map` BEFORE normalization, or ones. Returns
    (gdh (r0, r1) f32, gw_fold (fold*ALIGN, cols, fold*C) f32 with
    boundary zeros, valid (same) f32 1/0) where phase
    k = s2 % (fold*ALIGN) and cols = r2//fold + ALIGN.
    """
    g0, g1, g2 = imp_axes
    r2 = len(g2)
    phases = fold * ALIGN
    cols = r2 // fold + ALIGN
    gdh = np.outer(g0, g1).astype(np.float32)
    gw_fold = np.zeros((phases, cols, fold * C), np.float32)
    valid = np.zeros((phases, cols, fold * C), np.float32)
    for k in range(phases):
        for f in range(cols):
            for j in range(fold):
                wloc = f * fold + j - k
                if 0 <= wloc < r2:
                    gw_fold[k, f, j * C: (j + 1) * C] = g2[wloc]
                    valid[k, f, j * C: (j + 1) * C] = 1.0
    return gdh, gw_fold, valid


def _kernel(starts_ref, mask_ref, canvas_ref, prod_ref, gdh_ref, gw_ref,
            v_ref, out_ref, slab, sems, *, td, r1, cols, fold, C, minv,
            interpret):
    b = pl.program_id(0)
    i = pl.program_id(1)
    s0 = starts_ref[b, 0]
    s1 = starts_ref[b, 1]
    s2 = starts_ref[b, 2]
    # 8-aligned slab base; the residual shift rides the lane roll
    off = (s2 // (fold * ALIGN)) * ALIGN
    k = s2 % (fold * ALIGN)
    lanes = fold * C

    read = pltpu.make_async_copy(
        out_ref.at[pl.ds(s0 + i * td, td), pl.ds(s1, r1),
                   pl.ds(off, cols), :],
        slab,
        sems.at[0],
    )
    read.start()
    read.wait()

    p32 = prod_ref[0].astype(jnp.float32)
    rolled = pltpu.roll(p32, k * C, axis=2)
    # mask must multiply AFTER the clamp: max(0 * gw, minv) = minv would
    # resurrect padding windows wherever the clamp floor is nonzero
    maskf = mask_ref[b].astype(jnp.float32)
    gdh = gdh_ref[...].astype(jnp.float32)[:, :, None]
    L = p32.shape[-1]
    for f in range(cols):
        gw = gw_ref[k, f][None, None, :]
        vv = v_ref[k, f][None, None, :] * maskf
        w = jnp.maximum(gdh * gw, minv) * vv
        # columns past r2*C wrap around the roll: with L = r2*C a
        # multiple of fold*C, wrapped values land on exactly the
        # window voxels the column needs (validity zeros the rest)
        g = (f * lanes) % L
        slab[:, :, f, :] += rolled[:, :, g: g + lanes] * w

    write = pltpu.make_async_copy(
        slab,
        out_ref.at[pl.ds(s0 + i * td, td), pl.ds(s1, r1),
                   pl.ds(off, cols), :],
        sems.at[1],
    )
    write.start()
    write.wait()


@functools.partial(
    jax.jit, static_argnames=("fold", "C", "minv", "interpret")
)
def blend_scatter_chunk(
    canvas: jax.Array,   # (D, H, Wf, fold*C) f32 lane-folded accumulator
    prod: jax.Array,     # (B, r0, r1, r2*C) window outputs, lane-merged
    starts: jax.Array,   # (B, 3) int32 window starts (in-bounds)
    mask: jax.Array,     # (B,) int32 1 = real window, 0 = padding
    gdh: jax.Array,      # (r0, r1) f32 separable blend factor
    gw_fold: jax.Array,  # (fold, cols, fold*C) f32 folded w factor
    valid: jax.Array,    # (fold, cols, fold*C) f32 boundary validity
    *,
    fold: int,
    C: int,
    minv: float,
    interpret: bool = False,
) -> jax.Array:
    """canvas[s0:+r0, s1:+r1, w-region] += prod * max(imp, minv), in place.

    Returns the updated canvas (aliased with the input)."""
    B, r0, r1, r2C = prod.shape
    cols = gw_fold.shape[1]
    lanes = fold * C

    td = r0
    while td > 1 and (
        r0 % td
        or (2 * td * r1 * cols * lanes * 4
            + 3 * td * r1 * r2C * prod.dtype.itemsize)
        > 24 * 2 ** 20
    ):
        td //= 2

    kernel = functools.partial(
        _kernel, td=td, r1=r1, cols=cols, fold=fold, C=C, minv=minv,
        interpret=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, r0 // td),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # canvas (aliased)
            pl.BlockSpec(
                (1, td, r1, r2C), lambda b, i, *_: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (td, r1), lambda b, i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gw_fold
            pl.BlockSpec(memory_space=pltpu.VMEM),  # valid
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((td, r1, cols, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
        input_output_aliases={2: 0},  # flat inputs: starts, mask, canvas
        cost_estimate=pl.CostEstimate(
            flops=2 * B * r0 * r1 * r2C,
            bytes_accessed=2 * B * r0 * r1 * cols * lanes * 4
            + prod.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(starts, mask, canvas, prod, gdh, gw_fold, valid)
