"""Pallas TPU kernel: Gaussian-blend sliding-window scatter-accumulate.

The XLA lane-folded scatter (ops/sliding_window.py `scatter_one`) costs
~3.9-4.2 ms per 128-cube window and is canvas-size-independent
(tools/_exp_scatter2.py) — the cost is the unaligned dynamic-update-slice
chain itself, ~6x over its HBM traffic floor. This kernel does the
read-modify-write near the traffic floor.

Design (v5, the survivor of a five-design HW bisect): the canvas keeps
each flat (W*C) row FOLDED as an (M, 128) raster, i.e. canvas
(D, H, M, 128) f32 updated IN PLACE (input_output_aliases), so both
dynamically sliced dims (d, h) are UNTILED — the one dynamic-offset DMA
pattern proven safe on HW. The window's flat w-offset k = s2*C moves
the zero-padded weighted product in-register: a lane roll by k%128 plus
a per-lane-selected sublane roll by k//128 (+1 where lanes wrapped);
starts are in-bounds so nothing escapes the raster. The grid walks
(window, d-row) so every value in the kernel body is rank-3, and the
gdh table arrives transposed + padded to roll-aligned extents. Blend
weights apply BEFORE the rolls from separable factors (gdh = gd x gh
outer product, folded per-lane gw) with MONAI's max(imp, min_nonzero)
clamp per element; masked padding windows multiply to zero after the
clamp.

Dead ends, all probed on hardware (waves 10-18): v1 4-D slab with
dynamic sublane DMA offsets — crashes the worker even 8-aligned; v2
3-D flat-lane canvas — Mosaic refuses unaligned dynamic slices on the
sublane-tiled dim; v3 8-aligned base + pl.multiple_of — worked, but its
small-td gdh BlockSpec breaks the 8-sublane block rule at real scale;
v4 rank-4 kernel values — 'infer-vector-layout: unsupported shape
cast'. Also: value-level strided slices lower to unsupported >2D
gathers (ref-level strided loads are fine, 32-bit only), and
in-kernel minor-dim merge reshapes are unsupported.

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


def lane_tables(imp_axes, C: int):
    """Host-side separable blend factors for the kernel: gdh (r0, r1) f32
    outer product of the first two axes, gw (r2*C,) f32 per-lane w factor.
    `imp_axes` must be the NORMALIZED per-axis factors returned by
    `sliding_window.gaussian_importance_axes` — the ones whose outer
    product equals the clamped importance map before clipping (i.e. the
    same factors the blend_weight_map denominator and minv clamp are
    built from; passing unnormalized windows would scale the blend
    numerator inconsistently with the denominator). Or ones."""
    g0, g1, g2 = imp_axes
    gdh = np.outer(g0, g1).astype(np.float32)
    gw = np.repeat(np.asarray(g2, np.float64), C).astype(np.float32)
    return gdh, gw


def _kernel_fold(starts_ref, mask_ref, canvas_ref, prod_ref, gdht_ref,
                 gw_ref, out_ref, slab, sems, *, r1, M, Mr, C, minv):
    # ALL value compute is rank-3 (grid walks d-rows, td == 1): rank-4
    # broadcasts/casts are unsupported Mosaic shape casts (wave-17
    # 'infer-vector-layout: unsupported shape cast'); every op below is
    # in the class the v3 kernel already compiled AND ran on HW —
    # rank-3 trailing-unit broadcasts, jnp.pad, dynamic lane/sublane
    # pltpu.roll, iota + where selects.
    b = pl.program_id(0)
    i = pl.program_id(1)
    s0 = starts_ref[b, 0]
    s1 = starts_ref[b, 1]
    s2 = starts_ref[b, 2]

    read = pltpu.make_async_copy(
        out_ref.at[pl.ds(s0 + i, 1), pl.ds(s1, r1), :, :],
        slab,
        sems.at[0],
    )
    read.start()

    p32 = prod_ref[0, 0].astype(jnp.float32)  # (r1, Mr, 128)
    # gdh is stored TRANSPOSED and zero-padded to (r1p>=8k, r0p=128k)
    # (pltpu.roll rejects unaligned shapes); column i comes to the
    # front with a dynamic lane roll + static slice (rank-preserving)
    r0p = gdht_ref.shape[1]
    g = pltpu.roll(gdht_ref[...], r0p - i, axis=1)[:r1, :1]  # (r1, 1)
    # mask multiplies AFTER the clamp: max(0 * gw, minv) = minv would
    # resurrect padding windows wherever the clamp floor is nonzero
    w = jnp.maximum(
        g.astype(jnp.float32)[:, :, None] * gw_ref[...],
        minv,
    ) * mask_ref[b].astype(jnp.float32)
    pw = p32 * w
    padded = jnp.pad(pw, ((0, 0), (0, M - Mr), (0, 0)))
    # flat roll of the (M, 128) raster by k = s2*C: lane roll by k%128,
    # then lanes that wrapped take one extra sublane-roll step
    k = s2 * C
    r = k % 128
    q = k // 128
    t1 = pltpu.roll(padded, r, axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, t1.shape, 2)
    rolled = jnp.where(
        lane >= r,
        pltpu.roll(t1, q, axis=1),
        pltpu.roll(t1, q + 1, axis=1),
    )

    read.wait()
    slab[0] += rolled
    write = pltpu.make_async_copy(
        slab,
        out_ref.at[pl.ds(s0 + i, 1), pl.ds(s1, r1), :, :],
        sems.at[1],
    )
    write.start()
    write.wait()


@functools.partial(
    jax.jit, static_argnames=("C", "minv", "interpret")
)
def blend_scatter_fold(
    canvas: jax.Array,   # (D, H, W*C/128, 128) f32 folded accumulator
    prod: jax.Array,     # (B, r0, r1, r2*C/128, 128) window outputs
    starts: jax.Array,   # (B, 3) int32 window starts (in-bounds)
    mask: jax.Array,     # (B,) int32 1 = real window, 0 = padding
    gdh: jax.Array,      # (r0, r1) f32 separable blend factor
    gw: jax.Array,       # (r2*C/128, 128) f32 folded w blend factor
    *,
    C: int,
    minv: float,
    interpret: bool = False,
) -> jax.Array:
    """Folded-canvas blend scatter (v5): the canvas keeps the flat (W*C)
    row folded into (M, 128) so BOTH dynamically sliced dims (d, h) are
    untiled — the probe-proven DMA pattern, with no sublane-alignment
    games. The window's flat w-offset k = s2*C becomes a lane roll by
    k%128 plus a per-lane-selected sublane roll by k//128 (+1 for
    wrapped lanes); starts are in-bounds so nothing escapes the raster.
    The grid walks (window, d-row) so every value in the kernel body is
    rank-3 (rank-4 broadcasts are unsupported Mosaic shape casts)."""
    B, r0, r1, Mr, lanes = prod.shape
    D, H, M, lanes_c = canvas.shape
    assert lanes == 128 and lanes_c == 128

    # transpose + pad the blend table to roll-aligned extents
    r0p = -(-r0 // 128) * 128
    r1p = -(-r1 // 8) * 8
    gdht = jnp.swapaxes(gdh, 0, 1)
    if (r0p, r1p) != (r0, r1):
        gdht = jnp.pad(gdht, ((0, r1p - r1), (0, r0p - r0)))

    kernel = functools.partial(
        _kernel_fold, r1=r1, M=M, Mr=Mr, C=C, minv=minv,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, r0),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # canvas (aliased)
            pl.BlockSpec(
                (1, 1, r1, Mr, 128), lambda b, i, *_: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (r1p, r0p), lambda b, i, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Mr, 128), lambda b, i, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, r1, M, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
        input_output_aliases={2: 0},  # flat inputs: starts, mask, canvas
        cost_estimate=pl.CostEstimate(
            flops=2 * B * r0 * r1 * Mr * 128,
            bytes_accessed=2 * B * r0 * r1 * M * 128 * 4 + prod.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(starts, mask, canvas, prod, gdht, gw[None])
