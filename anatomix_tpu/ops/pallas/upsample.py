"""Pallas kernel: exact x2 trilinear upsample emitted in BLOCK layout.

One pass over the small tensor: each of the 8 block sub-positions is a
separable (0.75, 0.25) corner stencil of the edge-clamped neighborhood
(torch `Upsample(2, 'trilinear', align_corners=False)` boundary clamp ==
edge halo, reproduced here by the clamped-source DMAs). Replaces the XLA
flat-stencil form (`ops/resize.upsample2x_trilinear_block`), whose 8
stencil fusions + lane concat were ~6.1 ms of the 41 ms dev 94M fused
forward at 128-cube (wave-37 trace: resize.py:215/216/183) for what is
one ~170 MB read+write.

Reference semantics: `anatomix/model/network.py:498` Upsample(trilinear)
feeding the decoder concat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anatomix_tpu.ops.pallas.conv_block import (
    _VMEM_LIMIT,
    _clamp_maps,
    _halo_copies,
)


def _kernel_tri(dmap_ref, hmap_ref, x_hbm, out_ref, x_vmem, sems, *,
                td, th, W, C, interpret):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    off = 8
    for dma in _halo_copies(x_hbm, x_vmem, sems, b, dmap_ref, hmap_ref,
                            i, j, td=td, th=th, w=W, off=off):
        dma.wait()
    x_vmem[:, :, off - 1] = x_vmem[:, :, off]
    x_vmem[:, :, off + W] = x_vmem[:, :, off + W - 1]

    base = off - 1
    for sd in (0, 1):
        for sh in (0, 1):
            for sw in (0, 1):
                dirs = (
                    -1 if sd == 0 else 1,
                    -1 if sh == 0 else 1,
                    -1 if sw == 0 else 1,
                )
                acc = None
                for md in (0, dirs[0]):
                    for mh in (0, dirs[1]):
                        for mw in (0, dirs[2]):
                            nz = (md != 0) + (mh != 0) + (mw != 0)
                            coeff = jnp.float32(
                                0.75 ** (3 - nz) * 0.25 ** nz
                            )
                            t = coeff * x_vmem[
                                1 + md: 1 + md + td,
                                1 + mh: 1 + mh + th,
                                base + 1 + mw: base + 1 + mw + W,
                                :C,
                            ].astype(jnp.float32)
                            acc = t if acc is None else acc + t
                g = ((sd * 2 + sh) * 2 + sw) * C
                out_ref[0, :, :, :, g: g + C] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret")
)
def upsample2x_trilinear_block_pallas(
    x: jax.Array,  # (B, s, s, s, C) spatial small tensor, un-padded
    *,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """(B, s, s, s, C) -> (B, s, s, s, 8C) block form of the x2 trilinear
    upsample ((sub_d, sub_h, sub_w)-major channel order). Bit-compatible
    with `resize.upsample2x_trilinear_block`'s flat form (f32: identical
    corner accumulation order)."""
    B, d, h, w, C = x.shape
    out_dtype = x.dtype if out_dtype is None else jnp.dtype(out_dtype)
    # manual-DMA minor-dim rule: lane count % 128 — pad channels (the
    # kernel reads back only :C)
    Cp = -(-C // 128) * 128
    if Cp != C:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, Cp - C),))
    off = 8
    Wp = off + w + 1

    # tile: input (td+2)(th+2)*Wp*Cp + out tile + f32 acc
    def cost(td, th):
        xt = (td + 2) * (th + 2) * Wp * Cp * x.dtype.itemsize
        ot = td * th * w * 8 * C * jnp.dtype(out_dtype).itemsize
        acc = td * th * w * C * 4
        return 2 * (xt + ot) + 2 * acc

    best = (1, 1)
    for td in (16, 8, 4, 2, 1):
        if d % td:
            continue
        for th in (16, 8, 4, 2, 1):
            if h % th:
                continue
            if cost(td, th) <= 24 * 2 ** 20 and td * th > best[0] * best[1]:
                best = (td, th)
    td, th = best
    dmap, hmap = _clamp_maps(d, h, td, th)
    kernel = functools.partial(_kernel_tri, td=td, th=th, W=w, C=C,
                               interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, d // td, h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, td, th, w, 8 * C), lambda b, i, j, *_: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, Cp), x.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, 8 * C), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=27 * B * d * h * w * C,
            bytes_accessed=x.nbytes + 8 * C * B * d * h * w
            * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dmap, hmap, x)
