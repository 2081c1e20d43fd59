"""Pallas kernel: per-(spatial-tile, lane) affine + activation on a
block-layout tensor — the apply half of (tiled) instance norm.

y[b, z, y, x, l] = x[b, z, y, x, l] * a[b, tz, ty, tx, l]
                 + s[b, tz, ty, tx, l]        (+ activation)

One bandwidth-optimal bf16 read + write. The XLA form of the same math
(8-D broadcast of per-tile stats + f32 cast) materializes the casts and
broadcasts — ~155 ms of the 448 ms dev full_tiled 256³ trace (wave 48);
the global instance norm (tile_counts (1,1,1)) is the t=1 case of the
same kernel (~2.2 ms per dev sliding window).

The caller computes the per-tile (a, s) rows (tiny tensors) and folds
scale/bias/mean in f32 (`models/unet_fused._instance_norm_any`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anatomix_tpu.ops.pallas.conv_block import _VMEM_LIMIT, _apply_act


def _kernel_apply(a_ref, s_ref, x_ref, out_ref, *, tw, w0, act):
    # a_ref/s_ref: (1, 1, 1, tw, c8) f32 — the norm-tile rows this
    # grid step touches along w; x_ref: (1, td, th, w, c8)
    x = x_ref[0]
    parts = []
    for t in range(tw):
        seg = x[:, :, t * w0: (t + 1) * w0].astype(jnp.float32)
        seg = seg * a_ref[0, 0, 0, t] + s_ref[0, 0, 0, t]
        parts.append(seg)
    y = parts[0] if tw == 1 else jnp.concatenate(parts, axis=2)
    y = _apply_act(y, act)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_counts", "act", "interpret")
)
def norm_apply_block(
    x: jax.Array,      # (B, d, h, w, C8) block or any channel-last
    a: jax.Array,      # (B, t0, t1, t2, C8) f32 per-tile scale
    s: jax.Array,      # (B, t0, t1, t2, C8) f32 per-tile shift
    *,
    tile_counts: tuple[int, int, int] = (1, 1, 1),
    act: str = "none",
    interpret: bool = False,
) -> jax.Array:
    B, d, h, w, c8 = x.shape
    t0, t1, t2 = tile_counts
    if d % t0 or h % t1 or w % t2:
        raise ValueError("tile_counts must divide the spatial dims")
    d0, h0, w0 = d // t0, h // t1, w // t2

    # grid tiles must not straddle norm tiles along d/h
    def pick(dim, lim):
        for c in (8, 4, 2, 1):
            if dim % c == 0 and lim % c == 0:
                return c
        return 1

    td = pick(d0, d)
    th = pick(h0, h)
    kernel = functools.partial(_kernel_apply, tw=t2, w0=w0, act=act)

    def a_index(b, i, j):
        return (b, i * td // d0, j * th // h0, 0, 0)

    return pl.pallas_call(
        kernel,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec((1, 1, 1, t2, c8), a_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t2, c8), a_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, td, th, w, c8),
                         lambda b, i, j: (b, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, td, th, w, c8), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * x.size, bytes_accessed=2 * x.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(a, s, x)
