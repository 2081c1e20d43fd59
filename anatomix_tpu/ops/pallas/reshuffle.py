"""Pallas TPU kernels for block-layout <-> spatial-layout reshuffles.

`depth_to_space` (block (B,d,h,w,8C) -> (B,2d,2h,2w,C)) is the exit
boundary of the fused block-space UNet (`models/unet_fused.py`). XLA lowers
it as a transpose whose minor dim is the narrow C=16 channel axis and
sustains only ~10 GB/s (13.6 ms for the 128-cube exit — the single worst op
in the fused forward, PERF.md). The kernel instead:

* keeps the lane axis wide on the *input* side (8C = 128 for the anatomix
  exit) and slices the 8 sub-position channel groups for free (lane-group
  slicing compiles; lane<->sublane shape casts do not),
* interleaves the two w-parity groups with a sublane repeat + parity
  select (pure VPU ops),
* writes each (d-parity a, h-parity b) plane to a 6-D output
  (d, 2, h, 2, 2w, C) whose final merge to (2d, 2h, 2w, C) is a
  major-dim-only reshape — free in XLA.

This is a data-movement kernel: the target is HBM bandwidth (~0.2 ms for
the 67 MB exit tensor), not FLOPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interleave_w(zA, zB, *, interpret: bool):
    """(td, th, w, C) x2 -> (td, th, 2w, C) with zA at even, zB at odd
    sublanes."""
    td, th, w, C = zA.shape
    if interpret:
        return jnp.stack([zA, zB], axis=3).reshape(td, th, 2 * w, C)
    rA = pltpu.repeat(zA, 2, axis=2)
    rB = pltpu.repeat(zB, 2, axis=2)
    parity = jax.lax.broadcasted_iota(jnp.int32, (td, th, 2 * w, C), 2) % 2
    return jnp.where(parity == 0, rA, rB)


def _d2s_kernel(y_ref, out_ref, *, C: int, interpret: bool):
    # y_ref: (td, th, w, 8C); out_ref: (td, 2, th, 2, 2w, C)
    for a in range(2):
        for b in range(2):
            g0 = ((a * 2 + b) * 2 + 0) * C
            g1 = ((a * 2 + b) * 2 + 1) * C
            v = _interleave_w(
                y_ref[..., g0: g0 + C],
                y_ref[..., g1: g1 + C],
                interpret=interpret,
            )
            out_ref[:, a, :, b] = v


def _pick_tile_2d(d: int, h: int, unit_bytes: int,
                  budget: int = 2 * 2 ** 20) -> tuple[int, int]:
    """Largest (td, th) dividing (d, h) with in+out tile bytes under
    budget (x2 for double buffering happens inside the budget)."""
    best = (1, 1)
    for td in (16, 8, 4, 2, 1):
        if d % td:
            continue
        for th in (16, 8, 4, 2, 1):
            if h % th:
                continue
            if 2 * td * th * unit_bytes <= budget and td * th > best[0] * best[1]:
                best = (td, th)
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def depth_to_space(y: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Block layout (B, d, h, w, 8C) -> (B, 2d, 2h, 2w, C).

    Inverse of overlapped space-to-depth packing (channel order
    (a, b, cw)-major, matching `conv3x3._space_to_depth`). Equivalent XLA:
    reshape + transpose(0,1,4,2,5,3,6,7) + reshape.
    """
    B, d, h, w, c8 = y.shape
    C = c8 // 8
    unit = w * c8 * y.dtype.itemsize  # one (d,h) row, in == out bytes
    td, th = _pick_tile_2d(d, h, unit)
    kernel = functools.partial(_d2s_kernel, C=C, interpret=interpret)

    def one(v):
        out6 = pl.pallas_call(
            kernel,
            grid=(d // td, h // th),
            in_specs=[
                pl.BlockSpec(
                    (td, th, w, c8), lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (td, 2, th, 2, 2 * w, C),
                lambda i, j: (i, 0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((d, 2, h, 2, 2 * w, C), y.dtype),
            cost_estimate=pl.CostEstimate(
                flops=0, bytes_accessed=2 * v.nbytes, transcendentals=0
            ),
            interpret=interpret,
        )(v)
        return out6.reshape(2 * d, 2 * h, 2 * w, C)

    return jax.vmap(one)(y)


def _s2d_kernel(x_ref, out_ref, *, C: int, interpret: bool):
    # x_ref: (2td, 2, th... ) — see space_to_depth: input viewed 6-D
    # (2td? ) -- kernel receives (td, 2, th, 2, 2w, C); emits (td, th, w, 8C)
    for a in range(2):
        for b in range(2):
            v = x_ref[:, a, :, b]  # (td, th, 2w, C)
            if interpret:
                td, th, w2, _ = v.shape
                pair = v.reshape(td, th, w2 // 2, 2, C)
                zA, zB = pair[..., 0, :], pair[..., 1, :]
            else:
                # stride-2 sublane reads don't compile; split via the
                # supported sublane-splitting reshape then lane slices
                td, th, w2, _ = v.shape
                pair = v.reshape(td, th, w2 // 2, 2 * C)
                zA, zB = pair[..., :C], pair[..., C:]
            g = (a * 2 + b) * 2
            out_ref[..., (g + 0) * C: (g + 1) * C] = zA
            out_ref[..., (g + 1) * C: (g + 2) * C] = zB


@functools.partial(jax.jit, static_argnames=("interpret",))
def space_to_depth(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """(B, 2d, 2h, 2w, C) -> block layout (B, d, h, w, 8C).

    The sublane-splitting reshape (2w, C) -> (w, 2C) is layout-preserving
    on TPU (PERF.md Mosaic notes), making the w-deinterleave a pair of lane
    slices.
    """
    B, D, H, W, C = x.shape
    d, h, w = D // 2, H // 2, W // 2
    unit = W * 2 * C * x.dtype.itemsize * 2
    td, th = _pick_tile_2d(d, h, unit)
    kernel = functools.partial(_s2d_kernel, C=C, interpret=interpret)

    def one(v):
        v6 = v.reshape(d, 2, h, 2, 2 * w, C)  # major-dim split: free
        return pl.pallas_call(
            kernel,
            grid=(d // td, h // th),
            in_specs=[
                pl.BlockSpec(
                    (td, 2, th, 2, 2 * w, C),
                    lambda i, j: (i, 0, j, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (td, th, w, 8 * C), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((d, h, w, 8 * C), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=0, bytes_accessed=2 * v.nbytes, transcendentals=0
            ),
            interpret=interpret,
        )(v6)

    return jax.vmap(one)(x)
