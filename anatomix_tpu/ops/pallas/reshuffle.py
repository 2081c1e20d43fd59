"""Pallas TPU kernels for block-layout <-> spatial-layout reshuffles.

`depth_to_space` (block (B,d,h,w,8C) -> (B,2d,2h,2w,C)) is the exit
boundary of the fused block-space UNet (`models/unet_fused.py`), and
`space_to_depth` the entry/pool-transition boundary. XLA lowers both as
transposes whose minor dim is the narrow C channel axis and sustains only
~50-100 GB/s (1.27 ms for the 67 MB 128-cube exit — the worst glue op in
the fused forward, PERF.md).

The kernel exploits the block channel order ((ad*2+ah)*2+aw)*C + c
(`conv3x3._space_to_depth`): the w-parity `aw` sits directly channel-major
of `c`, so with the full-res side viewed as the (free-to-reshape) 6-D
(d, 2, h, 2, w, 2C), each (ad, ah) plane is ONE contiguous 2C-wide lane
slice of the block tensor:

    full6[i, ad, j, ah, k, :] == block[i, j, k, (ad*2+ah)*2C : +2C]

so both directions are 4 lane slices + 4 indexed stores — no interleave,
no transpose, pure VPU-free data movement at HBM bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 64 * 2 ** 20


def _d2s_kernel(y_ref, out_ref, *, C: int):
    # y_ref: (td, th, w, 8C); out_ref: (td, 2, th, 2, w, 2C)
    for a in range(2):
        for b in range(2):
            g = (a * 2 + b) * 2 * C
            out_ref[:, a, :, b] = y_ref[..., g: g + 2 * C]


def _d2s_sub_kernel(y_ref, s_ref, out_ref, *, C: int):
    # d2s with a fused per-lane f32 subtract + output cast (the ViT
    # 'demean' out-norm rides the exit reshuffle instead of a separate
    # full-res f32 materialize/reduce/sub chain)
    for a in range(2):
        for b in range(2):
            g = (a * 2 + b) * 2 * C
            out_ref[:, a, :, b] = (
                y_ref[..., g: g + 2 * C].astype(jnp.float32)
                - s_ref[0, g: g + 2 * C]
            ).astype(out_ref.dtype)


def _s2d_kernel(x_ref, out_ref, *, C: int):
    # x_ref: (td, 2, th, 2, w, 2C); out_ref: (td, th, w, 8C)
    for a in range(2):
        for b in range(2):
            g = (a * 2 + b) * 2 * C
            out_ref[..., g: g + 2 * C] = x_ref[:, a, :, b]


def _pick_tile_2d(d: int, h: int, w: int, C: int, itemsize: int,
                  budget: int = 44 * 2 ** 20) -> tuple[int, int]:
    """Largest (td, th) dividing (d, h) whose double-buffered in+out VMEM
    tiles fit. Narrow-lane tiles are physically padded to 128 lanes."""
    blk_lanes = max(8 * C, 128)
    full_lanes = max(2 * C, 128)

    def cost(td, th):
        blk = td * th * w * blk_lanes * itemsize
        full = td * 2 * th * 2 * w * full_lanes * itemsize
        return 2 * (blk + full)

    best = (1, 1)
    for td in (16, 8, 4, 2, 1):
        if d % td:
            continue
        for th in (16, 8, 4, 2, 1):
            if h % th:
                continue
            if cost(td, th) <= budget and td * th > best[0] * best[1]:
                best = (td, th)
    return best


@functools.partial(
    jax.jit, static_argnames=("interpret", "out_dtype")
)
def depth_to_space(
    y: jax.Array,
    *,
    sub: jax.Array | None = None,  # (B, 8C) f32 per-lane offset to
    # subtract in-kernel (the ViT demean out-norm rides the reshuffle)
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Block layout (B, d, h, w, 8C) -> (B, 2d, 2h, 2w, C).

    Inverse of overlapped space-to-depth packing (channel order
    (ad, ah, aw)-major, matching `conv3x3._space_to_depth`). Equivalent
    XLA: reshape + transpose(0,1,4,2,5,3,6,7) + reshape.
    """
    B, d, h, w, c8 = y.shape
    C = c8 // 8
    out_dtype = y.dtype if out_dtype is None else jnp.dtype(out_dtype)
    td, th = _pick_tile_2d(
        d, h, w, C,
        max(y.dtype.itemsize, jnp.dtype(out_dtype).itemsize),
    )
    if sub is None:
        kernel = functools.partial(_d2s_kernel, C=C)
        in_specs = [
            pl.BlockSpec(
                (td, th, w, c8), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        kernel = functools.partial(_d2s_sub_kernel, C=C)
        in_specs = [
            pl.BlockSpec(
                (td, th, w, c8), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c8), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ]

    def one(v, *rest):
        out6 = pl.pallas_call(
            kernel,
            grid=(d // td, h // th),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (td, 2, th, 2, w, 2 * C),
                lambda i, j: (i, 0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (d, 2, h, 2, w, 2 * C), out_dtype
            ),
            cost_estimate=pl.CostEstimate(
                flops=0, bytes_accessed=2 * v.nbytes, transcendentals=0
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(v, *rest)
        # (d,2,h,2,w,2C) -> (2d,2h,2w,C): contiguous-order merge, free
        return out6.reshape(2 * d, 2 * h, 2 * w, C)

    if sub is None:
        return jax.vmap(one)(y)
    return jax.vmap(one)(y, sub[:, None, :].astype(jnp.float32))


def _d2s_interleave_kernel(y_ref, out_ref, *, C: int, w: int):
    # (td, th, w, 8C) -> (td, 2, th, 2, 2w, C): per (a, b) plane, the
    # row-major identity (w, 2C) == (2w, C) IS the w-interleave
    # (element (k, p*C+c) -> (2k+p, c)), so one minor-split value
    # reshape emits the SPATIAL minor layout directly — the caller's
    # final merge (d,2,h,2,2w,C)->(2d,2h,2w,C) touches only major dims
    # and costs nothing (the plain d2s form pays a 4.5 ms XLA relayout
    # for the same merge at the 128³x32 ViT exit, wave-27 trace).
    td, th = y_ref.shape[0], y_ref.shape[1]
    for a in range(2):
        for b in range(2):
            g = (a * 2 + b) * 2 * C
            out_ref[:, a, :, b] = (
                y_ref[..., g: g + 2 * C].reshape(td, th, 2 * w, C)
            ).astype(out_ref.dtype)


def _d2s_interleave_sub_kernel(y_ref, s_ref, out_ref, *, C: int, w: int):
    td, th = y_ref.shape[0], y_ref.shape[1]
    for a in range(2):
        for b in range(2):
            g = (a * 2 + b) * 2 * C
            plane = (
                y_ref[..., g: g + 2 * C].astype(jnp.float32)
                - s_ref[0, g: g + 2 * C]
            )
            out_ref[:, a, :, b] = plane.reshape(td, th, 2 * w, C).astype(
                out_ref.dtype
            )


@functools.partial(
    jax.jit, static_argnames=("interpret", "out_dtype")
)
def depth_to_space_interleave(
    y: jax.Array,
    *,
    sub: jax.Array | None = None,  # (B, 8C) f32 per-lane offset (demean)
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Block layout (B, d, h, w, 8C) -> spatial (B, 2d, 2h, 2w, C) with
    the minor (2w, C) layout produced IN-KERNEL (see
    `_d2s_interleave_kernel`); the trailing reshape merges major dims
    only. Output identical to `depth_to_space`."""
    B, d, h, w, c8 = y.shape
    C = c8 // 8
    out_dtype = y.dtype if out_dtype is None else jnp.dtype(out_dtype)
    td, th = _pick_tile_2d(
        d, h, 2 * w, max(C, 64) // 2,  # out tile lanes pad to >=128
        max(y.dtype.itemsize, jnp.dtype(out_dtype).itemsize),
    )
    if sub is None:
        kernel = functools.partial(_d2s_interleave_kernel, C=C, w=w)
        in_specs = [
            pl.BlockSpec(
                (td, th, w, c8), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        kernel = functools.partial(_d2s_interleave_sub_kernel, C=C, w=w)
        in_specs = [
            pl.BlockSpec(
                (td, th, w, c8), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c8), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ]

    def one(v, *rest):
        out6 = pl.pallas_call(
            kernel,
            grid=(d // td, h // th),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (td, 2, th, 2, 2 * w, C),
                lambda i, j: (i, 0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (d, 2, h, 2, 2 * w, C), out_dtype
            ),
            cost_estimate=pl.CostEstimate(
                flops=0, bytes_accessed=2 * v.nbytes, transcendentals=0
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(v, *rest)
        # (d,2,h,2,2w,C) -> (2d,2h,2w,C): major-dim merges only, free
        return out6.reshape(2 * d, 2 * h, 2 * w, C)

    if sub is None:
        return jax.vmap(one)(y)
    return jax.vmap(one)(y, sub[:, None, :].astype(jnp.float32))


def _d2s_fold_kernel(y_ref, out_ref, scratch, *, C: int, g: int):
    # (td, th, w, 8C) -> (td, 2, th, 2, w/g, g*2C=128): per (a, b) plane,
    # pack g w-positions' 2C-lane fields into one full 128-lane row via
    # strided REF loads + lane concat. Mosaic constraints shaped this
    # (tools/_exp_repack.py + _exp_pack2.py + wave-20): no in-kernel
    # minor-dim merge reshapes, value-level strided slices lower to
    # unsupported >2D gathers, strided loads are 32-bit-only AND require
    # a zero last-dim index — hence the lane slice bounces through a
    # VMEM scratch so the strided read starts at lane 0.
    for a in range(2):
        for b in range(2):
            s = (a * 2 + b) * 2 * C
            scratch[...] = y_ref[:, :, :, s: s + 2 * C]
            out_ref[:, a, :, b] = jnp.concatenate(
                [scratch[:, :, t::g, :] for t in range(g)],
                axis=-1,
            ).astype(out_ref.dtype)


def _d2s_fold_sub_kernel(y_ref, s_ref, out_ref, scratch, *, C: int,
                         g: int):
    for a in range(2):
        for b in range(2):
            s = (a * 2 + b) * 2 * C
            scratch[...] = (
                y_ref[:, :, :, s: s + 2 * C].astype(jnp.float32)
                - s_ref[0, s: s + 2 * C]
            )
            out_ref[:, a, :, b] = jnp.concatenate(
                [scratch[:, :, t::g, :] for t in range(g)],
                axis=-1,
            ).astype(out_ref.dtype)


def fold_supported(C: int, w: int) -> bool:
    """depth_to_space_fold eligibility: the packed row must be whole
    128-lane groups."""
    g = 128 // (2 * C) if 2 * C <= 128 and 128 % (2 * C) == 0 else 0
    return g > 0 and w % max(g, 1) == 0


@functools.partial(
    jax.jit, static_argnames=("interpret", "out_dtype")
)
def depth_to_space_fold(
    y: jax.Array,
    *,
    sub: jax.Array | None = None,  # (B, 8C) f32 per-lane offset (demean)
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Block layout (B, d, h, w, 8C) -> folded flat rows
    (B, 2d, 2h, 2w*C/128, 128).

    The folded form is `depth_to_space(y).reshape(B, 2d, 2h, -1, 128)`
    with zero XLA relayouts: per output row the (w, 2C) minor merge is
    done in-VMEM (strided sublane slices + lane concat), and the result
    is exactly the layout `ops.pallas.scatter.blend_scatter_fold`
    consumes — the model exit feeds sliding-window stitching without
    ever materializing a narrow-C spatial tensor."""
    B, d, h, w, c8 = y.shape
    C = c8 // 8
    g = 128 // (2 * C)
    if not fold_supported(C, w):
        raise ValueError(f"fold unsupported for C={C}, w={w}")
    out_dtype = y.dtype if out_dtype is None else jnp.dtype(out_dtype)
    if y.dtype.itemsize < 4:
        # Mosaic strided loads are 32-bit-only (wave-18 probe); the cast
        # fuses into XLA producers (e.g. the ViT decoder GEMM emits its
        # f32 accumulator directly), and costs one bandwidth pass after
        # opaque Pallas producers
        y = y.astype(jnp.float32)
    td, th = _pick_tile_2d(
        d, h, w, C,
        max(y.dtype.itemsize, jnp.dtype(out_dtype).itemsize),
    )
    if sub is None:
        kernel = functools.partial(_d2s_fold_kernel, C=C, g=g)
        in_specs = [
            pl.BlockSpec(
                (td, th, w, c8), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        kernel = functools.partial(_d2s_fold_sub_kernel, C=C, g=g)
        in_specs = [
            pl.BlockSpec(
                (td, th, w, c8), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c8), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ]

    def one(v, *rest):
        out6 = pl.pallas_call(
            kernel,
            grid=(d // td, h // th),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (td, 2, th, 2, w // g, 128),
                lambda i, j: (i, 0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (d, 2, h, 2, w // g, 128), out_dtype
            ),
            scratch_shapes=[
                pltpu.VMEM((td, th, w, 2 * C), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=0, bytes_accessed=2 * v.nbytes, transcendentals=0
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(v, *rest)
        # major-dim merges only: free
        return out6.reshape(2 * d, 2 * h, w // g, 128)

    if sub is None:
        return jax.vmap(one)(y)
    return jax.vmap(one)(y, sub[:, None, :].astype(jnp.float32))


def _bits3(v: int) -> tuple[int, int, int]:
    return (v >> 2) & 1, (v >> 1) & 1, v & 1


def _d2s8_planes(y_ref, s_ref, *, C: int, out_dtype):
    """Shared body of the factor-8 kernels: yields, per (pz, py) output
    plane, the (td, th, w, 8C) tile whose minor layout is (px, c) — the
    row-major bytes of the (8w, C) spatial rows for that plane.

    Channel order of `y_ref` is the 3-stage composition
    (a1, a2, a3, c) with a_i = (z_i*4 + y_i*2 + x_i) — exactly what three
    stacked GEMMs with (kd, kh, kw, co)-major weight columns produce
    (`primus._decoder` block-space path). For a fixed (pz, py) the four
    (x1, x2) groups are non-adjacent lane slices of width 2C; their
    (x1, x2)-major concat restores (px, c) contiguity. Only proven-legal
    Mosaic moves: 2C-wide lane slices at 2C-multiple offsets + lane
    concat (the factor-2 production kernels' vocabulary) — NO minor-dim
    value reshape (the wave-28 probe showed Mosaic rejects those).
    """
    for pz in range(8):
        z1, z2, z3 = _bits3(pz)
        for py in range(8):
            y1, y2, y3 = _bits3(py)
            base = (z1 * 256 + y1 * 128 + z2 * 32 + y2 * 16
                    + z3 * 4 + y3 * 2) * C
            parts = []
            for x1 in range(2):
                for x2 in range(2):
                    g = base + (x1 * 64 + x2 * 8) * C
                    sl = y_ref[..., g: g + 2 * C]
                    if s_ref is not None:
                        sl = (sl.astype(jnp.float32)
                              - s_ref[0, g: g + 2 * C])
                    parts.append(sl)
            plane = jnp.concatenate(parts, axis=-1).astype(out_dtype)
            yield pz, py, plane  # (td, th, w, 8C), minor order (px, c)


def _d2s8_packed_kernel(y_ref, out_ref, *, C: int, w: int):
    # out_ref: (td, 8, th, 8, w, 8C) — the plane is stored AS IS; its
    # (w, 8C) minor is the row-major byte image of the (8w, C) spatial
    # rows, so no in-kernel relayout is needed at all.
    for pz, py, plane in _d2s8_planes(y_ref, None, C=C,
                                      out_dtype=out_ref.dtype):
        out_ref[:, pz, :, py] = plane


def _d2s8_packed_sub_kernel(y_ref, s_ref, out_ref, *, C: int, w: int):
    for pz, py, plane in _d2s8_planes(y_ref, s_ref, C=C,
                                      out_dtype=out_ref.dtype):
        out_ref[:, pz, :, py] = plane


def d2s8_supported(C: int) -> bool:
    """Factor-8 reshuffle eligibility: lane slices are 2C wide at
    2C-multiple offsets — C % 32 == 0 keeps every offset a 64-lane
    multiple (the granularity the production factor-2 kernels already
    exercise on HW)."""
    return C % 32 == 0


def _pick_tile_d2s8(d: int, h: int, w: int, C: int, itemsize: int,
                    budget: int = 44 * 2 ** 20) -> tuple[int, int] | None:
    """Largest (td, th) whose double-buffered working set fits the VMEM
    budget; None when even the (1, 1) tile busts it (large w*C) — the
    caller raises a descriptive error instead of letting Mosaic OOM
    opaquely (ADVICE r4 #4)."""
    def cost(td, th):
        blk = td * th * w * 512 * C * itemsize
        full = td * 8 * th * 8 * w * 8 * C * itemsize  # (…, w, 8C) packed
        return 2 * (blk + full)

    best = None
    for td in (4, 2, 1):
        if d % td:
            continue
        for th in (4, 2, 1):
            if h % th:
                continue
            if cost(td, th) <= budget and (
                best is None or td * th > best[0] * best[1]
            ):
                best = (td, th)
    return best


@functools.partial(
    jax.jit, static_argnames=("emit", "interpret", "out_dtype")
)
def depth_to_space8(
    y: jax.Array,  # (B, d, h, w, 512*C), channel order (a1, a2, a3, c)
    *,
    sub: jax.Array | None = None,  # (B, 512*C) f32 per-lane offset
    out_dtype=None,
    emit: str = "packed",  # 'packed' | 'spatial'
    interpret: bool = False,
) -> jax.Array:
    """Three composed ×2 block layouts -> full resolution in ONE pass.

    (B, d, h, w, 512C) -> the packed form (B, 8d, 8h, w, 8C) whose
    row-major bytes ARE the spatial (B, 8d, 8h, 8w, C) tensor
    ('packed'), or that spatial tensor itself ('spatial' — packed plus
    one XLA minor-split reshape, a relayout on TPU). Equivalent to three
    chained `depth_to_space` calls on the per-stage 8C groups, but the
    intermediate full-res tensors are never materialized — the ViT
    decoder's transposed-conv tower runs entirely in block space and
    exits here (`primus._decoder_block_space`). The packed emit is the
    zero-relayout production path: a host fetch (or any byte-level
    consumer) reinterprets it as spatial for free."""
    B, d, h, w, c512 = y.shape
    C = c512 // 512
    if not d2s8_supported(C):
        raise ValueError(f"d2s8 unsupported for C={C}")
    if emit not in ("packed", "spatial"):
        raise ValueError(f"unknown emit {emit!r}")
    out_dtype = y.dtype if out_dtype is None else jnp.dtype(out_dtype)
    tile = _pick_tile_d2s8(
        d, h, w, C, max(y.dtype.itemsize, jnp.dtype(out_dtype).itemsize)
    )
    if tile is None:
        raise ValueError(
            f"depth_to_space8: no (td, th) tile fits the VMEM budget for "
            f"shape {y.shape} (w*C too large) — fall back to chained "
            f"depth_to_space"
        )
    td, th = tile
    kernel = functools.partial(
        _d2s8_packed_sub_kernel if sub is not None else _d2s8_packed_kernel,
        C=C, w=w,
    )
    in_specs = [
        pl.BlockSpec(
            (td, th, w, c512), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if sub is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, c512), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            )
        )

    def one(v, *rest):
        out6 = pl.pallas_call(
            kernel,
            grid=(d // td, h // th),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (td, 8, th, 8, w, 8 * C),
                lambda i, j: (i, 0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (d, 8, h, 8, w, 8 * C), out_dtype
            ),
            cost_estimate=pl.CostEstimate(
                flops=0, bytes_accessed=2 * v.nbytes, transcendentals=0
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(v, *rest)
        # (d,8,h,8,w,8C) -> (8d,8h,w,8C): major-dim merges only, free
        return out6.reshape(8 * d, 8 * h, w, 8 * C)

    packed = (jax.vmap(one)(y) if sub is None
              else jax.vmap(one)(y, sub[:, None, :].astype(jnp.float32)))
    if emit == "spatial":
        # one XLA minor-split reshape (w,8C)->(8w,C); byte-identity, but
        # a tiled-layout relayout on TPU — packed is the fast path
        return packed.reshape(B, 8 * d, 8 * h, 8 * w, C)
    return packed


def _s2d_c1_kernel(v_ref, out_ref):
    # v_ref: (td, 2, th, 2, 2w) channel-less; out_ref: (td, th, w, 8).
    # Per (ad, ah): the free row-major identity (2w,) == (w, 2[aw]) is a
    # minor-split reshape in VMEM (same Mosaic move as
    # `_d2s_interleave_kernel`); lanes (ad*2+ah)*2 .. +2 hold (aw=0, 1).
    td, th = v_ref.shape[0], v_ref.shape[2]
    w = v_ref.shape[4] // 2
    for ad in range(2):
        for ah in range(2):
            p = ad * 2 + ah
            plane = v_ref[:, ad, :, ah]  # (td, th, 2w)
            out_ref[..., p * 2: p * 2 + 2] = plane.reshape(td, th, w, 2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def space_to_depth_c1(x4: jax.Array, *, interpret: bool = False):
    """Channel-less (B, D, H, W) -> block (B, d, h, w, 8), same lane
    order as `conv3x3.space_to_depth_4d`, without the 64x-lane-padded
    (…, 2) XLA intermediate that path materializes (~1.2 ms per 128³
    entry, wave-27 trace: the 6-D (d,2,h,2,w,2) form pads 2 lanes to
    128). The major-split reshape to (B, d, 2, h, 2, W) is free; the
    (2w,) -> (w, 2) minor split happens in VMEM."""
    B, D, H, W = x4.shape
    d, h, w = D // 2, H // 2, W // 2
    td, th = _pick_tile_2d(d, h, w, 16, x4.dtype.itemsize)

    def one(v):
        v6 = v.reshape(d, 2, h, 2, W)  # major splits: free
        return pl.pallas_call(
            _s2d_c1_kernel,
            grid=(d // td, h // th),
            in_specs=[
                pl.BlockSpec(
                    (td, 2, th, 2, W), lambda i, j: (i, 0, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (td, th, w, 8), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((d, h, w, 8), x4.dtype),
            cost_estimate=pl.CostEstimate(
                flops=0, bytes_accessed=2 * v.nbytes, transcendentals=0
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(v6)

    return jax.vmap(one)(x4)


@functools.partial(jax.jit, static_argnames=("interpret",))
def space_to_depth(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """(B, 2d, 2h, 2w, C) -> block layout (B, d, h, w, 8C)."""
    B, D, H, W, C = x.shape
    d, h, w = D // 2, H // 2, W // 2
    td, th = _pick_tile_2d(d, h, w, C, x.dtype.itemsize)
    kernel = functools.partial(_s2d_kernel, C=C)

    def one(v):
        v6 = v.reshape(d, 2, h, 2, w, 2 * C)  # contiguous split: free
        return pl.pallas_call(
            kernel,
            grid=(d // td, h // th),
            in_specs=[
                pl.BlockSpec(
                    (td, 2, th, 2, w, 2 * C),
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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(v6)

    return jax.vmap(one)(x)
