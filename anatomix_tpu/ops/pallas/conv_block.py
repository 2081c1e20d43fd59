"""Pallas TPU kernel: sparse block-space 3x3x3 convolution + epilogue.

The dense block-space formulation (`conv3x3.make_block_weights`) turns a
stride-1 3^3 conv (Ci -> Co) into a 3^3 conv (8Ci -> 8Co) on the
half-resolution grid — full 128-lane MXU tiles, but 8x nominal FLOPs
(its (72*Ci, 24*Co) GEMM weight matrix is 7/8 zeros: an output
sub-position only sees 27 of the 216 (block-tap, sub-position) combos).

This kernel removes the zeros. Per spatial axis, an output voxel at block
sub-position a in {0,1} with tap k in {0,1,2} reads full-res offset
v = a + k - 1 in {-1, 0, 1, 2} — only FOUR values, shared by both a's.
So the GEMM LHS is the concat of the 4^3 = 64 (vd, vh, vw) shifted views
of the halo'd block tile — each view is a (block-offset floor(v/2) in
{-1,0,1}, lane-group parity v mod 2) slice — giving

    K = 64*Ci   (vs 72*Ci dense, but now fully dense rows)
    N = 8*Co    (all output sub-positions in one shot; no dx post-rolls)

at 64/27 = 2.37x nominal FLOPs instead of 8x. Bias + activation run in the
kernel epilogue on the f32 accumulator (the separate act passes were the
three 8–14 ms `convert_maximum` fusions in the round-1 trace, PERF.md).

Reference semantics: `anatomix/model/network.py:13-124` ConvBlock
(conv3d 'same' + activation); padding handled by the caller as a 1-block
halo (edge-copy == full-res reflect; zeros == full-res zeros).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-axis offset v in {-1, 0, 1, 2}: block offset into the 1-halo'd tile
# and sub-position parity (lane-group index component)
_OFF = {v: 1 + (v // 2) for v in (-1, 0, 1, 2)}
_PAR = {v: v % 2 for v in (-1, 0, 1, 2)}


def _dot_precision(dtype):
    """f32 operands must request HIGHEST precision: the TPU default runs
    fast bf16-class passes, which broke the hardware grad-parity bound that
    interpret mode (exact f32 math) satisfies (tests/test_tpu_numerics.py).
    bf16 operands keep the default fast path."""
    import jax.numpy as _jnp

    return (
        jax.lax.Precision.HIGHEST if dtype == _jnp.float32 else None
    )


def _apply_act(acc, act: str):
    if act == "none":
        return acc
    if act == "relu":
        return jnp.maximum(acc, 0.0)
    if act == "lrelu":
        return jnp.where(acc >= 0.0, acc, 0.2 * acc)
    if act == "elu":
        return jnp.where(acc >= 0.0, acc, jnp.expm1(acc))
    if act == "tanh":
        return jnp.tanh(acc)
    raise ValueError(f"unsupported epilogue act: {act}")


def _kernel(x_hbm, w0_ref, w1_ref, w2_ref, b_ref, out_ref, x_vmem, sem, *,
            td, th, W, ci, act, interpret, emit_full=False):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * td, td + 2), pl.ds(j * th, th + 2)],
        x_vmem,
        sem,
    )
    dma.start()
    dma.wait()

    # Mosaic's concatenate requires equal sublane offsets on non-concat
    # dims (and rolls only exist for 32-bit data), so the 64 (vd, vh, vw)
    # views are grouped by their w-axis block offset in {0, 1, 2} — each
    # group concatenates at ONE sublane offset and gets its own GEMM; the
    # f32 accumulator sums the partial products (same total FLOPs). Each
    # group is further chunked by vd (weight rows are vd-major, so chunks
    # are plain row slices): the LHS concat materializes one vd-chunk at a
    # time, cutting peak VMEM ~4x and letting _pick_tile choose tiles with
    # ~4x fewer grid steps.
    def chunk(vd, vws):
        views = []
        for vh in (-1, 0, 1, 2):
            for vw in vws:
                g = ((_PAR[vd] * 2 + _PAR[vh]) * 2 + _PAR[vw]) * ci
                views.append(
                    x_vmem[
                        _OFF[vd]: _OFF[vd] + td,
                        _OFF[vh]: _OFF[vh] + th,
                        _OFF[vw]: _OFF[vw] + W,
                        g: g + ci,
                    ]
                )
        return jnp.concatenate(views, axis=-1)

    dn = (((3,), (0,)), ((), ()))
    acc = None
    for w_ref, vws in ((w1_ref, (0, 1)), (w0_ref, (-1,)), (w2_ref, (2,))):
        rows = 4 * len(vws) * ci
        for n, vd in enumerate((-1, 0, 1, 2)):
            z = jax.lax.dot_general(
                chunk(vd, vws), w_ref[n * rows: (n + 1) * rows], dn,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(x_vmem.dtype),
            )
            acc = z if acc is None else acc + z
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    if emit_full:
        # write straight into the depth-to-space 6-D view: each (ad, ah)
        # plane is one contiguous 2Co lane group (see ops/pallas/reshuffle)
        co2 = out_ref.shape[-1]
        for a in range(2):
            for b2 in range(2):
                g = (a * 2 + b2) * co2
                out_ref[0, :, a, :, b2] = acc[..., g: g + co2].astype(
                    out_ref.dtype
                )
    else:
        out_ref[0] = acc.astype(out_ref.dtype)


# -----------------------------------------------------------------------------
# In-kernel halo variant: the HBM-side `jnp.pad` halo (a bandwidth-bound
# full copy of the input — 2.18 ms/window of the round-3 6M sliding trace)
# is replaced by NINE clamped-source DMAs assembling the halo'd tile
# directly in VMEM. For reflect padding (the production path) the halo is
# an edge copy in block space, and an edge copy IS source-index clamping —
# so the same static-shape DMAs serve interior and boundary tiles with no
# conditionals. Clamped indices ride a scalar-prefetch SMEM map (the
# Mosaic-canonical pattern for data-dependent DMA offsets). The w-axis
# halo cannot be DMA'd (destination sublane offsets must be tile-aligned;
# tools/_exp_dmaoff.py), so the interior lands at sublane offset 8 and the
# two halo columns are filled by in-kernel edge copies.


def _halo_copies(x_hbm, x_vmem, sems, b, dmap_ref, hmap_ref, i, j, *,
                 td, th, w, off, sem_base=0):
    """Start 9 DMAs assembling an edge-halo'd (td+2, th+2, w+2) tile:
    core + 4 edge strips + 4 corners, source indices pre-clamped in the
    SMEM maps (dmap[i] = (i*td, max(i*td-1, 0), min(i*td+td, d-1)))."""
    d0, top, bot = dmap_ref[i, 0], dmap_ref[i, 1], dmap_ref[i, 2]
    h0, lef, rig = hmap_ref[j, 0], hmap_ref[j, 1], hmap_ref[j, 2]
    dst_w = pl.ds(off, w)
    pieces = (
        ((pl.ds(d0, td), pl.ds(h0, th)), (pl.ds(1, td), pl.ds(1, th))),
        ((pl.ds(top, 1), pl.ds(h0, th)), (pl.ds(0, 1), pl.ds(1, th))),
        ((pl.ds(bot, 1), pl.ds(h0, th)),
         (pl.ds(td + 1, 1), pl.ds(1, th))),
        ((pl.ds(d0, td), pl.ds(lef, 1)), (pl.ds(1, td), pl.ds(0, 1))),
        ((pl.ds(d0, td), pl.ds(rig, 1)),
         (pl.ds(1, td), pl.ds(th + 1, 1))),
        ((pl.ds(top, 1), pl.ds(lef, 1)), (pl.ds(0, 1), pl.ds(0, 1))),
        ((pl.ds(top, 1), pl.ds(rig, 1)),
         (pl.ds(0, 1), pl.ds(th + 1, 1))),
        ((pl.ds(bot, 1), pl.ds(lef, 1)),
         (pl.ds(td + 1, 1), pl.ds(0, 1))),
        ((pl.ds(bot, 1), pl.ds(rig, 1)),
         (pl.ds(td + 1, 1), pl.ds(th + 1, 1))),
    )
    dmas = []
    for k, ((sd, sh), (dd, dh)) in enumerate(pieces):
        dma = pltpu.make_async_copy(
            x_hbm.at[b, sd, sh, :, :],
            x_vmem.at[dd, dh, dst_w, :],
            sems.at[sem_base + k],
        )
        dma.start()
        dmas.append(dma)
    return dmas


def _kernel_halo(dmap_ref, hmap_ref, x_hbm, w0_ref, w1_ref, w2_ref, b_ref,
                 out_ref, x_vmem, sems, *, td, th, W, ci, act, interpret):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    off = 8
    for dma in _halo_copies(x_hbm, x_vmem, sems, b, dmap_ref, hmap_ref,
                            i, j, td=td, th=th, w=W, off=off):
        dma.wait()
    # w-axis halo: edge copies into the (sublane-unaligned) flanking
    # columns — a small in-VMEM vector op (probe1, tools/_exp_dmaoff.py)
    x_vmem[:, :, off - 1] = x_vmem[:, :, off]
    x_vmem[:, :, off + W] = x_vmem[:, :, off + W - 1]

    base = off - 1

    def chunk(vd, vws):
        views = []
        for vh in (-1, 0, 1, 2):
            for vw in vws:
                g = ((_PAR[vd] * 2 + _PAR[vh]) * 2 + _PAR[vw]) * ci
                views.append(
                    x_vmem[
                        _OFF[vd]: _OFF[vd] + td,
                        _OFF[vh]: _OFF[vh] + th,
                        base + _OFF[vw]: base + _OFF[vw] + W,
                        g: g + ci,
                    ]
                )
        return jnp.concatenate(views, axis=-1)

    dn = (((3,), (0,)), ((), ()))
    acc = None
    for w_ref, vws in ((w1_ref, (0, 1)), (w0_ref, (-1,)), (w2_ref, (2,))):
        rows = 4 * len(vws) * ci
        for n, vd in enumerate((-1, 0, 1, 2)):
            z = jax.lax.dot_general(
                chunk(vd, vws), w_ref[n * rows: (n + 1) * rows], dn,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(x_vmem.dtype),
            )
            acc = z if acc is None else acc + z
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


def _clamp_maps(d, h, td, th):
    """Host-side scalar-prefetch maps: per d-tile (start, clamped halo-top,
    clamped halo-bottom) and the h-axis equivalent."""
    di = np.arange(d // td, dtype=np.int32) * td
    dmap = np.stack(
        [di, np.maximum(di - 1, 0), np.minimum(di + td, d - 1)], axis=1
    )
    hj = np.arange(h // th, dtype=np.int32) * th
    hmap = np.stack(
        [hj, np.maximum(hj - 1, 0), np.minimum(hj + th, h - 1)], axis=1
    )
    return jnp.asarray(dmap), jnp.asarray(hmap)


@functools.partial(
    jax.jit, static_argnames=("act", "out_dtype", "interpret")
)
def conv_block_sparse_halo(
    x_block: jax.Array,  # (B, d, h, w, 8*Ci) block layout, UN-halo'd
    w0: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    bias8: jax.Array,
    *,
    act: str = "none",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """'Same'-padded (full-res reflect) sparse block conv with the halo
    assembled in-kernel — no HBM-side pad copy. Returns (B, d, h, w, 8*Co).
    """
    B, d, h, w, c8 = x_block.shape
    ci = c8 // 8
    co8 = w1.shape[-1]
    off = 8
    Wp = off + w + 1

    td, th = _pick_tile(
        d, h, Wp, ci, co8 // 8, itemsize=x_block.dtype.itemsize
    )
    dmap, hmap = _clamp_maps(d, h, td, th)
    kernel = functools.partial(_kernel_halo, td=td, th=th, W=w, ci=ci,
                               act=act, interpret=interpret)
    flops = 2 * B * d * h * w * 64 * ci * co8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, td, th, w, co8), lambda b, i, j, *_: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, c8), x_block.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, co8), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_block.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dmap, hmap, x_block, w0, w1, w2, bias8)


# wide-assembly view groups, shared by the weight packers and kernels:
# each group's views merge into uniform contiguous lane runs of the block
# tile (lane = ((pd*2+ph)*2+pw)*ci + c). Entry order here MUST match the
# slice enumeration in `_wide_slices`.
_WIDE_GROUPS = (
    # g1: all-interior — one direct full-lane slice
    [(vd, vh, vw) for vd in (0, 1) for vh in (0, 1) for vw in (0, 1)],
    # g2: d-boundary, h/w interior — two 4*ci runs
    [(vd, vh, vw) for vd in (-1, 2) for vh in (0, 1) for vw in (0, 1)],
    # g3: h-boundary, w interior — eight 2*ci runs
    [(vd, vh, vw) for vh in (-1, 2) for vd in (-1, 0, 1, 2)
     for vw in (0, 1)],
    # g4/g5: w-boundary — sixteen ci runs each
    [(vd, vh, -1) for vd in (-1, 0, 1, 2) for vh in (-1, 0, 1, 2)],
    [(vd, vh, 2) for vd in (-1, 0, 1, 2) for vh in (-1, 0, 1, 2)],
)


def _wide_slices(v, ci, td, th, W, base):
    """Per-GEMM-group LHS slice lists (lane-run merged) of a halo'd VMEM
    tile `v` with `8*ci` lanes; group order matches `_WIDE_GROUPS`."""
    win = slice(base + 1, base + 1 + W)
    g1 = [v[1: 1 + td, 1: 1 + th, win, 0: 8 * ci]]
    g2 = [
        v[0: td, 1: 1 + th, win, 4 * ci: 8 * ci],
        v[2: 2 + td, 1: 1 + th, win, 0: 4 * ci],
    ]
    g3 = []
    for vh in (-1, 2):
        for vd in (-1, 0, 1, 2):
            l0 = (_PAR[vd] * 2 + _PAR[vh]) * 2 * ci
            g3.append(
                v[_OFF[vd]: _OFF[vd] + td, _OFF[vh]: _OFF[vh] + th, win,
                  l0: l0 + 2 * ci]
            )
    g45 = []
    for vw in (-1, 2):
        gl = []
        for vd in (-1, 0, 1, 2):
            for vh in (-1, 0, 1, 2):
                l0 = ((_PAR[vd] * 2 + _PAR[vh]) * 2 + _PAR[vw]) * ci
                gl.append(
                    v[_OFF[vd]: _OFF[vd] + td, _OFF[vh]: _OFF[vh] + th,
                      base + _OFF[vw]: base + _OFF[vw] + W, l0: l0 + ci]
                )
        g45.append(gl)
    return [g1, g2, g3, g45[0], g45[1]]


def _kernel_halo_wide(dmap_ref, hmap_ref, x_hbm, g1_ref, g2_ref, g3_ref,
                      g4_ref, g5_ref, b_ref, out_ref, x_vmem, sems, *,
                      td, th, W, ci, act, interpret):
    """Wide-assembly variant of `_kernel_halo`: views grouped by maximal
    contiguous lane runs (see `pack_sparse_block_weights_wide`) — the
    interior GEMM's LHS is a direct full-lane VMEM slice (measured
    ~2x the throughput of a thin-slice-assembled LHS), and every GEMM's
    K is a multiple of 8*ci >= 128 (the narrow form's w-boundary GEMMs
    run K = 4*ci = 64 at Ci=16: half-empty MXU K rows)."""
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
    dn = (((3,), (0,)), ((), ()))
    prec = _dot_precision(x_vmem.dtype)

    acc = None
    for slices, w_ref in zip(
        _wide_slices(x_vmem, ci, td, th, W, base),
        (g1_ref, g2_ref, g3_ref, g4_ref, g5_ref),
    ):
        lhs = slices[0] if len(slices) == 1 else jnp.concatenate(
            slices, axis=-1
        )
        z = jax.lax.dot_general(
            lhs, w_ref[...], dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc = z if acc is None else acc + z

    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "out_dtype", "interpret")
)
def conv_block_sparse_halo_wide(
    x_block: jax.Array,  # (B, d, h, w, 8*Ci) block layout, UN-halo'd
    g1: jax.Array,
    g2: jax.Array,
    g3: jax.Array,
    g4: jax.Array,
    g5: jax.Array,
    bias8: jax.Array,
    *,
    act: str = "none",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """`conv_block_sparse_halo` with the wide-assembly GEMM grouping
    (`pack_sparse_block_weights_wide`). Same math, different f32
    accumulation order."""
    B, d, h, w, c8 = x_block.shape
    ci = c8 // 8
    co8 = g1.shape[-1]
    off = 8
    Wp = off + w + 1

    td, th = _pick_tile(
        d, h, Wp, ci, co8 // 8, itemsize=x_block.dtype.itemsize
    )
    dmap, hmap = _clamp_maps(d, h, td, th)
    kernel = functools.partial(_kernel_halo_wide, td=td, th=th, W=w, ci=ci,
                               act=act, interpret=interpret)
    flops = 2 * B * d * h * w * 64 * ci * co8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, td, th, w, co8), lambda b, i, j, *_: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, c8), x_block.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, co8), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_block.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dmap, hmap, x_block, g1, g2, g3, g4, g5, bias8)


def wide_weights_from_groups_jnp(w0, w1, w2, ci: int):
    """Regroup the (possibly traced) narrow packs (w0, w1, w2) into the
    wide-assembly groups g1..g5 — a pure row permutation (small device
    copies; used by the differentiable train kernels where weights are
    traced arrays, `conv_block_train.pack_sparse_weights_jnp`)."""
    def row_block(vd, vh, vw):
        if vw == -1:
            return w0[((vd + 1) * 4 + (vh + 1)) * ci:][:ci]
        if vw == 2:
            return w2[((vd + 1) * 4 + (vh + 1)) * ci:][:ci]
        return w1[(((vd + 1) * 4 + (vh + 1)) * 2 + vw) * ci:][:ci]

    return tuple(
        jnp.concatenate(
            [row_block(vd, vh, vw) for vd, vh, vw in entries], axis=0
        )
        for entries in _WIDE_GROUPS
    )


def _kernel_valid_wide(x_hbm, g1_ref, g2_ref, g3_ref, g4_ref, g5_ref,
                       b_ref, out_ref, x_vmem, sem, *, td, th, W, ci,
                       act, interpret):
    """Wide-assembly variant of `_kernel` (pre-padded input tile)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * td, td + 2), pl.ds(j * th, th + 2)],
        x_vmem,
        sem,
    )
    dma.start()
    dma.wait()

    dn = (((3,), (0,)), ((), ()))
    prec = _dot_precision(x_vmem.dtype)
    acc = None
    # valid tile: w offsets are _OFF[vw] in {0, 1, 2} -> base = 0
    for slices, w_ref in zip(
        _wide_slices(x_vmem, ci, td, th, W, 0),
        (g1_ref, g2_ref, g3_ref, g4_ref, g5_ref),
    ):
        lhs = slices[0] if len(slices) == 1 else jnp.concatenate(
            slices, axis=-1
        )
        z = jax.lax.dot_general(
            lhs, w_ref[...], dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc = z if acc is None else acc + z
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_dtype", "interpret", "out_w"),
)
def conv_block_sparse_valid_wide(
    x_block_padded: jax.Array,  # (B, d+2, h+2, w+2(+align), 8*Ci)
    g1: jax.Array, g2: jax.Array, g3: jax.Array, g4: jax.Array,
    g5: jax.Array,
    bias8: jax.Array,
    *,
    act: str = "none",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    out_w: int | None = None,
) -> jax.Array:
    """`conv_block_sparse_valid` with the wide-assembly grouping (no
    emit_full form)."""
    B, dp, hp, wp0, c8 = x_block_padded.shape
    ci = c8 // 8
    co8 = g1.shape[-1]
    d, h = dp - 2, hp - 2
    w = (wp0 - 2) if out_w is None else out_w

    if wp0 % 8:
        x_block_padded = jnp.pad(
            x_block_padded, ((0, 0),) * 3 + ((0, (-wp0) % 8), (0, 0))
        )
    Wp = x_block_padded.shape[3]

    td, th = _pick_tile(
        d, h, Wp, ci, co8 // 8, itemsize=x_block_padded.dtype.itemsize
    )
    kernel = functools.partial(_kernel_valid_wide, td=td, th=th, W=w,
                               ci=ci, act=act, interpret=interpret)
    flops = 2 * B * d * h * w * 64 * ci * co8
    return pl.pallas_call(
        kernel,
        grid=(B, d // td, h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, td, th, w, co8), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, co8), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, c8), x_block_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_block_padded.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(x_block_padded, g1, g2, g3, g4, g5, bias8)


def _dx_maps(d: int, ext: int, td: int):
    """Scalar-prefetch maps for the dx kernel: per output tile starting
    at a = i*td, the (td+2)-row input window covers source rows
    [a-2, a+td) with zeros outside [0, d). Columns: (core_start,
    top1_src, top2_src, zlo, zhi) — clamped DMA sources plus the
    in-range row bounds for the in-kernel zero mask."""
    ai = np.arange(ext // td, dtype=np.int32) * td
    core = np.clip(ai, 0, max(d - td, 0))
    top1 = np.maximum(ai - 1, 0)          # tile row 1 <- src a-1
    top2 = np.maximum(ai - 2, 0)          # tile row 0 <- src a-2
    zlo = np.maximum(2 - ai, 0)           # rows < zlo map to src < 0
    zhi = np.minimum(d + 2 - ai, td + 2)  # rows >= zhi map to src >= d
    return jnp.asarray(
        np.stack([core, top2, top1, zlo, np.maximum(zhi, 0)], axis=1)
    )


def _dx_halo_copies(x_hbm, x_vmem, sems, b, dmap_ref, hmap_ref, i, j, *,
                    td, th, w, off):
    """9 DMAs assembling the dx input window (td+2, th+2, w) at
    (0, 0, off): core rows land at tile offset 2 (the window is
    [a-2, a+td), so BOTH halo rows sit above the core)."""
    d0, dt2, dt1 = dmap_ref[i, 0], dmap_ref[i, 1], dmap_ref[i, 2]
    h0, ht2, ht1 = hmap_ref[j, 0], hmap_ref[j, 1], hmap_ref[j, 2]
    dst_w = pl.ds(off, w)
    pieces = (
        ((pl.ds(d0, td), pl.ds(h0, th)), (pl.ds(2, td), pl.ds(2, th))),
        ((pl.ds(dt1, 1), pl.ds(h0, th)), (pl.ds(1, 1), pl.ds(2, th))),
        ((pl.ds(dt2, 1), pl.ds(h0, th)), (pl.ds(0, 1), pl.ds(2, th))),
        ((pl.ds(d0, td), pl.ds(ht1, 1)), (pl.ds(2, td), pl.ds(1, 1))),
        ((pl.ds(d0, td), pl.ds(ht2, 1)), (pl.ds(2, td), pl.ds(0, 1))),
        ((pl.ds(dt1, 1), pl.ds(ht1, 1)), (pl.ds(1, 1), pl.ds(1, 1))),
        ((pl.ds(dt1, 1), pl.ds(ht2, 1)), (pl.ds(1, 1), pl.ds(0, 1))),
        ((pl.ds(dt2, 1), pl.ds(ht1, 1)), (pl.ds(0, 1), pl.ds(1, 1))),
        ((pl.ds(dt2, 1), pl.ds(ht2, 1)), (pl.ds(0, 1), pl.ds(0, 1))),
    )
    dmas = []
    for k, ((sd, sh), (dd, dh)) in enumerate(pieces):
        dma = pltpu.make_async_copy(
            x_hbm.at[b, sd, sh, :, :],
            x_vmem.at[dd, dh, dst_w, :],
            sems.at[k],
        )
        dma.start()
        dmas.append(dma)
    return dmas


def _kernel_dx_halo_wide(dmap_ref, hmap_ref, x_hbm, g1_ref, g2_ref,
                         g3_ref, g4_ref, g5_ref, b_ref, out_ref, x_vmem,
                         sems, *, td, th, W, w_src, ci, interpret):
    """dx = 'valid' sparse conv over the 2-zero-padded gradient, with the
    zero halo assembled IN-KERNEL (the HBM-side jnp.pad of the extended
    gradient was ~6 ms of the wave-38 step trace). Output rows r compute
    the extended-grid gradient dx_ext[r] (caller slices to d+2 and
    applies the pad adjoint). Wide-assembly GEMM grouping."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    off = 8
    for dma in _dx_halo_copies(x_hbm, x_vmem, sems, b, dmap_ref,
                               hmap_ref, i, j, td=td, th=th, w=w_src,
                               off=off):
        dma.wait()
    # zero-mask out-of-range rows/cols (the DMA clamps sources in-bounds;
    # clamped rows carry neighbor values that MUST read as zeros)
    zlo_d, zhi_d = dmap_ref[i, 3], dmap_ref[i, 4]
    zlo_h, zhi_h = hmap_ref[j, 3], hmap_ref[j, 4]
    shape = x_vmem.shape
    io_d = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    io_h = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    io_w = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    mask = (
        (io_d >= zlo_d) & (io_d < zhi_d)
        & (io_h >= zlo_h) & (io_h < zhi_h)
        & (io_w >= off) & (io_w < off + w_src)
    )
    x_vmem[...] = jnp.where(mask, x_vmem[...], 0).astype(x_vmem.dtype)

    # window base: out col c reads src cols [c-2, c] -> tile cols
    # (off-2) + c + _OFF[vw]
    base = off - 2
    dn = (((3,), (0,)), ((), ()))
    prec = _dot_precision(x_vmem.dtype)
    acc = None
    for slices, w_ref in zip(
        _wide_slices(x_vmem, ci, td, th, W, base),
        (g1_ref, g2_ref, g3_ref, g4_ref, g5_ref),
    ):
        lhs = slices[0] if len(slices) == 1 else jnp.concatenate(
            slices, axis=-1
        )
        z = jax.lax.dot_general(
            lhs, w_ref[...], dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc = z if acc is None else acc + z
    acc = acc + b_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret", "ext")
)
def conv_block_sparse_dx(
    dpre: jax.Array,  # (B, d, h, w, 8*Co) UN-padded gradient
    g1: jax.Array, g2: jax.Array, g3: jax.Array, g4: jax.Array,
    g5: jax.Array,
    bias8: jax.Array,  # zeros (1, 8*Ci)
    *,
    ext: tuple[int, int, int],  # 8-aligned output extents >= (d+2, ...)
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """The dx conv of `conv_block_sparse_train._bwd` with the zero halo
    assembled in-kernel: out[r] = valid-conv(zeropad2(dpre))[r] for
    r < d+2 (rows beyond d+2 are don't-care fill for tile alignment).
    Weights are the wide regroup of the flipped-transposed pack."""
    B, d, h, w, cin8 = dpre.shape
    cin = cin8 // 8          # = forward Co (the gradient's channels)
    co8 = g1.shape[-1]       # = 8 * forward Ci (dx channels)
    ext_d, ext_h, ext_w = ext
    off = 8
    Wp = off + ext_w + 2  # tile cols [off-2, off+ext_w)

    td, th = _pick_tile(
        ext_d, ext_h, Wp, cin, co8 // 8, itemsize=dpre.dtype.itemsize
    )
    dmap = _dx_maps(d, ext_d, td)
    hmap = _dx_maps(h, ext_h, th)
    kernel = functools.partial(
        _kernel_dx_halo_wide, td=td, th=th, W=ext_w, w_src=w, ci=cin,
        interpret=interpret,
    )
    flops = 2 * B * ext_d * ext_h * ext_w * 64 * cin * co8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, ext_d // td, ext_h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, td, th, ext_w, co8), lambda b, i, j, *_: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, dpre.shape[-1]), dpre.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, ext_d, ext_h, ext_w, co8), out_dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=dpre.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dmap, hmap, dpre, g1, g2, g3, g4, g5, bias8)


def _sparse_full_tensor(w: np.ndarray) -> np.ndarray:
    """DHWIO (3,3,3,Ci,Co) -> (Vd, Vh, Vw, Ci, 8*Co) tap-view tensor:
    entry [v+1, ...] holds the weight rows of the per-axis shifted view
    v in {-1, 0, 1, 2} (see module docstring); N cols are output
    sub-position (ad, ah, aw)-major channel-minor."""
    w = np.asarray(w)
    ci, co = w.shape[3], w.shape[4]
    full = np.zeros((4, 4, 4, ci, 2, 2, 2, co), w.dtype)
    for ad in range(2):
        for ah in range(2):
            for aw in range(2):
                for kd in range(3):
                    for kh in range(3):
                        for kw in range(3):
                            vd, vh, vw = ad + kd - 1, ah + kh - 1, aw + kw - 1
                            full[vd + 1, vh + 1, vw + 1, :, ad, ah, aw, :] \
                                += w[kd, kh, kw]
    return full.reshape(4, 4, 4, ci, 8 * co)


def pack_sparse_block_weights(w: np.ndarray) -> tuple[np.ndarray, ...]:
    """DHWIO (3,3,3,Ci,Co) -> sparse block GEMM weights, split into the
    three w-offset groups the kernel GEMMs separately:

        W0 (16*Ci, 8*Co)  rows (vd, vh)-major, vw = -1
        W1 (32*Ci, 8*Co)  rows (vd, vh, vw in {0, 1})-major
        W2 (16*Ci, 8*Co)  rows (vd, vh)-major, vw = 2

    K rows are channel-minor; N cols are output sub-position
    (ad, ah, aw)-major channel-minor (matching `_space_to_depth`).
    """
    w = np.asarray(w)
    ci, co = w.shape[3], w.shape[4]
    full = _sparse_full_tensor(w).reshape(4, 4, 4 * ci, 8 * co)
    w0 = full[:, :, :ci].reshape(16 * ci, 8 * co)
    w1 = full[:, :, ci: 3 * ci].reshape(32 * ci, 8 * co)
    w2 = full[:, :, 3 * ci:].reshape(16 * ci, 8 * co)
    return w0, w1, w2


def pack_sparse_block_weights_wide(w: np.ndarray) -> tuple[np.ndarray, ...]:
    """DHWIO -> the WIDE-assembly GEMM groups. The 64 shifted views are
    regrouped by maximal contiguous lane runs of the block tile (lane =
    ((pd*2+ph)*2+pw)*ci + c, parity bits p = PAR[v]):

        g1 (8*Ci,  8*Co)  all-interior views — the LHS is ONE direct
                          full-lane VMEM slice, no assembly at all
        g2 (8*Ci,  8*Co)  d-boundary, h/w interior — two 4*Ci slices
        g3 (16*Ci, 8*Co)  h-boundary, w interior — eight 2*Ci slices
        g4 (16*Ci, 8*Co)  vw = -1 — sixteen Ci slices
        g5 (16*Ci, 8*Co)  vw =  2 — sixteen Ci slices

    vs the (vd-chunked) narrow pack whose every LHS is assembled from
    Ci-wide slices and whose w-boundary GEMMs run K = 4*Ci (64 lanes at
    Ci=16 — half-empty MXU K rows). Row orders must match the slice
    enumeration in `_kernel_halo_wide` exactly.
    """
    w = np.asarray(w)
    full = _sparse_full_tensor(w)
    return tuple(
        np.concatenate(
            [full[vd + 1, vh + 1, vw + 1] for vd, vh, vw in entries],
            axis=0,
        )
        for entries in _WIDE_GROUPS
    )


def pack_sparse_block_weights_wide_cat(
    w: np.ndarray, c1: int
) -> tuple[np.ndarray, ...]:
    """Wide-assembly pack for the TWO-OPERAND skip conv: the full conv
    weight (Ci = c1 + c2 in model concat order) split per operand, each
    packed per `_WIDE_GROUPS`, rows stacked [encoder group | feature
    group] — the kernel's LHS concatenates all encoder lane runs of a
    group before all feature runs (the per-view interleave of the narrow
    cat kernel would break the run merging)."""
    w = np.asarray(w)
    fe = _sparse_full_tensor(w[:, :, :, :c1])
    ff = _sparse_full_tensor(w[:, :, :, c1:])
    outs = []
    for entries in _WIDE_GROUPS:
        rows_e = np.concatenate(
            [fe[vd + 1, vh + 1, vw + 1] for vd, vh, vw in entries], axis=0
        )
        rows_f = np.concatenate(
            [ff[vd + 1, vh + 1, vw + 1] for vd, vh, vw in entries], axis=0
        )
        outs.append(np.concatenate([rows_e, rows_f], axis=0))
    return tuple(outs)


_VMEM_LIMIT = 40 * 2 ** 20  # raised scoped-vmem limit (v5e: 128 MB phys)

# The two-operand cat kernel keeps its full sparse weight pack resident in
# VMEM; cap it so the pack + tile scratch stay under the scoped limit
# (13 MB matches choose_impl_v2's _SPARSE_W_BYTES_MAX — the largest
# HW-validated pack is the dev 64+128->64 level at 12.58 MB, wave-34).
_SPARSE_CAT_W_BYTES_MAX = 13 * 2 ** 20


def _pick_tile(d, h, Wp, ci, co, itemsize=2, vmem_budget=24 * 2 ** 20):
    """Largest (td, th) dividing (d, h) whose working set fits VMEM.
    Mosaic additionally materializes a relayout copy of the GEMM LHS and
    accumulator (measured: true usage ~ model + xs + z), hence the 2x
    factors. The LHS materializes one 8*ci-row vd-chunk at a time (kernel
    loop); budget 2 live chunks x relayout."""
    w_bytes = 64 * ci * 8 * co * itemsize

    def cost(td, th):
        x_tile = (td + 2) * (th + 2) * Wp * 8 * ci * itemsize
        xs = 4 * td * th * Wp * 8 * ci * itemsize
        z = 2 * td * th * Wp * 8 * co * 4
        out = td * th * Wp * 8 * co * itemsize
        return 2 * (x_tile + out) + xs + z + w_bytes

    best = (1, 1)
    for td in (16, 8, 4, 2, 1):
        if d % td:
            continue
        for th in (16, 8, 4, 2, 1):
            if h % th:
                continue
            if cost(td, th) <= vmem_budget and td * th > best[0] * best[1]:
                best = (td, th)
    return best


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_dtype", "interpret", "out_w", "emit_full"),
)
def conv_block_sparse_valid(
    x_block_padded: jax.Array,  # (B, d+2, h+2, w+2(+align), 8*Ci) halo'd
    w0: jax.Array,              # (16*Ci, 8*Co) — vw = -1 rows
    w1: jax.Array,              # (32*Ci, 8*Co) — vw in {0, 1} rows
    w2: jax.Array,              # (16*Ci, 8*Co) — vw = 2 rows
    bias8: jax.Array,           # (1, 8*Co) — true bias tiled over sub-pos
    *,
    act: str = "none",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    out_w: int | None = None,   # true output w when the pad included an
                                # alignment tail (merged single-pad path)
    emit_full: bool = False,    # emit the depth-to-space'd full-res tensor
                                # (B, 2d, 2h, 2w, Co) directly (fuses the
                                # exit d2s into the final conv's store)
) -> jax.Array:
    """Block-space 'valid' 3^3 conv + bias + act:
    returns (B, d, h, w, 8*Co), or (B, 2d, 2h, 2w, Co) with `emit_full`.
    Batch is a grid dimension (vmap cannot batch pl.ANY inputs with manual
    DMA)."""
    B, dp, hp, wp0, c8 = x_block_padded.shape
    ci = c8 // 8
    co8 = w1.shape[-1]
    d, h = dp - 2, hp - 2
    w = (wp0 - 2) if out_w is None else out_w

    if wp0 % 8:
        # align here only if the caller didn't (single-pad fast path pads
        # halo + alignment in one jnp.pad)
        x_block_padded = jnp.pad(
            x_block_padded, ((0, 0),) * 3 + ((0, (-wp0) % 8), (0, 0))
        )
    Wp = x_block_padded.shape[3]

    td, th = _pick_tile(
        d, h, Wp, ci, co8 // 8, itemsize=x_block_padded.dtype.itemsize
    )
    kernel = functools.partial(_kernel, td=td, th=th, W=w, ci=ci, act=act,
                               interpret=interpret, emit_full=emit_full)
    flops = 2 * B * d * h * w * 64 * ci * co8
    if emit_full:
        co = co8 // 8
        out_specs = pl.BlockSpec(
            (1, td, 2, th, 2, w, 2 * co),
            lambda b, i, j: (b, i, 0, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (B, d, 2, h, 2, w, 2 * co), out_dtype
        )
    else:
        out_specs = pl.BlockSpec(
            (1, td, th, w, co8), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B, d, h, w, co8), out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, c8), x_block_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_block_padded.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(x_block_padded, w0, w1, w2, bias8)
    if emit_full:
        # (d, 2, h, 2, w, 2C) -> (2d, 2h, 2w, C): contiguous merge, free
        co = co8 // 8
        out = out.reshape(B, 2 * d, 2 * h, 2 * w, co)
    return out


def prepack_sparse(
    w,  # DHWIO (3, 3, 3, Ci, Co) — concrete array, packed on host once
    b=None,
    *,
    act: str = "none",
    compute_dtype=jnp.bfloat16,
    cat_c1: int = 0,
) -> dict:
    """Host-side weight repack for the sparse block kernel. With
    `cat_c1 > 0` (a skip-concat conv whose first cat_c1 input channels
    are the encoder tap) the wide two-operand pack is emitted too."""
    w = np.asarray(w, np.float32)
    ci, co = w.shape[3], w.shape[4]
    b = np.zeros((co,), np.float32) if b is None else np.asarray(
        b, np.float32
    )
    w0, w1, w2 = pack_sparse_block_weights(w)
    packed = {
        "w0": jnp.asarray(w0).astype(compute_dtype),
        "w1": jnp.asarray(w1).astype(compute_dtype),
        "w2": jnp.asarray(w2).astype(compute_dtype),
        "b8": jnp.asarray(np.tile(b, 8))[None],
        "act": act,
        "ci": ci,
        "co": co,
    }
    # wide-assembly grouping for the halo kernel (same bytes total; the
    # kernel loads only the variant it uses)
    for name, g in zip(
        ("g1", "g2", "g3", "g4", "g5"), pack_sparse_block_weights_wide(w)
    ):
        packed[name] = jnp.asarray(g).astype(compute_dtype)
    if cat_c1 > 0:
        packed["cat_c1"] = cat_c1
        for name, g in zip(
            ("h1", "h2", "h3", "h4", "h5"),
            pack_sparse_block_weights_wide_cat(w, cat_c1),
        ):
            packed[name] = jnp.asarray(g).astype(compute_dtype)
    return packed


def conv_block_sparse(
    x_block: jax.Array,  # (B, d, h, w, 8*Ci) block layout, un-halo'd
    packed: dict,
    *,
    pad_type: str = "zeros",
    interpret: bool = False,
    emit_full: bool = False,
    out_dtype=None,
) -> jax.Array:
    """'Same'-padded sparse block conv: 1-block halo (edge == full-res
    reflect; zeros == full-res zeros), then the valid kernel. For reflect
    the halo is assembled in-kernel (no HBM pad copy) unless disabled via
    ANATOMIX_HALO=0; zeros and emit_full keep the padded path."""
    if pad_type == "reflect":
        mode = "edge"
    elif pad_type == "zeros":
        mode = "constant"
    else:
        raise ValueError(
            f"pad_type {pad_type!r} has no block-space halo equivalent"
        )
    import os

    if (
        mode == "edge"
        and not emit_full
        and os.environ.get("ANATOMIX_HALO", "1") != "0"
    ):
        if (
            "g1" in packed
            # wave-36 standalone A/B: wide wins at block extents >= 32
            # (-16/-20%), loses at 16 (+15%) — gate by extent
            and x_block.shape[3] >= 32
            and os.environ.get("ANATOMIX_WIDE", "1") != "0"
        ):
            return conv_block_sparse_halo_wide(
                x_block, packed["g1"], packed["g2"], packed["g3"],
                packed["g4"], packed["g5"], packed["b8"],
                act=packed["act"],
                out_dtype=out_dtype or x_block.dtype,
                interpret=interpret,
            )
        return conv_block_sparse_halo(
            x_block, packed["w0"], packed["w1"], packed["w2"],
            packed["b8"], act=packed["act"],
            out_dtype=out_dtype or x_block.dtype,
            interpret=interpret,
        )
    # single pad: 1-voxel halo on d/h/w plus the sublane-alignment tail
    # on w (tail columns are DMA'd but never enter the GEMM)
    align = (-(x_block.shape[3] + 2)) % 8
    xp = jnp.pad(
        x_block, ((0, 0), (1, 1), (1, 1), (1, 1 + align), (0, 0)),
        mode=mode,
    )
    if (
        "g1" in packed
        and not emit_full
        and x_block.shape[3] >= 32
        and os.environ.get("ANATOMIX_WIDE", "1") != "0"
    ):
        return conv_block_sparse_valid_wide(
            xp, packed["g1"], packed["g2"], packed["g3"], packed["g4"],
            packed["g5"], packed["b8"], act=packed["act"],
            out_dtype=out_dtype or x_block.dtype, interpret=interpret,
            out_w=x_block.shape[3],
        )
    return conv_block_sparse_valid(
        xp, packed["w0"], packed["w1"], packed["w2"], packed["b8"],
        act=packed["act"], out_dtype=out_dtype or x_block.dtype,
        interpret=interpret,
        out_w=x_block.shape[3], emit_full=emit_full,
    )


# -----------------------------------------------------------------------------
# Two-input (skip-concat) sparse conv: consumes the encoder tap and the
# upsampled decoder tensor as SEPARATE block-space operands, building each
# GEMM view as [enc c1 rows | feat c2 rows] in VMEM. The channel-interleaved
# concat those rows represent — (B,d,h,w,8,c1)⊕(B,d,h,w,8,c2) reshaped back
# to (…, 8(c1+c2)) — was ~7.5 ms of kLoop interleave copies per 94M dev
# forward at 128³ (wave-33 trace, unet_fused.py:648-655). The weights are
# the UNCHANGED `pack_sparse_block_weights` of the full (c1+c2)-input conv:
# its per-view rows are channel-minor in model concat order [enc, feat],
# which is exactly the order the two VMEM slices concatenate in.
# Used by the trilinear-interp decoder (anatomix-dev); the nearest decoder
# keeps the cheaper folded `sparse_skip` kernel (27*c2 small-tensor rows).


def _kernel_cat_halo(dmap_ref, hmap_ref, a_hbm, f_hbm, w0_ref, w1_ref,
                     w2_ref, b_ref, out_ref, a_vmem, f_vmem, sems, *,
                     td, th, W, c1, c2, act, interpret):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    off = 8
    dmas = _halo_copies(a_hbm, a_vmem, sems, b, dmap_ref, hmap_ref,
                        i, j, td=td, th=th, w=W, off=off)
    dmas += _halo_copies(f_hbm, f_vmem, sems, b, dmap_ref, hmap_ref,
                         i, j, td=td, th=th, w=W, off=off, sem_base=9)
    for dma in dmas:
        dma.wait()
    # w-axis halo: in-VMEM edge copies (block-space edge == full-res
    # mirror reflect for the ±1 fine halo the views read, see _kernel_halo)
    a_vmem[:, :, off - 1] = a_vmem[:, :, off]
    a_vmem[:, :, off + W] = a_vmem[:, :, off + W - 1]
    f_vmem[:, :, off - 1] = f_vmem[:, :, off]
    f_vmem[:, :, off + W] = f_vmem[:, :, off + W - 1]

    base = off - 1

    def chunk(vd, vws):
        views = []
        for vh in (-1, 0, 1, 2):
            for vw in vws:
                par = (_PAR[vd] * 2 + _PAR[vh]) * 2 + _PAR[vw]
                idx = (
                    slice(_OFF[vd], _OFF[vd] + td),
                    slice(_OFF[vh], _OFF[vh] + th),
                    slice(base + _OFF[vw], base + _OFF[vw] + W),
                )
                views.append(
                    a_vmem[idx + (slice(par * c1, (par + 1) * c1),)]
                )
                views.append(
                    f_vmem[idx + (slice(par * c2, (par + 1) * c2),)]
                )
        return jnp.concatenate(views, axis=-1)

    dn = (((3,), (0,)), ((), ()))
    ci = c1 + c2
    acc = None
    for w_ref, vws in ((w1_ref, (0, 1)), (w0_ref, (-1,)), (w2_ref, (2,))):
        rows = 4 * len(vws) * ci
        for n, vd in enumerate((-1, 0, 1, 2)):
            z = jax.lax.dot_general(
                chunk(vd, vws), w_ref[n * rows: (n + 1) * rows], dn,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(a_vmem.dtype),
            )
            acc = z if acc is None else acc + z
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "out_dtype", "interpret")
)
def conv_block_sparse_cat_halo(
    enc_block: jax.Array,   # (B, d, h, w, 8*c1) block layout, UN-halo'd
    feat_block: jax.Array,  # (B, d, h, w, 8*c2) block layout, UN-halo'd
    w0: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    bias8: jax.Array,
    *,
    act: str = "none",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """'Same'-padded (full-res reflect) sparse block conv over the
    channel-concat [enc, feat], consumed as two operands — the interleaved
    concat is never materialized. Returns (B, d, h, w, 8*Co)."""
    B, d, h, w, c18 = enc_block.shape
    c1 = c18 // 8
    c2 = feat_block.shape[-1] // 8
    co8 = w1.shape[-1]
    off = 8
    Wp = off + w + 1

    td, th = _pick_tile(
        d, h, Wp, c1 + c2, co8 // 8, itemsize=enc_block.dtype.itemsize
    )
    dmap, hmap = _clamp_maps(d, h, td, th)
    kernel = functools.partial(_kernel_cat_halo, td=td, th=th, W=w,
                               c1=c1, c2=c2, act=act, interpret=interpret)
    flops = 2 * B * d * h * w * 64 * (c1 + c2) * co8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # enc stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # feat stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, td, th, w, co8), lambda b, i, j, *_: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, 8 * c1), enc_block.dtype),
            pltpu.VMEM((td + 2, th + 2, Wp, 8 * c2), feat_block.dtype),
            pltpu.SemaphoreType.DMA((18,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, co8), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=enc_block.nbytes + feat_block.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dmap, hmap, enc_block, feat_block, w0, w1, w2, bias8)


def _kernel_cat_halo_wide(dmap_ref, hmap_ref, a_hbm, f_hbm, h1_ref, h2_ref,
                          h3_ref, h4_ref, h5_ref, b_ref, out_ref, a_vmem,
                          f_vmem, sems, *, td, th, W, c1, c2, act,
                          interpret):
    """Wide-assembly two-operand skip conv: per GEMM group the LHS is
    [all encoder lane runs | all feature lane runs] (weights packed by
    `pack_sparse_block_weights_wide_cat`)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    off = 8
    dmas = _halo_copies(a_hbm, a_vmem, sems, b, dmap_ref, hmap_ref,
                        i, j, td=td, th=th, w=W, off=off)
    dmas += _halo_copies(f_hbm, f_vmem, sems, b, dmap_ref, hmap_ref,
                         i, j, td=td, th=th, w=W, off=off, sem_base=9)
    for dma in dmas:
        dma.wait()
    a_vmem[:, :, off - 1] = a_vmem[:, :, off]
    a_vmem[:, :, off + W] = a_vmem[:, :, off + W - 1]
    f_vmem[:, :, off - 1] = f_vmem[:, :, off]
    f_vmem[:, :, off + W] = f_vmem[:, :, off + W - 1]

    base = off - 1
    dn = (((3,), (0,)), ((), ()))
    prec = _dot_precision(a_vmem.dtype)

    acc = None
    for enc_sl, feat_sl, w_ref in zip(
        _wide_slices(a_vmem, c1, td, th, W, base),
        _wide_slices(f_vmem, c2, td, th, W, base),
        (h1_ref, h2_ref, h3_ref, h4_ref, h5_ref),
    ):
        lhs = jnp.concatenate(enc_sl + feat_sl, axis=-1)
        z = jax.lax.dot_general(
            lhs, w_ref[...], dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc = z if acc is None else acc + z
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "out_dtype", "interpret")
)
def conv_block_sparse_cat_halo_wide(
    enc_block: jax.Array,   # (B, d, h, w, 8*c1) block layout, UN-halo'd
    feat_block: jax.Array,  # (B, d, h, w, 8*c2) block layout, UN-halo'd
    h1: jax.Array,
    h2: jax.Array,
    h3: jax.Array,
    h4: jax.Array,
    h5: jax.Array,
    bias8: jax.Array,
    *,
    act: str = "none",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """`conv_block_sparse_cat_halo` with the wide-assembly grouping."""
    B, d, h, w, c18 = enc_block.shape
    c1 = c18 // 8
    c2 = feat_block.shape[-1] // 8
    co8 = h1.shape[-1]
    off = 8
    Wp = off + w + 1

    td, th = _pick_tile(
        d, h, Wp, c1 + c2, co8 // 8, itemsize=enc_block.dtype.itemsize
    )
    dmap, hmap = _clamp_maps(d, h, td, th)
    kernel = functools.partial(_kernel_cat_halo_wide, td=td, th=th, W=w,
                               c1=c1, c2=c2, act=act, interpret=interpret)
    flops = 2 * B * d * h * w * 64 * (c1 + c2) * co8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # enc stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # feat stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, td, th, w, co8), lambda b, i, j, *_: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, 8 * c1), enc_block.dtype),
            pltpu.VMEM((td + 2, th + 2, Wp, 8 * c2), feat_block.dtype),
            pltpu.SemaphoreType.DMA((18,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, co8), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=enc_block.nbytes + feat_block.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dmap, hmap, enc_block, feat_block, h1, h2, h3, h4, h5, bias8)


def sparse_cat_eligible(
    c1: int, c2: int, w: int, pad_type: str, co: int | None = None
) -> bool:
    """The two-operand kernel needs per-operand channel slices that hit
    lane-aligned (8*c % 128 == 0) VMEM offsets — c % 16 per operand — the
    sparse W extent rule, and the edge-copy halo (== full-res reflect).

    When `co` is given, the sparse weight pack (64*(c1+c2)*8*co bf16 —
    resident whole in VMEM) must also fit the same cap as the one-operand
    kernel: the dev blk-16 decoder shape (128+256 -> 128) carries a 48 MB
    pack that busts the 40 MB scoped-vmem limit on HW (wave-34 probe),
    so callers must demote it to the materialized-concat path."""
    if co is not None:
        w_bytes = 64 * (c1 + c2) * 8 * co * 2
        if w_bytes > _SPARSE_CAT_W_BYTES_MAX:
            return False
    return (
        pad_type == "reflect"
        and c1 % 16 == 0
        and c2 % 16 == 0
        and w % 8 == 0
    )


def conv_block_sparse_cat(
    enc_block: jax.Array,
    feat_block: jax.Array,
    packed: dict,
    *,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """Dispatch for the two-operand skip conv (reflect padding only —
    callers check `sparse_cat_eligible` and fall back to the materialized
    concat + `conv_block_sparse` otherwise)."""
    import os

    c1 = enc_block.shape[-1] // 8
    if (
        "h1" in packed
        and packed.get("cat_c1") == c1
        and enc_block.shape[3] >= 32
        and os.environ.get("ANATOMIX_WIDE", "1") != "0"
    ):
        return conv_block_sparse_cat_halo_wide(
            enc_block, feat_block, packed["h1"], packed["h2"],
            packed["h3"], packed["h4"], packed["h5"], packed["b8"],
            act=packed["act"], out_dtype=out_dtype or enc_block.dtype,
            interpret=interpret,
        )
    return conv_block_sparse_cat_halo(
        enc_block, feat_block, packed["w0"], packed["w1"], packed["w2"],
        packed["b8"], act=packed["act"],
        out_dtype=out_dtype or enc_block.dtype,
        interpret=interpret,
    )


# -----------------------------------------------------------------------------
# Fused upsample + skip-concat + conv (decoder blocks)
#
# The reference decoder does Upsample(2, nearest) -> cat([enc, up], ch) ->
# conv (`network.py:498-502,543-547`). In block space, nearest x2 is a pure
# channel broadcast — both parities of an upsampled voxel read the SAME
# source voxel — so the conv can consume the *small* pre-upsample tensor
# directly: its 64 (v) views collapse to 27 (floor(v/2)) views with weights
# summed over parities (K = 27*c2), while the encoder skip joins in block
# form (K = 64*c1). The upsampled tensor and the concat are never
# materialized (they were the tile broadcasts + interleave reshapes in the
# v2 trace).


def _kernel_skip(enc_hbm, sm_hbm, w0_ref, w1_ref, w2_ref, b_ref, out_ref,
                 enc_vmem, sm_vmem, sems, *, td, th, W, c1, c2, act,
                 interpret):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dma_e = pltpu.make_async_copy(
        enc_hbm.at[b, pl.ds(i * td, td + 2), pl.ds(j * th, th + 2)],
        enc_vmem, sems.at[0],
    )
    dma_s = pltpu.make_async_copy(
        sm_hbm.at[b, pl.ds(i * td, td + 2), pl.ds(j * th, th + 2)],
        sm_vmem, sems.at[1],
    )
    dma_e.start()
    dma_s.start()
    dma_e.wait()
    dma_s.wait()

    # encoder views chunked by vd (weight rows are vd-major row slices,
    # see _kernel); the small (pre-upsample) tensor contributes one extra
    # GEMM per w-offset group, with its VMEM tile sliced back from the
    # DMA-padded lane count to the true c2 (the GEMM must not carry the
    # zero rows — 2.37x FLOPs waste at the top decoder level)
    def enc_chunk(vd, vws):
        views = []
        for vh in (-1, 0, 1, 2):
            for vw in vws:
                g = ((_PAR[vd] * 2 + _PAR[vh]) * 2 + _PAR[vw]) * c1
                views.append(
                    enc_vmem[
                        _OFF[vd]: _OFF[vd] + td,
                        _OFF[vh]: _OFF[vh] + th,
                        _OFF[vw]: _OFF[vw] + W,
                        g: g + c1,
                    ]
                )
        return jnp.concatenate(views, axis=-1)

    def sm_group(gw):
        views = [
            sm_vmem[od: od + td, oh: oh + th, gw: gw + W, :c2]
            for od in (0, 1, 2)
            for oh in (0, 1, 2)
        ]
        return jnp.concatenate(views, axis=-1)

    dn = (((3,), (0,)), ((), ()))
    acc = None
    for gw, (w_ref, vws) in enumerate(
        ((w0_ref, (-1,)), (w1_ref, (0, 1)), (w2_ref, (2,)))
    ):
        rows = 4 * len(vws) * c1
        for n, vd in enumerate((-1, 0, 1, 2)):
            z = jax.lax.dot_general(
                enc_chunk(vd, vws), w_ref[n * rows: (n + 1) * rows], dn,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(w_ref.dtype),
            )
            acc = z if acc is None else acc + z
        acc += jax.lax.dot_general(
            sm_group(gw), w_ref[4 * rows:], dn,
            preferred_element_type=jnp.float32,
            precision=_dot_precision(w_ref.dtype),
        )
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


def _kernel_skip_halo(dmap_ref, hmap_ref, enc_hbm, sm_hbm, w0_ref, w1_ref,
                      w2_ref, b_ref, out_ref, enc_vmem, sm_vmem, sems, *,
                      td, th, W, c1, c2, act, interpret):
    """Hybrid skip kernel: the (4x bigger) encoder tensor's halo is
    assembled in-kernel from the un-padded HBM tensor (9 clamped DMAs);
    the small pre-upsample tensor arrives HBM-halo'd as before (it may
    need a channel pad for the DMA minor-dim rule anyway)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    off = 8
    dma_s = pltpu.make_async_copy(
        sm_hbm.at[b, pl.ds(i * td, td + 2), pl.ds(j * th, th + 2)],
        sm_vmem, sems.at[9],
    )
    dma_s.start()
    dmas = _halo_copies(enc_hbm, enc_vmem, sems, b, dmap_ref, hmap_ref,
                        i, j, td=td, th=th, w=W, off=off)
    for dma in dmas:
        dma.wait()
    enc_vmem[:, :, off - 1] = enc_vmem[:, :, off]
    enc_vmem[:, :, off + W] = enc_vmem[:, :, off + W - 1]
    dma_s.wait()

    base = off - 1

    def enc_chunk(vd, vws):
        views = []
        for vh in (-1, 0, 1, 2):
            for vw in vws:
                g = ((_PAR[vd] * 2 + _PAR[vh]) * 2 + _PAR[vw]) * c1
                views.append(
                    enc_vmem[
                        _OFF[vd]: _OFF[vd] + td,
                        _OFF[vh]: _OFF[vh] + th,
                        base + _OFF[vw]: base + _OFF[vw] + W,
                        g: g + c1,
                    ]
                )
        return jnp.concatenate(views, axis=-1)

    def sm_group(gw):
        views = [
            sm_vmem[od: od + td, oh: oh + th, gw: gw + W, :c2]
            for od in (0, 1, 2)
            for oh in (0, 1, 2)
        ]
        return jnp.concatenate(views, axis=-1)

    dn = (((3,), (0,)), ((), ()))
    acc = None
    for gw, (w_ref, vws) in enumerate(
        ((w0_ref, (-1,)), (w1_ref, (0, 1)), (w2_ref, (2,)))
    ):
        rows = 4 * len(vws) * c1
        for n, vd in enumerate((-1, 0, 1, 2)):
            z = jax.lax.dot_general(
                enc_chunk(vd, vws), w_ref[n * rows: (n + 1) * rows], dn,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(w_ref.dtype),
            )
            acc = z if acc is None else acc + z
        acc += jax.lax.dot_general(
            sm_group(gw), w_ref[4 * rows:], dn,
            preferred_element_type=jnp.float32,
            precision=_dot_precision(w_ref.dtype),
        )
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "out_dtype", "interpret", "out_w")
)
def conv_block_skip_halo(
    enc_block: jax.Array,  # (B, d, h, w, 8*c1) block layout, UN-halo'd
    sm_padded: jax.Array,  # (B, d+2, h+2, w+2(+align), c2p) halo'd
    w0: jax.Array, w1: jax.Array, w2: jax.Array,
    bias8: jax.Array,
    *,
    act: str = "none",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    out_w: int | None = None,
) -> jax.Array:
    B, d, h, w, c8 = enc_block.shape
    c1 = c8 // 8
    c2p = sm_padded.shape[-1]
    c2 = (w1.shape[0] - 32 * c1) // 9
    co8 = w1.shape[-1]
    if sm_padded.shape[3] % 8:
        sm_padded = jnp.pad(
            sm_padded,
            ((0, 0),) * 3 + ((0, (-sm_padded.shape[3]) % 8), (0, 0)),
        )
    off = 8
    Wp_enc = off + w + 1
    Wp_sm = sm_padded.shape[3]

    td, th = _pick_tile_skip(
        d, h, max(Wp_enc, Wp_sm), c1, c2, co8 // 8, c2p=c2p,
        itemsize=enc_block.dtype.itemsize,
    )
    dmap, hmap = _clamp_maps(d, h, td, th)
    kernel = functools.partial(
        _kernel_skip_halo, td=td, th=th, W=w, c1=c1, c2=c2, act=act,
        interpret=interpret,
    )
    flops = 2 * B * d * h * w * (64 * c1 + 27 * c2) * co8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, td, th, w, co8), lambda b, i, j, *_: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp_enc, c8), enc_block.dtype),
            pltpu.VMEM((td + 2, th + 2, Wp_sm, c2p), sm_padded.dtype),
            pltpu.SemaphoreType.DMA((10,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, co8), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=enc_block.nbytes + sm_padded.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dmap, hmap, enc_block, sm_padded, w0, w1, w2, bias8)


def _kernel_skip_halo_wide(dmap_ref, hmap_ref, enc_hbm, sm_hbm, s1_ref,
                           s2_ref, s3_ref, s4_ref, s5_ref, m0_ref, m1_ref,
                           m2_ref, b_ref, out_ref, enc_vmem, sm_vmem,
                           sems, *, td, th, W, c1, c2, act, interpret):
    """`_kernel_skip_halo` with the encoder side wide-assembled
    (5 lane-run-merged GEMMs, `pack_sparse_block_weights_wide` on the
    encoder weight block) and the small-tensor side unchanged (3
    per-w-offset GEMMs)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    off = 8
    dma_s = pltpu.make_async_copy(
        sm_hbm.at[b, pl.ds(i * td, td + 2), pl.ds(j * th, th + 2)],
        sm_vmem, sems.at[9],
    )
    dma_s.start()
    dmas = _halo_copies(enc_hbm, enc_vmem, sems, b, dmap_ref, hmap_ref,
                        i, j, td=td, th=th, w=W, off=off)
    for dma in dmas:
        dma.wait()
    enc_vmem[:, :, off - 1] = enc_vmem[:, :, off]
    enc_vmem[:, :, off + W] = enc_vmem[:, :, off + W - 1]
    dma_s.wait()

    base = off - 1
    dn = (((3,), (0,)), ((), ()))
    prec = _dot_precision(enc_vmem.dtype)

    acc = None
    for slices, w_ref in zip(
        _wide_slices(enc_vmem, c1, td, th, W, base),
        (s1_ref, s2_ref, s3_ref, s4_ref, s5_ref),
    ):
        lhs = slices[0] if len(slices) == 1 else jnp.concatenate(
            slices, axis=-1
        )
        z = jax.lax.dot_general(
            lhs, w_ref[...], dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc = z if acc is None else acc + z

    for gw, m_ref in enumerate((m0_ref, m1_ref, m2_ref)):
        views = [
            sm_vmem[od: od + td, oh: oh + th, gw: gw + W, :c2]
            for od in (0, 1, 2)
            for oh in (0, 1, 2)
        ]
        acc += jax.lax.dot_general(
            jnp.concatenate(views, axis=-1), m_ref[...], dn,
            preferred_element_type=jnp.float32, precision=prec,
        )
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "out_dtype", "interpret", "out_w")
)
def conv_block_skip_halo_wide(
    enc_block: jax.Array,  # (B, d, h, w, 8*c1) block layout, UN-halo'd
    sm_padded: jax.Array,  # (B, d+2, h+2, w+2(+align), c2p) halo'd
    s1: jax.Array, s2: jax.Array, s3: jax.Array, s4: jax.Array,
    s5: jax.Array,
    m0: jax.Array, m1: jax.Array, m2: jax.Array,
    bias8: jax.Array,
    *,
    act: str = "none",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    out_w: int | None = None,
) -> jax.Array:
    B, d, h, w, c8 = enc_block.shape
    c1 = c8 // 8
    c2p = sm_padded.shape[-1]
    c2 = m0.shape[0] // 9
    co8 = s1.shape[-1]
    if sm_padded.shape[3] % 8:
        sm_padded = jnp.pad(
            sm_padded,
            ((0, 0),) * 3 + ((0, (-sm_padded.shape[3]) % 8), (0, 0)),
        )
    off = 8
    Wp_enc = off + w + 1
    Wp_sm = sm_padded.shape[3]

    td, th = _pick_tile_skip(
        d, h, max(Wp_enc, Wp_sm), c1, c2, co8 // 8, c2p=c2p,
        itemsize=enc_block.dtype.itemsize,
    )
    dmap, hmap = _clamp_maps(d, h, td, th)
    kernel = functools.partial(
        _kernel_skip_halo_wide, td=td, th=th, W=w, c1=c1, c2=c2, act=act,
        interpret=interpret,
    )
    flops = 2 * B * d * h * w * (64 * c1 + 27 * c2) * co8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, d // td, h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec(
            (1, td, th, w, co8), lambda b, i, j, *_: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp_enc, c8), enc_block.dtype),
            pltpu.VMEM((td + 2, th + 2, Wp_sm, c2p), sm_padded.dtype),
            pltpu.SemaphoreType.DMA((10,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, co8), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=enc_block.nbytes + sm_padded.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dmap, hmap, enc_block, sm_padded, s1, s2, s3, s4, s5, m0, m1, m2,
      bias8)


def pack_sparse_skip_weights(w: np.ndarray, c1: int, c2_pad: int = 0):
    """DHWIO (3,3,3,c1+c2,Co) -> three per-w-offset-group GEMM weights
    where rows are [encoder block views (64*c1 split 16/32/16), small
    (pre-upsample) views (27*(c2+c2_pad) split 9/9/9, parity-summed)].

    `c2_pad` adds zero weight rows for channel padding of the small input
    (manual Mosaic DMA requires the minor dim to be a multiple of 128)."""
    w = np.asarray(w)
    cin, co = w.shape[3], w.shape[4]
    c2 = cin - c1
    enc0, enc1, enc2 = pack_sparse_block_weights(w[:, :, :, :c1])
    sm = np.zeros((3, 3, 3, c2 + c2_pad, 2, 2, 2, co), w.dtype)
    for ad in range(2):
        for ah in range(2):
            for aw in range(2):
                for kd in range(3):
                    for kh in range(3):
                        for kw in range(3):
                            od = (ad + kd - 1) // 2
                            oh = (ah + kh - 1) // 2
                            ow = (aw + kw - 1) // 2
                            sm[od + 1, oh + 1, ow + 1, :c2, ad, ah, aw, :] \
                                += w[kd, kh, kw, c1:]
    c2p = c2 + c2_pad
    sm = sm.reshape(3, 3, 3 * c2p, 8 * co)
    groups = []
    for gw, enc_g in ((0, enc0), (1, enc1), (2, enc2)):
        sm_g = sm[:, :, gw * c2p: (gw + 1) * c2p].reshape(9 * c2p, 8 * co)
        groups.append(np.concatenate([enc_g, sm_g], axis=0))
    return tuple(groups)


def prepack_sparse_skip(
    w,  # DHWIO (3, 3, 3, c1 + c2, Co)
    b=None,
    *,
    c1: int,
    act: str = "none",
    compute_dtype=jnp.bfloat16,
) -> dict:
    """Host-side repack for the fused upsample+skip+conv kernel."""
    w = np.asarray(w, np.float32)
    cin, co = w.shape[3], w.shape[4]
    b = np.zeros((co,), np.float32) if b is None else np.asarray(
        b, np.float32
    )
    c2 = cin - c1
    # pad only the DMA'd tensor (minor dim % 128); the GEMM weights carry
    # no zero rows — the kernel slices the VMEM tile back to c2 lanes
    c2_pad = (-c2) % 128
    w0, w1, w2 = pack_sparse_skip_weights(w, c1, c2_pad=0)
    packed = {
        "w0": jnp.asarray(w0).astype(compute_dtype),
        "w1": jnp.asarray(w1).astype(compute_dtype),
        "w2": jnp.asarray(w2).astype(compute_dtype),
        "b8": jnp.asarray(np.tile(b, 8))[None],
        "act": act,
        "c1": c1,
        "c2": c2,
        "c2_pad": c2_pad,
        "co": co,
    }
    # wide-assembly variant: encoder side regrouped by lane runs, small
    # side split out per w-offset group (rows = tails of w0/w1/w2)
    for name, g in zip(
        ("s1", "s2", "s3", "s4", "s5"),
        pack_sparse_block_weights_wide(w[:, :, :, :c1]),
    ):
        packed[name] = jnp.asarray(g).astype(compute_dtype)
    for gw, (name, enc_rows) in enumerate(
        zip(("m0", "m1", "m2"),
            (16 * c1, 32 * c1, 16 * c1))
    ):
        src = (w0, w1, w2)[gw]
        packed[name] = jnp.asarray(src[enc_rows:]).astype(compute_dtype)
    return packed


def _pick_tile_skip(d, h, Wp, c1, c2, co, c2p=None, itemsize=2,
                    vmem_budget=24 * 2 ** 20):
    c2p = c2 if c2p is None else c2p
    w_bytes = (64 * c1 + 27 * c2) * 8 * co * itemsize

    def cost(td, th):
        tiles = (td + 2) * (th + 2) * Wp * (8 * c1 + c2p) * itemsize
        # LHS materializes one enc vd-chunk (8*c1 rows) or the sm group
        # (9*c2 rows) at a time; 2 live x relayout copies
        xs = td * th * Wp * (32 * c1 + 18 * c2) * itemsize
        z = 2 * td * th * Wp * 8 * co * 4
        out = td * th * Wp * 8 * co * itemsize
        return 2 * (tiles + out) + xs + z + w_bytes

    best = (1, 1)
    for td in (16, 8, 4, 2, 1):
        if d % td:
            continue
        for th in (16, 8, 4, 2, 1):
            if h % th:
                continue
            if cost(td, th) <= vmem_budget and td * th > best[0] * best[1]:
                best = (td, th)
    return best


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_dtype", "interpret", "out_w"),
)
def conv_block_skip_valid(
    enc_padded: jax.Array,  # (B, d+2, h+2, w+2(+align), 8*c1) block, halo'd
    sm_padded: jax.Array,   # (B, d+2, h+2, w+2(+align), c2) normal, halo'd
    w0: jax.Array, w1: jax.Array, w2: jax.Array,
    bias8: jax.Array,
    *,
    act: str = "none",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    out_w: int | None = None,
) -> jax.Array:
    B, dp, hp, wp0, c8 = enc_padded.shape
    c1 = c8 // 8
    c2p = sm_padded.shape[-1]          # DMA-padded lane count
    c2 = (w1.shape[0] - 32 * c1) // 9  # true small-channel count (GEMM K)
    co8 = w1.shape[-1]
    d, h = dp - 2, hp - 2
    w = (wp0 - 2) if out_w is None else out_w
    if wp0 % 8:
        pad = ((0, 0),) * 3 + ((0, (-wp0) % 8), (0, 0))
        enc_padded = jnp.pad(enc_padded, pad)
        sm_padded = jnp.pad(sm_padded, pad)
    Wp = enc_padded.shape[3]

    td, th = _pick_tile_skip(
        d, h, Wp, c1, c2, co8 // 8, c2p=c2p,
        itemsize=enc_padded.dtype.itemsize,
    )
    kernel = functools.partial(
        _kernel_skip, td=td, th=th, W=w, c1=c1, c2=c2, act=act,
        interpret=interpret,
    )
    flops = 2 * B * d * h * w * (64 * c1 + 27 * c2) * co8
    return pl.pallas_call(
        kernel,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, td, th, w, co8), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, co8), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, c8), enc_padded.dtype),
            pltpu.VMEM((td + 2, th + 2, Wp, c2p), sm_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=enc_padded.nbytes + sm_padded.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(enc_padded, sm_padded, w0, w1, w2, bias8)


def conv_block_sparse_skip(
    enc_block: jax.Array,  # (B, d, h, w, 8*c1) block layout, un-halo'd
    small: jax.Array,      # (B, d, h, w, c2) pre-upsample, un-halo'd
    packed: dict,
    *,
    pad_type: str = "zeros",
    interpret: bool = False,
) -> jax.Array:
    """Fused Upsample(2, nearest) + cat([enc, up]) + 3^3 conv + bias + act,
    output in block layout (B, d, h, w, 8*Co)."""
    if pad_type == "reflect":
        mode = "edge"
    elif pad_type == "zeros":
        mode = "constant"
    else:
        raise ValueError(
            f"pad_type {pad_type!r} has no block-space halo equivalent"
        )
    align = (-(enc_block.shape[3] + 2)) % 8
    pads = ((0, 0), (1, 1), (1, 1), (1, 1 + align), (0, 0))
    if packed.get("c2_pad"):
        # manual Mosaic DMA needs minor dim % 128 == 0; zero-padded
        # channels multiply zero weight rows
        small = jnp.pad(
            small, ((0, 0),) * 4 + ((0, packed["c2_pad"]),)
        )
    # nearest-upsample halo: the reference pads the *upsampled* tensor, and
    # up(x)[-1] == x[0] (reflect of index -1 at full res is index 1, whose
    # source voxel is x[0]); for zeros the halo is zero. Edge mode matches
    # both through the parity-summed weights only when the halo voxel's
    # two parities agree — for nearest x2 they do: both read the edge.
    smp = jnp.pad(small, pads, mode=mode)
    import os

    if mode == "edge" and os.environ.get("ANATOMIX_HALO", "1") != "0":
        if (
            "s1" in packed
            and enc_block.shape[3] >= 32
            and os.environ.get("ANATOMIX_WIDE", "1") != "0"
        ):
            return conv_block_skip_halo_wide(
                enc_block, smp, packed["s1"], packed["s2"], packed["s3"],
                packed["s4"], packed["s5"], packed["m0"], packed["m1"],
                packed["m2"], packed["b8"], act=packed["act"],
                out_dtype=enc_block.dtype, interpret=interpret,
                out_w=enc_block.shape[3],
            )
        # encoder halo assembled in-kernel (the enc tensor is the big one)
        return conv_block_skip_halo(
            enc_block, smp, packed["w0"], packed["w1"], packed["w2"],
            packed["b8"], act=packed["act"], out_dtype=enc_block.dtype,
            interpret=interpret, out_w=enc_block.shape[3],
        )
    encp = jnp.pad(enc_block, pads, mode=mode)
    return conv_block_skip_valid(
        encp, smp, packed["w0"], packed["w1"], packed["w2"], packed["b8"],
        act=packed["act"], out_dtype=enc_block.dtype,
        interpret=interpret, out_w=enc_block.shape[3],
    )
