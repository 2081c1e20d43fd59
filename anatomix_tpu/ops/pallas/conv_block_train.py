"""Differentiable (custom-VJP) sparse block-space 3^3 conv for training.

The inference kernels (`conv_block.py`) take host-prepacked numpy weights;
training needs weights as traced arrays with gradients. This module:

* packs weights IN-GRAPH (`pack_sparse_weights_jnp`) — the packing is a
  pure gather of the 27 taps (per (view v, sub-position a) pair there is
  exactly one valid tap k = v - a + 1), so its VJP (the scatter-add back
  to DHWIO) comes from JAX for free;
* defines `conv_block_sparse_train` with a custom VJP:
    - dx is the SAME sparse kernel applied to the zero-padded upstream
      gradient with flipped-transposed weights (the adjoint of a 'same'
      conv), with the edge-halo (reflect) adjoint handled by the jnp pad's
      own VJP — the custom boundary is the 'valid' kernel;
    - dw runs a dedicated wgrad kernel (`_kernel_wgrad`): the same 64-view
      LHS assembly contracted against the upstream gradient over ALL
      spatial positions, accumulated in VMEM f32 across the whole grid;
    - the activation epilogue's gradient is recovered from the OUTPUT
      (relu/lrelu/elu/tanh are invertible enough: act'(pre) is a function
      of act(pre)), so no pre-activation residual is stored;
* exposes `space_to_depth_vjp` / `depth_to_space_vjp` — the reshuffle
  kernels are permutations, so each is the other's adjoint.

Reference semantics: `anatomix/model/network.py:13-124` ConvBlock
(conv3d 'same' + activation) under autograd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anatomix_tpu.ops.pallas.conv_block import (
    _clamp_maps,
    _dot_precision,
    _halo_copies,
    _OFF,
    _PAR,
    _VMEM_LIMIT,
    conv_block_sparse_valid,
)
from anatomix_tpu.ops.pallas.reshuffle import depth_to_space, space_to_depth

_GROUP_VWS = ((-1,), (0, 1), (2,))


@functools.cache
def _view_tap_index(vws: tuple[int, ...]) -> np.ndarray:
    """(n_views, 8) tap index (kd*9+kh*3+kw) per (view, sub-position a),
    27 = the zero tap. View order (vd, vh, vw)-major matches the packer
    and kernel."""
    views = [
        (vd, vh, vw)
        for vd in (-1, 0, 1, 2)
        for vh in (-1, 0, 1, 2)
        for vw in vws
    ]
    out = np.full((len(views), 8), 27, np.int32)
    for n, (vd, vh, vw) in enumerate(views):
        for ad in range(2):
            for ah in range(2):
                for aw in range(2):
                    kd, kh, kw = vd - ad + 1, vh - ah + 1, vw - aw + 1
                    if all(0 <= k <= 2 for k in (kd, kh, kw)):
                        out[n, (ad * 2 + ah) * 2 + aw] = kd * 9 + kh * 3 + kw
    return out


def pack_sparse_weights_jnp(w: jax.Array):
    """DHWIO (3,3,3,Ci,Co) -> (w0, w1, w2) GEMM weights as traced arrays
    (row/col order identical to `pack_sparse_block_weights`)."""
    ci, co = w.shape[3], w.shape[4]
    wf = jnp.concatenate(
        [w.reshape(27, ci, co), jnp.zeros((1, ci, co), w.dtype)]
    )
    out = []
    for vws in _GROUP_VWS:
        idx = _view_tap_index(vws)
        g = wf[idx.reshape(-1)].reshape(idx.shape[0], 8, ci, co)
        g = jnp.transpose(g, (0, 2, 1, 3)).reshape(-1, 8 * co)
        out.append(g)
    return tuple(out)


def _act_grad_from_y(y: jax.Array, act: str) -> jax.Array:
    """act'(pre) recovered from y = act(pre) (f32)."""
    y = y.astype(jnp.float32)
    if act == "none":
        return jnp.ones_like(y)
    if act == "relu":
        return (y > 0).astype(jnp.float32)
    if act == "lrelu":
        return jnp.where(y > 0, 1.0, 0.2)
    if act == "elu":
        return jnp.where(y > 0, 1.0, y + 1.0)
    if act == "tanh":
        return 1.0 - jnp.square(y)
    raise ValueError(f"unsupported act: {act}")


# -----------------------------------------------------------------------------
# wgrad kernel: dW_packed[g] = sum_tiles xs_g^T @ dy


def _kernel_wgrad(x_hbm, dy_ref, w0_ref, w1_ref, w2_ref, x_vmem, sem, *,
                  td, th, W, ci, interpret):
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

    first = (b == 0) & (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        w0_ref[...] = jnp.zeros_like(w0_ref)
        w1_ref[...] = jnp.zeros_like(w1_ref)
        w2_ref[...] = jnp.zeros_like(w2_ref)

    dy = dy_ref[0]

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

    # contract over all spatial positions: Mosaic's matmul wants a single
    # contracting dim, so flatten (td, th, W) -> M (leading-dim merge is
    # relayout-free) and contract dim 0 of both sides
    M = td * th * W
    dy2 = dy.reshape(M, dy.shape[-1])
    dn = (((0,), (0,)), ((), ()))
    for w_ref, vws in ((w0_ref, (-1,)), (w1_ref, (0, 1)), (w2_ref, (2,))):
        rows = 4 * len(vws) * ci
        for n, vd in enumerate((-1, 0, 1, 2)):
            part = jax.lax.dot_general(
                chunk(vd, vws).reshape(M, rows), dy2, dn,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(dy2.dtype),
            )
            w_ref[n * rows: (n + 1) * rows] += part


def _kernel_wgrad_halo(dmap_ref, hmap_ref, x_hbm, dy_ref, w0_ref, w1_ref,
                       w2_ref, x_vmem, sems, *, td, th, W, ci, interpret):
    """wgrad with the x halo assembled in-kernel (reflect only) — same
    9-clamped-DMA scheme as `conv_block._kernel_halo`."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    off = 8
    for dma in _halo_copies(x_hbm, x_vmem, sems, b, dmap_ref, hmap_ref,
                            i, j, td=td, th=th, w=W, off=off):
        dma.wait()
    x_vmem[:, :, off - 1] = x_vmem[:, :, off]
    x_vmem[:, :, off + W] = x_vmem[:, :, off + W - 1]

    first = (b == 0) & (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        w0_ref[...] = jnp.zeros_like(w0_ref)
        w1_ref[...] = jnp.zeros_like(w1_ref)
        w2_ref[...] = jnp.zeros_like(w2_ref)

    dy = dy_ref[0]
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

    M = td * th * W
    dy2 = dy.reshape(M, dy.shape[-1])
    dn = (((0,), (0,)), ((), ()))
    for w_ref, vws in ((w0_ref, (-1,)), (w1_ref, (0, 1)), (w2_ref, (2,))):
        rows = 4 * len(vws) * ci
        for n, vd in enumerate((-1, 0, 1, 2)):
            part = jax.lax.dot_general(
                chunk(vd, vws).reshape(M, rows), dy2, dn,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(dy2.dtype),
            )
            w_ref[n * rows: (n + 1) * rows] += part


def _kernel_wgrad_halo_wide(dmap_ref, hmap_ref, x_hbm, dy_ref, g1_ref,
                            g2_ref, g3_ref, g4_ref, g5_ref, x_vmem, sems,
                            *, td, th, W, ci, interpret):
    """`_kernel_wgrad_halo` with the wide-assembly LHS grouping (the
    view chunks were 64 thin ci-lane slices; see
    `conv_block._wide_slices`). Output rows are in wide-group order —
    `wgrad_narrow_from_wide_jnp` permutes back."""
    from anatomix_tpu.ops.pallas.conv_block import _wide_slices

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    off = 8
    for dma in _halo_copies(x_hbm, x_vmem, sems, b, dmap_ref, hmap_ref,
                            i, j, td=td, th=th, w=W, off=off):
        dma.wait()
    x_vmem[:, :, off - 1] = x_vmem[:, :, off]
    x_vmem[:, :, off + W] = x_vmem[:, :, off + W - 1]

    first = (b == 0) & (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        for ref in (g1_ref, g2_ref, g3_ref, g4_ref, g5_ref):
            ref[...] = jnp.zeros_like(ref)

    dy = dy_ref[0]
    base = off - 1
    M = td * th * W
    dy2 = dy.reshape(M, dy.shape[-1])
    dn = (((0,), (0,)), ((), ()))
    for slices, g_ref in zip(
        _wide_slices(x_vmem, ci, td, th, W, base),
        (g1_ref, g2_ref, g3_ref, g4_ref, g5_ref),
    ):
        lhs = slices[0] if len(slices) == 1 else jnp.concatenate(
            slices, axis=-1
        )
        part = jax.lax.dot_general(
            lhs.reshape(M, -1), dy2, dn,
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dy2.dtype),
        )
        g_ref[...] += part


def wgrad_narrow_from_wide_jnp(groups, ci: int):
    """Inverse of the wide row regroup: wide-order dW groups (g1..g5)
    -> the narrow (dW0, dW1, dW2) row order `pack_vjp` expects."""
    from anatomix_tpu.ops.pallas.conv_block import _WIDE_GROUPS

    loc = {}
    for gi, entries in enumerate(_WIDE_GROUPS):
        for pos, e in enumerate(entries):
            loc[e] = (gi, pos)

    def rows(vd, vh, vw):
        gi, pos = loc[(vd, vh, vw)]
        return groups[gi][pos * ci: (pos + 1) * ci]

    order = [(vd, vh) for vd in (-1, 0, 1, 2) for vh in (-1, 0, 1, 2)]
    dW0 = jnp.concatenate([rows(vd, vh, -1) for vd, vh in order], axis=0)
    dW1 = jnp.concatenate(
        [rows(vd, vh, vw) for vd, vh in order for vw in (0, 1)], axis=0
    )
    dW2 = jnp.concatenate([rows(vd, vh, 2) for vd, vh in order], axis=0)
    return dW0, dW1, dW2


@functools.partial(jax.jit, static_argnames=("ci", "interpret"))
def _wgrad_halo_wide(x_block, dy_block, *, ci, interpret=False):
    """Wide-assembly wgrad; returns the five wide-order dW groups."""
    B, d, h, w, _ = x_block.shape
    co8 = dy_block.shape[-1]
    off = 8
    Wp = off + w + 1

    acc_bytes = 64 * ci * co8 * 4

    def fits(td, th):
        return (
            5 * td * th * Wp * (8 * ci * 2 * 3 + co8 * 2) + acc_bytes
            <= 40 * 2 ** 20
        )

    td, th = 1, 1
    for cand_td in (8, 4, 2, 1):
        if d % cand_td:
            continue
        for cand_th in (8, 4, 2, 1):
            if h % cand_th:
                continue
            if fits(cand_td, cand_th) and cand_td * cand_th > td * th:
                td, th = cand_td, cand_th

    dmap, hmap = _clamp_maps(d, h, td, th)
    kernel = functools.partial(
        _kernel_wgrad_halo_wide, td=td, th=th, W=w, ci=ci,
        interpret=interpret,
    )
    row_counts = (8 * ci, 8 * ci, 16 * ci, 16 * ci, 16 * ci)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, td, th, w, co8), lambda b, i, j, *_: (b, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (rc, co8), lambda b, i, j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            )
            for rc in row_counts
        ],
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, 8 * ci), x_block.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rc, co8), jnp.float32)
            for rc in row_counts
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d * h * w * 64 * ci * co8,
            bytes_accessed=x_block.nbytes + dy_block.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20
        ),
        interpret=interpret,
    )(dmap, hmap, x_block, dy_block)


@functools.partial(jax.jit, static_argnames=("ci", "interpret"))
def _wgrad_halo(x_block, dy_block, *, ci, interpret=False):
    """dW_packed groups with the x halo assembled in-kernel; x_block is
    the UN-padded (B, d, h, w, 8Ci) forward input (reflect semantics)."""
    B, d, h, w, _ = x_block.shape
    co8 = dy_block.shape[-1]
    off = 8
    Wp = off + w + 1

    acc_bytes = 64 * ci * co8 * 4

    def fits(td, th):
        return (
            5 * td * th * Wp * (8 * ci * 2 * 3 + co8 * 2) + acc_bytes
            <= 40 * 2 ** 20
        )

    td, th = 1, 1
    for cand_td in (8, 4, 2, 1):
        if d % cand_td:
            continue
        for cand_th in (8, 4, 2, 1):
            if h % cand_th:
                continue
            if fits(cand_td, cand_th) and cand_td * cand_th > td * th:
                td, th = cand_td, cand_th

    dmap, hmap = _clamp_maps(d, h, td, th)
    kernel = functools.partial(
        _kernel_wgrad_halo, td=td, th=th, W=w, ci=ci, interpret=interpret
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, td, th, w, co8), lambda b, i, j, *_: (b, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (16 * ci, co8), lambda b, i, j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (32 * ci, co8), lambda b, i, j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (16 * ci, co8), lambda b, i, j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, 8 * ci), x_block.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((16 * ci, co8), jnp.float32),
            jax.ShapeDtypeStruct((32 * ci, co8), jnp.float32),
            jax.ShapeDtypeStruct((16 * ci, co8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d * h * w * 64 * ci * co8,
            bytes_accessed=x_block.nbytes + dy_block.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20
        ),
        interpret=interpret,
    )(dmap, hmap, x_block, dy_block)


@functools.partial(
    jax.jit, static_argnames=("ci", "interpret", "out_w")
)
def _wgrad(x_block_padded, dy_block, *, ci, interpret=False, out_w=None):
    """dW_packed groups for the sparse conv: x (B, d+2, h+2, w+2(+align),
    8Ci) halo'd as in the forward; dy (B, d, h, w, 8Co)."""
    B, dp, hp, wp0, _ = x_block_padded.shape
    d, h = dp - 2, hp - 2
    w = dy_block.shape[3]
    co8 = dy_block.shape[-1]
    if wp0 % 8:
        x_block_padded = jnp.pad(
            x_block_padded, ((0, 0),) * 3 + ((0, (-wp0) % 8), (0, 0))
        )
    Wp = x_block_padded.shape[3]

    # tiles kept deliberately small: the resident f32 dW accumulators own
    # most of the VMEM budget
    acc_bytes = 64 * ci * co8 * 4

    def fits(td, th):
        # the x5 factor covers Mosaic's relayout copies of the per-chunk
        # concat + (M, K) flatten (measured ~5x the nominal tile bytes)
        return (
            5 * td * th * Wp * (8 * ci * 2 * 3 + co8 * 2) + acc_bytes
            <= 40 * 2 ** 20
        )

    td, th = 1, 1
    for cand_td in (8, 4, 2, 1):
        if d % cand_td:
            continue
        for cand_th in (8, 4, 2, 1):
            if h % cand_th:
                continue
            if fits(cand_td, cand_th) and cand_td * cand_th > td * th:
                td, th = cand_td, cand_th

    kernel = functools.partial(
        _kernel_wgrad, td=td, th=th, W=w, ci=ci, interpret=interpret
    )
    return pl.pallas_call(
        kernel,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, td, th, w, co8), lambda b, i, j: (b, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (16 * ci, co8), lambda b, i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (32 * ci, co8), lambda b, i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (16 * ci, co8), lambda b, i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16 * ci, co8), jnp.float32),
            jax.ShapeDtypeStruct((32 * ci, co8), jnp.float32),
            jax.ShapeDtypeStruct((16 * ci, co8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, 8 * ci), x_block_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d * h * w * 64 * ci * co8,
            bytes_accessed=x_block_padded.nbytes + dy_block.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20
        ),
        interpret=interpret,
    )(x_block_padded, dy_block)


# -----------------------------------------------------------------------------
# differentiable op


def _halo_pad(x_block, pad_type, extra=0):
    mode = "edge" if pad_type == "reflect" else "constant"
    k = 1 + extra
    align = (-(x_block.shape[3] + 2 * k)) % 8
    return jnp.pad(
        x_block,
        ((0, 0), (k, k), (k, k), (k, k + align), (0, 0)),
        mode=mode,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def conv_block_sparse_train(
    x_block: jax.Array,   # (B, d, h, w, 8*Ci) block layout
    w: jax.Array,         # DHWIO (3, 3, 3, Ci, Co) traced
    b: jax.Array,         # (Co,)
    act: str = "none",
    pad_type: str = "zeros",
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """'Same'-padded sparse block conv + bias + act, differentiable wrt
    (x_block, w, b). Returns (B, d, h, w, 8*Co) in x_block's dtype."""
    y, _ = _fwd(x_block, w, b, act, pad_type, compute_dtype, interpret)
    return y


def _fwd(x_block, w, b, act, pad_type, compute_dtype, interpret):
    import os

    w0, w1, w2 = pack_sparse_weights_jnp(w.astype(compute_dtype))
    b8 = jnp.tile(b.astype(jnp.float32), 8)[None]
    if (
        pad_type == "reflect"
        and os.environ.get("ANATOMIX_HALO", "1") != "0"
    ):
        from anatomix_tpu.ops.pallas.conv_block import (
            conv_block_sparse_halo,
            conv_block_sparse_halo_wide,
            wide_weights_from_groups_jnp,
        )

        ci = w.shape[3]
        if (
            x_block.shape[3] >= 32
            and os.environ.get("ANATOMIX_WIDE", "1") != "0"
        ):
            g1, g2, g3, g4, g5 = wide_weights_from_groups_jnp(
                w0, w1, w2, ci
            )
            y = conv_block_sparse_halo_wide(
                x_block, g1, g2, g3, g4, g5, b8, act=act,
                out_dtype=x_block.dtype, interpret=interpret,
            )
        else:
            y = conv_block_sparse_halo(
                x_block, w0, w1, w2, b8, act=act,
                out_dtype=x_block.dtype, interpret=interpret,
            )
    else:
        xp = _halo_pad(x_block, pad_type)
        y = conv_block_sparse_valid(
            xp, w0, w1, w2, b8, act=act, out_dtype=x_block.dtype,
            interpret=interpret, out_w=x_block.shape[3],
        )
    return y, (x_block, w, b, y)


def _bwd(act, pad_type, compute_dtype, interpret, res, dy):
    x_block, w, b, y = res
    ci, co = w.shape[3], w.shape[4]
    d, h, wd = x_block.shape[1:4]

    dpre = (dy.astype(jnp.float32) * _act_grad_from_y(y, act)).astype(
        dy.dtype
    )

    # dbias: sum over batch/space, fold the 8 sub-position groups
    db = jnp.sum(dpre.astype(jnp.float32), axis=(0, 1, 2, 3))
    db = db.reshape(8, co).sum(0)

    # dx: 'valid' conv of the 2-zero-padded gradient with the flipped-
    # transposed weights, on a halo-extended extent; the adjoint of the
    # forward's own halo pad (edge for reflect, zero crop otherwise) is
    # jnp.pad's VJP, applied via jax.vjp for exactness.
    wflip = w[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)
    f0, f1, f2 = pack_sparse_weights_jnp(wflip.astype(compute_dtype))
    zb8 = jnp.zeros((1, 8 * ci), jnp.float32)
    # The dx output extents d+2/h+2 (e.g. 66 at the 128-crop config) have
    # no 4/8/16 divisor, so _pick_tile degraded to 2x2 tiles — a
    # 1089-step grid of starved GEMMs (10.4 ms/conv in the round-3 train
    # trace). Zero-pad the extents to a multiple of 8 (zero rows conv to
    # zeros, sliced off below); store bf16 — dx is downcast right after.
    # The W (out_w) extent must ALSO be 8-aligned: Mosaic's in-kernel
    # (td, th, W) -> M flatten of the GEMM LHS is relayout-free only for
    # W % 8 == 0, and out_w = wd+2 = 66 made the dx kernel run ~3.4x
    # slower per row than the fwd halo kernel (wave-22 train trace:
    # 73.5 ms of dx vs 21.9 ms of ALL fwd convs).
    ext_d = -(-(d + 2) // 8) * 8
    ext_h = -(-(h + 2) // 8) * 8
    ext_w = -(-(wd + 2) // 8) * 8
    dpre_p = jnp.pad(
        dpre,
        ((0, 0), (2, 2 + ext_d - (d + 2)), (2, 2 + ext_h - (h + 2)),
         (2, (ext_w + 2 - (wd + 2)) + ((-(ext_w + 2)) % 8)), (0, 0)),
    )
    import os as _os_dx

    if (
        ext_w >= 32
        and _os_dx.environ.get("ANATOMIX_WIDE", "1") != "0"
        and _os_dx.environ.get("ANATOMIX_DX_KERNEL", "0") == "1"
    ):
        # zero halo assembled in-kernel: no HBM-side extended-gradient
        # pad (round 5; gated until the HW probe)
        from anatomix_tpu.ops.pallas.conv_block import (
            conv_block_sparse_dx,
            wide_weights_from_groups_jnp,
        )

        fg = wide_weights_from_groups_jnp(f0, f1, f2, co)
        dx_ext = conv_block_sparse_dx(
            dpre, *fg, zb8, ext=(ext_d, ext_h, ext_w),
            out_dtype=x_block.dtype, interpret=interpret,
        )[:, : d + 2, : h + 2, : wd + 2]
    elif (
        ext_w >= 32
        and _os_dx.environ.get("ANATOMIX_WIDE", "1") != "0"
    ):
        from anatomix_tpu.ops.pallas.conv_block import (
            conv_block_sparse_valid_wide,
            wide_weights_from_groups_jnp,
        )

        fg = wide_weights_from_groups_jnp(f0, f1, f2, co)
        dx_ext = conv_block_sparse_valid_wide(
            dpre_p, *fg, zb8, act="none", out_dtype=x_block.dtype,
            interpret=interpret, out_w=ext_w,
        )[:, : d + 2, : h + 2, : wd + 2]
    else:
        dx_ext = conv_block_sparse_valid(
            dpre_p, f0, f1, f2, zb8, act="none", out_dtype=x_block.dtype,
            interpret=interpret, out_w=ext_w,
        )[:, : d + 2, : h + 2, : wd + 2]
    # (B, d+2, h+2, w+2, 8Ci): gradient wrt the halo-padded forward input
    _, pad_vjp = jax.vjp(lambda v: _halo_pad(v, pad_type), x_block)
    # _halo_pad also adds the w alignment tail; extend dx_ext to match
    tail = _halo_pad(x_block, pad_type).shape[3] - dx_ext.shape[3]
    if tail:
        dx_ext = jnp.pad(dx_ext, ((0, 0),) * 3 + ((0, tail), (0, 0)))
    (dx,) = pad_vjp(dx_ext.astype(x_block.dtype))

    # dw: packed-space gradients contracted by the wgrad kernel, pulled
    # back through the (linear) jnp packer
    import os

    if (
        pad_type == "reflect"
        and os.environ.get("ANATOMIX_HALO", "1") != "0"
    ):
        if (
            wd >= 32
            and os.environ.get("ANATOMIX_WIDE", "1") != "0"
        ):
            groups = _wgrad_halo_wide(
                x_block, dpre, ci=ci, interpret=interpret
            )
            dW0, dW1, dW2 = wgrad_narrow_from_wide_jnp(groups, ci)
        else:
            dW0, dW1, dW2 = _wgrad_halo(
                x_block, dpre, ci=ci, interpret=interpret
            )
    else:
        xp = _halo_pad(x_block, pad_type)
        dW0, dW1, dW2 = _wgrad(
            xp, dpre, ci=ci, interpret=interpret, out_w=wd
        )
    _, pack_vjp = jax.vjp(
        lambda v: pack_sparse_weights_jnp(v.astype(compute_dtype)), w
    )
    (dw,) = pack_vjp(
        (dW0.astype(compute_dtype), dW1.astype(compute_dtype),
         dW2.astype(compute_dtype))
    )

    return dx, dw.astype(w.dtype), db.astype(b.dtype)


conv_block_sparse_train.defvjp(_fwd, _bwd)


# -----------------------------------------------------------------------------
# differentiable reshuffles (pure permutations: each is the other's adjoint)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def space_to_depth_vjp(x, interpret=False):
    return space_to_depth(x, interpret=interpret)


def _s2d_fwd(x, interpret):
    return space_to_depth(x, interpret=interpret), None


def _s2d_bwd(interpret, _, dy):
    return (depth_to_space(dy, interpret=interpret),)


space_to_depth_vjp.defvjp(_s2d_fwd, _s2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def depth_to_space_vjp(y, interpret=False):
    return depth_to_space(y, interpret=interpret)


def _d2s_fwd(y, interpret):
    return depth_to_space(y, interpret=interpret), None


def _d2s_bwd(interpret, _, dx):
    return (space_to_depth(dx, interpret=interpret),)


depth_to_space_vjp.defvjp(_d2s_fwd, _d2s_bwd)


@functools.cache
def _dense_block_map() -> np.ndarray:
    """(27 taps, 27 block-offsets, 8 in-parities, 8 out-parities) binary
    map behind `conv3x3.make_block_weights`, for traced packing."""
    M = np.zeros((27, 27, 8, 8), np.float32)
    for ad in range(2):
        for ah in range(2):
            for aw in range(2):
                a = (ad * 2 + ah) * 2 + aw
                for kd in range(3):
                    for kh in range(3):
                        for kw in range(3):
                            k = (kd * 3 + kh) * 3 + kw
                            vd, vh, vw = ad + kd - 1, ah + kh - 1, aw + kw - 1
                            bidx = (
                                (vd // 2 + 1) * 3 + (vh // 2 + 1)
                            ) * 3 + (vw // 2 + 1)
                            p = ((vd % 2) * 2 + (vh % 2)) * 2 + (vw % 2)
                            M[k, bidx, p, a] += 1.0
    return M


def make_block_weights_jnp(w: jax.Array) -> jax.Array:
    """Traced DHWIO (3,3,3,Ci,Co) -> dense block-space (3,3,3,8Ci,8Co)
    (same layout as `conv3x3.make_block_weights`); linear, so its VJP is
    free from JAX."""
    ci, co = w.shape[3], w.shape[4]
    M = jnp.asarray(_dense_block_map(), w.dtype)
    wb = jnp.einsum("kbpa,kio->bpiao", M, w.reshape(27, ci, co))
    return wb.reshape(3, 3, 3, 8 * ci, 8 * co)


def dense_block_conv_train(
    xb: jax.Array,  # (B, d, h, w, 8*Ci) block layout
    w: jax.Array,   # DHWIO (3, 3, 3, Ci, Co) traced
    b: jax.Array | None,
    *,
    act: str = "none",
    pad_type: str = "zeros",
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Differentiable dense block-space 'same' conv: one XLA conv3d on the
    block grid (8x nominal FLOPs but MXU-rate lanes). For tiny Ci the XLA
    lowering of the full-res conv is a pathological lane-1 loop fusion
    fused with the following norm's statistics — 23 ms of the traced
    pretrain step (entry conv, Ci=1) and 17 ms of the ViT stem. Block
    halo: edge == full-res reflect, zeros == zeros (only |v| <= 2 taps
    are populated, and they never reach full-res offset -2)."""
    from anatomix_tpu.ops.conv import conv3d

    co = w.shape[4]
    wb = make_block_weights_jnp(w.astype(compute_dtype))
    mode = "edge" if pad_type == "reflect" else "constant"
    xp = jnp.pad(
        xb, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode=mode
    )
    b8 = None if b is None else jnp.tile(b, 8)
    yb = conv3d(
        xp, wb, b8, padding="VALID", compute_dtype=compute_dtype
    )
    if act == "relu":
        yb = jnp.maximum(yb, 0)
    elif act == "lrelu":
        yb = jnp.where(yb >= 0, yb, 0.2 * yb)
    elif act != "none":
        raise ValueError(f"unsupported act: {act}")
    del co
    return yb


def conv3x3_block_train(
    x: jax.Array,  # (B, D, H, W, Ci) normal layout, even spatial
    w: jax.Array,
    b: jax.Array | None,
    *,
    act: str = "none",
    pad_type: str = "zeros",
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Normal-layout differentiable dense block conv (s2d -> XLA block
    conv -> d2s) for convs the sparse kernel can't take (Ci < 16)."""
    xb = space_to_depth_vjp(x.astype(compute_dtype), interpret)
    yb = dense_block_conv_train(
        xb, w, b, act=act, pad_type=pad_type, compute_dtype=compute_dtype
    )
    return depth_to_space_vjp(yb, interpret)


def conv3x3_same_train(
    x: jax.Array,  # (B, D, H, W, Ci) normal layout, even spatial
    w: jax.Array,
    b: jax.Array,
    *,
    act: str = "none",
    pad_type: str = "zeros",
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Normal-layout differentiable fused conv(+act): s2d -> sparse kernel
    -> d2s (reshuffles at HBM bandwidth via `reshuffle.py`)."""
    xb = space_to_depth_vjp(x, interpret)
    yb = conv_block_sparse_train(
        xb, w, b, act, pad_type, compute_dtype, interpret
    )
    return depth_to_space_vjp(yb, interpret)
