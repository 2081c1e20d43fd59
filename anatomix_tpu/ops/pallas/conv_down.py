"""Pallas TPU kernel: stride-2 3x3x3 conv consumed and produced without
leaving block space (the ViT tokenizer's downsample convs).

The round-3 ViT trace showed the tokenizer's stage boundaries dominating
the forward: each stage did depth_to_space (a 3.2 ms relayout reshape at
128**3 — any XLA op consuming a Pallas output at this scale pays a forced
layout copy) followed by an XLA stride-2 conv running at ~7 TF/s in the
Pallas-dictated layout (fusion.835, 4.0 ms for 29 GF).

This kernel reads the block tensor directly. The key observation: the
stride-2 output grid has exactly the shape of the input BLOCK grid, so
with the output laid out DENSE on that grid every output voxel o reads
input blocks o-1 and o per axis — unit-stride views, no sub-position
packing, and therefore *1.0x nominal FLOPs* (the stride-1 sparse kernel
pays 2.37x):

    output o reads full-res positions 2o + {-1, 0, 1}
                 = (block o-1, parity 1), (block o, parity 0/1)

Per axis that is 3 views indexed by tap k in {0, 1, 2} with block offset
m = (k-1+1)//2 - ... simply m in {-1, 0, 0} and parity k % ... see
_OFFD/_PARD; view k equals conv tap k, so the GEMM weights are a pure
reshape of the DHWIO tensor: W0 = w[:, :, :1] rows (9*Ci, Co) for the
w-axis views at sublane offset 0, W1 = w[:, :, 1:] rows (18*Ci, Co) at
sublane offset +1 (Mosaic concatenate requires equal sublane offsets per
group, so the two w-offsets get separate GEMMs accumulated in f32).

'SAME' stride-2 padding pads one voxel on each side at full-res but the
right pad is never read (max read = 2(d-1)+1), so the halo is a LEFT-only
zero block assembled in-kernel: 4 clamped-source DMAs (core + d/h strips
+ corner, scalar-prefetch index maps) with a 0/1 validity multiply on
boundary tiles, and the w halo column zero-filled in VMEM (DMA
destinations must be sublane-tile-aligned, so the interior lands at
column 8 and the halo at column 7 — tools/_exp_dmaoff.py).

Reference semantics: PatchEmbed_deeper's strided downsample convs
(`anatomix/model/vit3d/deep_tokenizer.py:12-69`, conv stride 2 padding 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anatomix_tpu.ops.pallas.conv_block import (
    _VMEM_LIMIT,
    _apply_act,
    _dot_precision,
)

# per-axis view k in {0,1,2} (== conv tap k): tile block offset (halo'd,
# left halo at 0) and sub-position parity (lane-group component)
_OFFD = (0, 1, 1)  # 1 + m, m in {-1, 0, 0}
_PARD = (1, 0, 1)  # full-res parity of 2o + k - 1


def pack_down2_weights(w: np.ndarray):
    """DHWIO (3,3,3,Ci,Co) -> (W0 (9*Ci, Co) kw=0 rows, W1 (18*Ci, Co)
    kw in {1,2} rows), both (kd, kh, kw)-major channel-minor."""
    w = np.asarray(w)
    ci, co = w.shape[3], w.shape[4]
    w0 = w[:, :, :1].reshape(9 * ci, co)
    w1 = w[:, :, 1:].reshape(18 * ci, co)
    return w0, w1


def _kernel_down(dmap_ref, hmap_ref, x_hbm, w0_ref, w1_ref, b_ref,
                 out_ref, x_vmem, sems, *, td, th, W, ci, act):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    off = 8  # DMA destinations must land on a sublane-tile boundary

    d0, dhalo, dval = dmap_ref[i, 0], dmap_ref[i, 1], dmap_ref[i, 2]
    h0, hhalo, hval = hmap_ref[j, 0], hmap_ref[j, 1], hmap_ref[j, 2]
    dst_w = pl.ds(off, W)
    pieces = (
        ((pl.ds(d0, td), pl.ds(h0, th)), (pl.ds(1, td), pl.ds(1, th))),
        ((pl.ds(dhalo, 1), pl.ds(h0, th)), (pl.ds(0, 1), pl.ds(1, th))),
        ((pl.ds(d0, td), pl.ds(hhalo, 1)), (pl.ds(1, td), pl.ds(0, 1))),
        ((pl.ds(dhalo, 1), pl.ds(hhalo, 1)), (pl.ds(0, 1), pl.ds(0, 1))),
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
    for dma in dmas:
        dma.wait()
    # boundary tiles: the clamped halo source re-read row 0 — zero it
    # (stride-2 'SAME' pads with zeros at full-res position -1)
    x_vmem[0] = x_vmem[0] * dval.astype(x_vmem.dtype)
    x_vmem[:, 0] = x_vmem[:, 0] * hval.astype(x_vmem.dtype)
    # w-axis left halo: always in-tile (w untiled), always zero
    x_vmem[:, :, off - 1] = jnp.zeros_like(x_vmem[:, :, off - 1])

    base = off - 1

    def chunk(kws):
        views = []
        for kd in range(3):
            for kh in range(3):
                for kw in kws:
                    g = ((_PARD[kd] * 2 + _PARD[kh]) * 2
                         + _PARD[kw]) * ci
                    views.append(
                        x_vmem[
                            _OFFD[kd]: _OFFD[kd] + td,
                            _OFFD[kh]: _OFFD[kh] + th,
                            base + _OFFD[kw]: base + _OFFD[kw] + W,
                            g: g + ci,
                        ]
                    )
        return jnp.concatenate(views, axis=-1)

    dn = (((3,), (0,)), ((), ()))
    acc = None
    for w_ref, kws in ((w1_ref, (1, 2)), (w0_ref, (0,))):
        z = jax.lax.dot_general(
            chunk(kws), w_ref[...], dn,
            preferred_element_type=jnp.float32,
            precision=_dot_precision(x_vmem.dtype),
        )
        acc = z if acc is None else acc + z
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


def _clamp_maps_left(d, h, td, th):
    """Per-tile (core start, clamped left-halo source row, validity)."""
    di = np.arange(d // td, dtype=np.int32) * td
    dmap = np.stack(
        [di, np.maximum(di - 1, 0), (di > 0).astype(np.int32)], axis=1
    )
    hj = np.arange(h // th, dtype=np.int32) * th
    hmap = np.stack(
        [hj, np.maximum(hj - 1, 0), (hj > 0).astype(np.int32)], axis=1
    )
    return jnp.asarray(dmap), jnp.asarray(hmap)


def _pick_tile_down(d, h, Wp, ci, co, itemsize=2,
                    vmem_budget=24 * 2 ** 20):
    w_bytes = 27 * ci * co * itemsize

    def cost(td, th):
        x_tile = (td + 1) * (th + 1) * Wp * 8 * ci * itemsize
        xs = 27 * td * th * Wp * ci * itemsize
        z = 2 * td * th * Wp * co * 4
        out = td * th * Wp * co * itemsize
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
    jax.jit, static_argnames=("act", "out_dtype", "interpret")
)
def conv_down2_block(
    x_block: jax.Array,  # (B, d, h, w, 8*Ci) block layout, un-halo'd
    w0: jax.Array,       # (9*Ci, Co) — kw = 0 rows
    w1: jax.Array,       # (18*Ci, Co) — kw in {1, 2} rows
    bias: jax.Array,     # (1, Co) f32
    *,
    act: str = "none",
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Stride-2 'SAME' 3^3 conv of the full-res volume the block tensor
    represents; returns the DENSE output (B, d, h, w, Co) — the stride-2
    grid coincides with the input block grid."""
    B, d, h, w, c8 = x_block.shape
    ci = c8 // 8
    co = w0.shape[-1]
    off = 8
    Wp = off + w

    td, th = _pick_tile_down(
        d, h, Wp, ci, co, itemsize=x_block.dtype.itemsize
    )
    dmap, hmap = _clamp_maps_left(d, h, td, th)
    kernel = functools.partial(
        _kernel_down, td=td, th=th, W=w, ci=ci, act=act
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, d // td, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, td, th, w, co), lambda b, i, j, *_: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((td + 1, th + 1, Wp, c8), x_block.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, co), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d * h * w * 27 * ci * co,
            bytes_accessed=x_block.nbytes,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dmap, hmap, x_block, w0, w1, bias)
