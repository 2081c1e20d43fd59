"""Pallas TPU kernel: fused 3×3×3 'same' convolution (NDHWC).

Why: XLA's 3D conv lowering on v5e delivers ~3–9 real TF/s on the anatomix
UNet's shapes, while a Mosaic GEMM sustains ~38 TF/s. This kernel computes
the conv as ONE tile-local GEMM — the halo'd input tile is DMA'd from HBM
once, the 9 (dz, dy) taps are concatenated on the (lane-aligned) channel
axis into K = 9·C, the 3 dx taps are packed into N = 3·Cout, and the dx
shifts are resolved with cheap sublane rolls of the product. No im2col ever
touches HBM.

Low-channel layers (the MXU-starved C=16 half of the UNet's FLOPs) are
repacked with *overlapped space-to-depth*: a stride-1 3³ conv (Ci → Co)
becomes a block-space 3³ conv (8Ci → 8Co) on the half-resolution grid —
full 128-lane matmuls at 8× nominal FLOPs, a measured ~1.5× net win at
C=16 and the only formulation that keeps the MXU busy there.

Per-layer policy (`choose_impl`), from measured rates:
  * Cin·Cout ≤ 768 and even spatial  -> 'pallas_s2d'
  * Cin ≥ 64 and Cout ≥ 64           -> 'pallas_direct' (channels padded to
                                        the 128-lane tile)
  * otherwise                        -> 'xla' (mid-width layers where the
                                        8× s2d overhead loses)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anatomix_tpu.ops.pallas.conv_block import _apply_act


def _conv_kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, sem, *, td, th, W,
                 cout, cin, act="none"):
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
    Wp = x_vmem.shape[2]

    # K = 9·C: the (dz, dy) taps concatenated on the channel axis, sliced
    # back from the DMA-padded lane count to the true cin (the GEMM must
    # not carry the zero rows — 16x FLOPs waste on the entry conv).
    xs_cat = jnp.concatenate(
        [
            x_vmem[dz: dz + td, dy: dy + th, :, :cin]
            for dz in range(3)
            for dy in range(3)
        ],
        axis=-1,
    )
    # N = 3·Cout: all dx taps in one GEMM.
    z = jax.lax.dot_general(
        xs_cat,
        w_ref[...],
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = z[:, :, :W, :cout]
    acc = acc + pltpu.roll(
        z[..., cout: 2 * cout], Wp - 1, 2
    )[:, :, :W, :]
    acc = acc + pltpu.roll(z[..., 2 * cout:], Wp - 2, 2)[:, :, :W, :]
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


def _conv_kernel_interpret(x_hbm, w_ref, b_ref, out_ref, x_vmem, sem, *,
                           td, th, W, cout, cin, act="none"):
    """Interpreter-friendly variant (pltpu.roll unsupported off-TPU):
    same math via lax slices."""
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
    xs_cat = jnp.concatenate(
        [
            x_vmem[dz: dz + td, dy: dy + th, :, :cin]
            for dz in range(3)
            for dy in range(3)
        ],
        axis=-1,
    )
    z = jax.lax.dot_general(
        xs_cat,
        w_ref[...],
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = z[:, :, 0:W, :cout]
    acc = acc + z[:, :, 1: 1 + W, cout: 2 * cout]
    acc = acc + z[:, :, 2: 2 + W, 2 * cout:]
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


def _pick_tile(D, H, Wp, cin, cout, cin_dma=None, itemsize=2,
               vmem_budget=11 * 2 ** 20):
    """Largest (td, th) dividing (D, H) whose working set fits VMEM.
    `cin` is the GEMM K channel count; `cin_dma` the (lane-padded) count
    actually DMA'd."""
    cin_dma = cin if cin_dma is None else cin_dma

    def cost(td, th):
        x_tile = (td + 2) * (th + 2) * Wp * cin_dma * itemsize
        xs_cat = td * th * Wp * 9 * cin * itemsize
        z = td * th * Wp * 3 * cout * 4
        out = td * th * (Wp - 8 if Wp % 8 == 0 else Wp - 2) * cout * itemsize
        w = 9 * cin * 3 * cout * itemsize
        return x_tile + xs_cat + z + out + w

    best = (1, 1)
    for td in (16, 8, 4, 2, 1):
        if D % td:
            continue
        for th in (16, 8, 4, 2, 1):
            if H % th:
                continue
            if cost(td, th) <= vmem_budget and td * th > best[0] * best[1]:
                best = (td, th)
    return best


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                              "act"))
def _conv3x3_valid(x_padded, w_packed, bias, *, out_dtype=jnp.bfloat16,
                   interpret=False, act="none"):
    """x_padded (B, D+2, H+2, W+2(+align), Cin) -> (B, D, H, W, Cout).
    w_packed (9·Cin, 3·Cout) (dz,dy)-major K, dx-major N; bias (1, Cout).
    Batch is a grid dimension (vmap cannot batch pl.ANY manual-DMA
    inputs)."""
    B, Dp, Hp, Wp0, cin_dma = x_padded.shape
    D, H, W = Dp - 2, Hp - 2, Wp0 - 2
    cout = w_packed.shape[-1] // 3
    cin = w_packed.shape[0] // 9  # true GEMM K channels (≤ cin_dma)

    # Mosaic DMA slices need the sublane (W) dim 8-aligned.
    w_align = (-Wp0) % 8
    if w_align:
        x_padded = jnp.pad(
            x_padded, ((0, 0),) * 3 + ((0, w_align), (0, 0))
        )
    Wp = x_padded.shape[3]

    td, th = _pick_tile(D, H, Wp, cin, cout, cin_dma=cin_dma,
                        itemsize=x_padded.dtype.itemsize)
    body = _conv_kernel_interpret if interpret else _conv_kernel
    kernel = functools.partial(body, td=td, th=th, W=W, cout=cout, cin=cin,
                               act=act)
    flops = 2 * B * D * H * W * cin * cout * 27
    return pl.pallas_call(
        kernel,
        grid=(B, D // td, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, td, th, W, cout), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, cin_dma), x_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x_padded.nbytes, transcendentals=0
        ),
        interpret=interpret,
    )(x_padded, w_packed, bias)


# -----------------------------------------------------------------------------
# weight packing

def pack_weights(w: np.ndarray) -> np.ndarray:
    """DHWIO (3,3,3,Ci,Co) -> GEMM form (9·Ci, 3·Co): K is (dz,dy)-major
    channel-minor, N is dx-major."""
    w = np.asarray(w)
    ci, co = w.shape[3], w.shape[4]
    packed = np.zeros((9, ci, 3, co), w.dtype)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                packed[dz * 3 + dy, :, dx, :] = w[dz, dy, dx]
    return packed.reshape(9 * ci, 3 * co)


def make_block_weights(w) -> np.ndarray:
    """DHWIO (3,3,3,Ci,Co) -> dense block-space DHWIO (3,3,3,8Ci,8Co).

    Output voxel 2i+a with tap offset k-1 reads input 2(i+b-1)+a' where,
    per axis, v = a+k-1, b = v//2+1, a' = v mod 2.
    """
    w = np.asarray(w)
    ci, co = w.shape[3], w.shape[4]
    Wb = np.zeros((3, 3, 3, 2, 2, 2, ci, 2, 2, 2, co), w.dtype)
    for ad in range(2):
        for ah in range(2):
            for aw in range(2):
                for kd in range(3):
                    for kh in range(3):
                        for kw in range(3):
                            vd, vh, vw = ad + kd - 1, ah + kh - 1, aw + kw - 1
                            bd, bh, bw = vd // 2 + 1, vh // 2 + 1, vw // 2 + 1
                            Wb[bd, bh, bw, vd % 2, vh % 2, vw % 2, :,
                               ad, ah, aw, :] += w[kd, kh, kw]
    return Wb.reshape(3, 3, 3, 8 * ci, 8 * co)


def _s2d_onehot_kernel(C: int, dtype):
    """(2,2,2,C,8C) one-hot kernel whose stride-2 conv IS space_to_depth
    ((ad, ah, aw)-major channel order)."""
    k = np.zeros((2, 2, 2, C, 8 * C), np.float32)
    for ad in range(2):
        for ah in range(2):
            for aw in range(2):
                p = (ad * 2 + ah) * 2 + aw
                for c in range(C):
                    k[ad, ah, aw, c, p * C + c] = 1.0
    return jnp.asarray(k, dtype)


def _space_to_depth(x):
    import os as _os_s2d

    B, D, H, W, C = x.shape
    if (
        C == 1
        and _os_s2d.environ.get("ANATOMIX_S2D_CONV", "0") == "1"
        and jax.default_backend() not in ("cpu",)
    ):
        # one-hot stride-2 conv: the MXU does the repack (the
        # reshape/transpose form is a ~1.1 ms relayout at 128-cube,
        # wave-40 trace; exactness: 0/1 weights are exact in bf16)
        return jax.lax.conv_general_dilated(
            x, _s2d_onehot_kernel(C, x.dtype), window_strides=(2, 2, 2),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    y = x.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2, C)
    y = y.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return y.reshape(B, D // 2, H // 2, W // 2, 8 * C)


def _depth_to_space(y):
    B, d, h, w, C8 = y.shape
    C = C8 // 8
    z = y.reshape(B, d, h, w, 2, 2, 2, C)
    z = z.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return z.reshape(B, 2 * d, 2 * h, 2 * w, C)


def space_to_depth_4d(x4):
    """Channel-less (B, D, H, W) volume -> block layout (B, d, h, w, 8),
    same (ad, ah, aw)-major lane order as `_space_to_depth` at C=1.

    The 4-D form exists because a (…, W, C=1) tensor is physically
    lane-padded 128x under the TPU's T(8,128) tiling (a 256³ f32 volume
    occupies ~8.6 GB of HBM); the 4-D view tiles (H, W) instead — zero
    padding — so per-window dynamic slices in the sliding path read 8 MB
    instead of ~1 GB (XLA only, no Pallas needed: the source is packed)."""
    import os as _os_s2d4

    B, D, H, W = x4.shape
    if (
        _os_s2d4.environ.get("ANATOMIX_S2D_CONV", "0") == "1"
        and jax.default_backend() not in ("cpu",)
    ):
        return jax.lax.conv_general_dilated(
            x4[..., None], _s2d_onehot_kernel(1, x4.dtype),
            window_strides=(2, 2, 2), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    y = x4.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2)
    y = y.transpose(0, 1, 3, 5, 2, 4, 6)
    return y.reshape(B, D // 2, H // 2, W // 2, 8)


_PAD_MODES = {"reflect": "reflect", "replicate": "edge", "zeros": "constant"}


def choose_impl(cin: int, cout: int, spatial) -> str:
    even = all(s % 2 == 0 for s in spatial)
    if cin * cout <= 768 and even:
        return "pallas_s2d"
    if cin >= 64 and cout >= 64:
        return "pallas_direct"
    return "xla"


def prepack_conv(
    w,  # DHWIO (3, 3, 3, Cin, Cout) — concrete array (numpy-packed once)
    b=None,
    *,
    spatial=None,
    s2d: str = "auto",
    act: str = "none",
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> dict:
    """Eagerly repack conv weights for the Pallas kernel (host numpy; do
    this ONCE per model, outside jit — under jit closure arrays are
    tracers)."""
    w = np.asarray(w, np.float32)
    Cin, Cout = w.shape[3], w.shape[4]
    b = np.zeros((Cout,), np.float32) if b is None else np.asarray(
        b, np.float32
    )
    use_s2d = s2d == "on" or (
        s2d == "auto"
        and choose_impl(Cin, Cout, spatial or (2, 2, 2)) == "pallas_s2d"
    )
    if use_s2d:
        w_eff = make_block_weights(w)
        b_eff = np.tile(b, 8)
    else:
        w_eff, b_eff = w, b
    c_out_eff = w_eff.shape[-1]
    # cin_pad pads only the DMA'd tensor (minor dim % 128): the kernel
    # slices the VMEM tile back, so the GEMM weights carry no zero K rows
    cin_pad = (-w_eff.shape[-2]) % 128 if not interpret else 0
    cout_pad = (-c_out_eff) % 128 if not interpret else 0
    if cout_pad:
        w_eff = np.pad(w_eff, ((0, 0),) * 4 + ((0, cout_pad),))
        b_eff = np.pad(b_eff, (0, cout_pad))
    return {
        "w_packed": jnp.asarray(pack_weights(w_eff)).astype(compute_dtype),
        "b": jnp.asarray(b_eff)[None],
        "act": act,
        "use_s2d": use_s2d,
        "cin_pad": cin_pad,
        "c_out_eff": c_out_eff,
        "cout": Cout,
    }


def conv3x3_packed(
    x: jax.Array,  # (B, D, H, W, Cin)
    packed: dict,
    *,
    pad_type: str = "zeros",
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Apply a `prepack_conv`-packed 3³ conv (pure JAX; jit-safe)."""
    out_dtype = x.dtype
    mode = _PAD_MODES[pad_type]
    if packed["use_s2d"]:
        xp = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode=mode
        )
        # one more (zero-weighted) voxel for block alignment
        xp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        xs = _space_to_depth(xp.astype(compute_dtype))
    else:
        xs = jnp.pad(
            x.astype(compute_dtype),
            ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode=mode,
        )
    if packed["cin_pad"]:
        xs = jnp.pad(xs, ((0, 0),) * 4 + ((0, packed["cin_pad"]),))

    out = _conv3x3_valid(
        xs, packed["w_packed"], packed["b"], out_dtype=out_dtype,
        interpret=interpret, act=packed.get("act", "none"),
    )
    n_eff = packed["c_out_eff"]
    if out.shape[-1] != n_eff:
        out = out[..., :n_eff]
    return _depth_to_space(out) if packed["use_s2d"] else out


def conv3x3_same(
    x: jax.Array,  # (B, D, H, W, Cin)
    w: jax.Array,  # DHWIO (3, 3, 3, Cin, Cout) — must be concrete
    b: jax.Array | None = None,
    *,
    pad_type: str = "zeros",
    compute_dtype=jnp.bfloat16,
    s2d: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Fast path for `conv3d(..., padding='SAME')` with 3³ kernels.

    Convenience wrapper = `prepack_conv` + `conv3x3_packed`; weights must be
    concrete (eager or closed-over constants packed before tracing). Inside
    jit, prepack once and call `conv3x3_packed`.
    """
    packed = prepack_conv(
        w, b, spatial=x.shape[1:4], s2d=s2d, compute_dtype=compute_dtype,
        interpret=interpret,
    )
    return conv3x3_packed(
        x, packed, pad_type=pad_type, compute_dtype=compute_dtype,
        interpret=interpret,
    )
