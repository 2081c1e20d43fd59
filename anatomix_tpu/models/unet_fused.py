"""Block-space fused UNet inference (Pallas fast path, v2).

v1 kept only the low-channel levels in block (space-to-depth) layout and
lost ~45 of its 58 ms to layout glue: the three act+repack
`convert_maximum` fusions (8–14 ms each) and separate activation passes
(PERF.md round-1 trace). v2:

* every conv at an even-spatial level with Ci in [8, ~192] runs on the
  sparse block-space kernel (`ops/pallas/conv_block.py` — 2.37x nominal
  FLOPs instead of dense-block's 8x, K split by w-offset group);
* the entry conv (Ci < 8) uses the dense block kernel (1-wide lane slices
  don't tile for the sparse form);
* deep levels (min(Ci, Co) >= 64 with Ci*Co too big for sparse weights in
  VMEM) use the direct lane-padded kernel in normal layout — they are
  reached through pool (which *exits* block layout for free: 2^3 pooling
  windows == s2d blocks) and left through upsample (nearest x2 *enters*
  block layout as a channel tile), so whole-level block residency has no
  mid-level repacks;
* bias + activation run inside every Pallas kernel's epilogue; the act
  layer that follows each conv (reference `network.py:13-124` ConvBlock
  order conv -> norm -> act, norms pre-folded) is consumed at prepack
  time. Encoder skip taps land on act-layer indices, whose values are
  unchanged by the absorption.

Supported configs: batch/none norm (folded at prepack) and instance norm
(live block-aware stats), nearest and trilinear interp, Max/Avg pool,
reflect/zeros padding, no intra-block residuals — i.e. both the flagship
`anatomix` 6M model and the 94M `anatomix-dev` (reference
`network.py:210-548` semantics). Other configs fall back to the standard
XLA path (see `extract.py` routing).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.models.unet import UnetPlan
from anatomix_tpu.ops.activations import get_activation
from anatomix_tpu.ops.conv import conv3d
from anatomix_tpu.ops.pallas.conv3x3 import (
    _conv3x3_valid,
    _depth_to_space,
    _space_to_depth,
    conv3x3_packed,
    prepack_conv,
    space_to_depth_4d,
)
from anatomix_tpu.ops.pallas.conv_block import (
    _apply_act,
    conv_block_sparse,
    conv_block_sparse_cat,
    conv_block_sparse_skip,
    prepack_sparse,
    prepack_sparse_skip,
    sparse_cat_eligible,
)
from anatomix_tpu.ops.pallas.reshuffle import (
    depth_to_space as _d2s_pallas,
    space_to_depth as _s2d_pallas,
)
from anatomix_tpu.ops.norms import (
    _chunk_sum,
    _even_chunk_sizes,
    tiled_instance_norm,
)
from anatomix_tpu.ops.pool import avg_pool, max_pool
from anatomix_tpu.ops.resize import upsample2x, upsample2x_trilinear_block

# activations the Pallas epilogues implement
_EPILOGUE_ACTS = ("relu", "lrelu", "elu", "tanh", "none")

# sparse block weights (64*Ci*8*Co*2 bytes) must fit scoped VMEM next to
# the tiles; 192->64 (12.6 MB) compiles and wins, 128->128 (16.8 MB) won't
_SPARSE_W_BYTES_MAX = 13 * 2 ** 20

# Negative results, kept switchable for re-testing (defaults OFF):
# ENTRY4 — the entry stage as ONE XLA stride-2 4^3 conv emitting the block
# tensor. Wins in isolation (0.093 vs 0.155 ms, tools/_exp_entry.py) but
# in the full graph XLA must deliver the conv output in the pallas
# custom-call's forced default layout: the conv runs 5 ms + a 3.1 ms
# relayout copy vs 1.84 ms for s2d+dense-kernel (device traces, PERF.md).
# EMIT_FULL — final sparse conv stores straight into d2s layout; its
# 2C=32-lane output tile pads to 128 lanes (4x write waste, +0.5 ms) and
# the "free" host-side reshape materializes a 1.29 ms relayout.
import os as _os

_ENTRY4 = _os.environ.get("ANATOMIX_ENTRY4", "0") == "1"
_EMIT_FULL = _os.environ.get("ANATOMIX_EMIT_FULL", "0") == "1"


def entry_block_weights(w: np.ndarray) -> np.ndarray:
    """DHWIO (3,3,3,Ci,Co) -> (4,4,4,Ci,8Co) stride-2 block-conv weights:
    out[i,j,k,(ad,ah,aw)*Co+c] = sum_t W4[t,...]*x[2i+t-1,...], i.e. the
    entry conv and the following space-to-depth in one conv."""
    w = np.asarray(w, np.float32)
    ci, co = w.shape[3], w.shape[4]
    W4 = np.zeros((4, 4, 4, ci, 8 * co), np.float32)
    for ad in range(2):
        for ah in range(2):
            for aw in range(2):
                g = ((ad * 2 + ah) * 2 + aw) * co
                W4[ad:ad + 3, ah:ah + 3, aw:aw + 3, :, g:g + co] += w
    return W4


def supports_fusion(cfg) -> bool:
    """batch/none norms fold into the conv epilogues; instance norms stay
    live as cheap XLA stats+normalize passes between Pallas convs (the
    94M `anatomix-dev` config: instance norm, Avg pool, trilinear)."""
    return (
        cfg.norm in ("batch", "none", "instance", "instance_affine")
        and cfg.interp in ("nearest", "trilinear")
        and cfg.pad_type in ("reflect", "zeros")
        and cfg.pooling in ("Max", "Avg")
        and not cfg.residual_connection
        and cfg.activation in _EPILOGUE_ACTS
        and cfg.final_act in _EPILOGUE_ACTS
    )


def _live_norm(cfg) -> bool:
    return cfg.norm in ("instance", "instance_affine")


def _sparse_w_ok(w_blk: int) -> bool:
    """Trace-time extent guard for the sparse block kernels: Mosaic
    flattens (td, th, W) into the GEMM M dim and needs W % 8 == 0 — at
    W=12 (the 192-chain block extent) the compile dies with `INTERNAL:
    tpu_compile_helper subprocess exit code 1` (the r03 registration
    failure; bisected to the extent-12 sparse conv by
    tools/_probe_reg192.py, wave 25; same constraint as the dx kernel's
    out_w 8-align, commit 00138cc). Prepack routes with roi extents, but
    a trace may run other extents ('full' strategy at arbitrary volume
    sizes), so eligibility is re-checked against the traced shape."""
    return w_blk % 8 == 0


def choose_impl_v2(cin: int, cout: int, spatial, skip_c1: int = 0) -> str:
    """Per-conv kernel routing from measured v5e rates (PERF.md).

    `skip_c1` > 0 marks a decoder conv fed by Upsample + skip-concat whose
    first `skip_c1` input channels come from the encoder tap — those run
    the fused upsample+skip kernel (`conv_block.py`), which never
    materializes the upsampled tensor or the concat."""
    # manual Mosaic DMA needs the block lane dim (8*ci) 128-aligned,
    # hence ci % 16 (ci=8 would DMA 64 lanes)
    even = all(s % 2 == 0 for s in spatial)
    if skip_c1 >= 16 and skip_c1 % 16 == 0 and even:
        c2 = cin - skip_c1
        skip_w = (64 * skip_c1 + 27 * c2) * 8 * cout * 2
        if skip_w <= _SPARSE_W_BYTES_MAX:
            return "sparse_skip"
    sparse_w = 64 * cin * 8 * cout * 2
    if even and cin < 8:
        return "entry4" if _ENTRY4 else "block_dense"
    if even and cin % 16 == 0 and sparse_w <= _SPARSE_W_BYTES_MAX:
        return "sparse"
    direct_w = 9 * -(-cin // 128) * 3 * -(-cout // 128) * 128 * 128 * 2
    if cin >= 64 and cout >= 64 and direct_w <= 12 * 2 ** 20:
        return "direct"
    return "xla"


def _skip_c1(plan: UnetPlan, conv_idx: int) -> int:
    """Encoder-channel count for a decoder conv directly after an
    Upsample + skip-concat; 0 otherwise."""
    if not plan.config.use_skip_connection:
        return 0
    if conv_idx == 0 or plan.layers[conv_idx - 1].kind != "upsample":
        return 0
    if (conv_idx - 1) not in plan.decoder_idx:
        return 0
    for j in range(conv_idx - 2, -1, -1):
        if plan.layers[j].kind == "conv":
            return plan.layers[conv_idx].in_ch - plan.layers[j].out_ch
    return 0


def _following_act(plan: UnetPlan, conv_idx: int):
    """Index and name of the act/final_act that consumes this conv's
    output, skipping folded norms/identities; None if none (including
    when a live instance norm sits between conv and act — the act then
    fuses into the norm's XLA pass instead of the conv epilogue)."""
    live = _live_norm(plan.config)
    for j in range(conv_idx + 1, plan.num_layers):
        kind = plan.layers[j].kind
        if kind == "identity" or (kind == "norm" and not live):
            continue
        if kind == "act":
            return j, plan.config.activation
        if kind == "final_act":
            return j, plan.config.final_act
        return None
    return None


def prepack_fused(plan: UnetPlan, params: dict[str, Any],
                  input_spatial=(128, 128, 128), compute_dtype=jnp.bfloat16,
                  interpret: bool = False) -> dict[str, Any]:
    """Pack each conv for its fused role and absorb the following
    activation into the kernel epilogue. Requires batch norms already
    folded (`extract.fold_batchnorm`)."""
    from anatomix_tpu.extract import layer_spatials

    spatials = layer_spatials(plan, input_spatial)
    new_params = {k: dict(v) for k, v in params.items()}
    consumed_acts: set[int] = set()
    for idx, spec in enumerate(plan.layers):
        if spec.kind != "conv":
            continue
        # the fused upsample+skip kernel's parity-summed small views
        # encode NEAREST x2; trilinear decoders materialize the upsample
        c1 = _skip_c1(plan, idx) if plan.config.interp == "nearest" else 0
        impl = choose_impl_v2(spec.in_ch, spec.out_ch, spatials[idx], c1)
        if impl == "xla":
            continue
        act_info = _following_act(plan, idx)
        act = "none"
        if act_info is not None:
            consumed_acts.add(act_info[0])
            act = act_info[1]
        p = new_params[str(idx)]
        w = np.asarray(p["w"])
        b = np.asarray(p["b"]) if "b" in p else None
        if impl == "entry4":
            co = w.shape[-1]
            b_eff = np.zeros((co,), np.float32) if b is None else b
            p["fused"] = dict(
                w4=jnp.asarray(entry_block_weights(w)).astype(compute_dtype),
                b8=jnp.asarray(np.tile(b_eff, 8).astype(np.float32))[None],
                act=act,
                impl="entry4",
                # block-input alternative for the 4-D (channel-less) entry:
                # the window arrives already in block layout (the sliding
                # path slices packed 4-D windows — see
                # conv3x3.space_to_depth_4d), so entry4's fused
                # spatial-conv+s2d form doesn't apply; same weights packed
                # for the dense block conv instead
                alt_block=dict(
                    prepack_conv(
                        w, b, spatial=spatials[idx], s2d="on", act=act,
                        compute_dtype=compute_dtype, interpret=interpret,
                    ),
                    impl="block_dense",
                ),
            )
        elif impl == "sparse_skip":
            p["fused"] = dict(
                prepack_sparse_skip(
                    w, b, c1=c1, act=act, compute_dtype=compute_dtype
                ),
                impl="sparse_skip",
            )
        elif impl == "sparse":
            # skip-concat convs (trilinear decoders, or nearest ones the
            # fused skip kernel declined) may defer the concat to the
            # two-operand cat kernel — emit its wide pack too
            cat_c1 = _skip_c1(plan, idx)
            p["fused"] = dict(
                prepack_sparse(w, b, act=act, compute_dtype=compute_dtype,
                               cat_c1=cat_c1),
                impl="sparse",
            )
        else:
            p["fused"] = dict(
                prepack_conv(
                    w, b, spatial=spatials[idx],
                    s2d="on" if impl == "block_dense" else "off",
                    act=act, compute_dtype=compute_dtype,
                    interpret=interpret,
                ),
                impl=impl,
            )
    new_params["__consumed_acts__"] = consumed_acts
    return new_params


def _s2d(x, interpret):
    """Spatial -> block. Pallas reshuffle kernel (4 lane slices at HBM
    bandwidth) except for the sub-lane-group channel counts where XLA's
    transpose is no worse (the 1-ch entry volume)."""
    if x.shape[-1] < 8:
        return _space_to_depth(x)
    return _s2d_pallas(x, interpret=interpret)


def _d2s(y, interpret):
    if y.shape[-1] // 8 < 8:
        return _depth_to_space(y)
    import os as _os_d2s

    if (
        _os_d2s.environ.get("ANATOMIX_D2S_EXIT", "plain") == "interleave"
        and y.shape[-1] // 8 <= 32
    ):
        # emit the spatial minor (2w, C) layout in-kernel: the plain
        # form's trailing (w, 2C)->(2w, C) merge is an XLA relayout
        # (reshape 1.34 + copy 0.85 ms of the 15.8 ms 6M fwd, wave-34
        # trace). OPT-IN: the in-kernel (w, 2C)->(2w, C) value reshape
        # is a lane->sublane cast that real Mosaic accepts only for
        # narrow lane counts — 2C=128 (C=64) fails compile
        # ("infer-vector-layout: unsupported shape cast", wave 36);
        # C<=32 is HW-validated by test_d2s_interleave_matches_plain_hw.
        from anatomix_tpu.ops.pallas.reshuffle import (
            depth_to_space_interleave,
        )

        return depth_to_space_interleave(y, interpret=interpret)
    return _d2s_pallas(y, interpret=interpret)


def _conv_block_dense(x_block, packed, pad_type, out_dtype, interpret):
    """Dense block-layout 3^3 conv (entry conv): edge-block halo, lane
    padding, VALID pallas conv."""
    mode = "edge" if pad_type == "reflect" else "constant"
    xp = jnp.pad(
        x_block, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode=mode
    )
    if packed["cin_pad"]:
        xp = jnp.pad(xp, ((0, 0),) * 4 + ((0, packed["cin_pad"]),))
    out = _conv3x3_valid(
        xp, packed["w_packed"], packed["b"], out_dtype=out_dtype,
        interpret=interpret, act=packed.get("act", "none"),
    )
    if out.shape[-1] != packed["c_out_eff"]:
        out = out[..., : packed["c_out_eff"]]
    return out


def _norm_kernel_ok(act_fn, act_name, interpret) -> bool:
    """Route the (tiled) instance-norm apply to the Pallas kernel: the
    act must be representable by NAME (the kernel epilogue), and the
    backend must be TPU (or interpret)."""
    if act_fn is not None and act_name is None:
        return False
    if _os.environ.get("ANATOMIX_NORM_KERNEL", "1") == "0":
        return False
    return jax.default_backend() not in ("cpu",) or interpret


def _fold_affine(mean, var, eps, scale, bias):
    """Per-(tile,)channel f32 affine (a, shift) with y = x*a + shift ==
    (x - mean) * rsqrt(var+eps) * scale + bias (f32 in-kernel compute —
    no Sterbenz form needed)."""
    a = jax.lax.rsqrt(var + eps)
    if scale is not None:
        a = a * scale.astype(jnp.float32)
    sft = -mean * a
    if bias is not None:
        sft = sft + bias.astype(jnp.float32)
    return a, sft


def _instance_norm_any(feat, in_block, *, eps, scale=None, bias=None,
                       act_fn=None, tile_counts=None, act_name=None,
                       interpret=False):
    """Instance norm on either layout; in block layout the per-channel
    stats pool over spatial dims AND the 8 sub-position lane groups (the
    lane-dim split reshape is free in XLA). The following activation, if
    any, rides in the same elementwise pass.

    With `tile_counts`, statistics are computed per spatial tile instead of
    globally (the 'full_tiled' extraction strategy, ops/norms.
    tiled_instance_norm) — block-space tiles correspond 1:1 to full-res
    tiles since s2d halves every spatial dim."""
    if tile_counts is not None and tuple(tile_counts) == (1, 1, 1):
        tile_counts = None
    f32 = feat.astype(jnp.float32)
    if in_block:
        B, d, h, w, c8 = feat.shape
        if tile_counts is None:
            # one-pass moment statistics (see ops/norms.instance_norm),
            # reduced LANE-WISE first — the (…, 8, C) split view is a
            # relayout on TPU (norms reshape+broadcast ~0.9 ms of the
            # ViT fwd, wave-39 trace); folding the 8 sub-position groups
            # happens on the tiny (B, 8C) moment vectors instead
            m_lane = jnp.mean(f32, axis=(1, 2, 3))          # (B, 8C)
            m2_lane = jnp.mean(jnp.square(f32), axis=(1, 2, 3))
            mean = jnp.mean(m_lane.reshape(B, 8, c8 // 8), axis=1)
            m2 = jnp.mean(m2_lane.reshape(B, 8, c8 // 8), axis=1)
            var = jnp.maximum(m2 - jnp.square(mean), 0.0)
            if _norm_kernel_ok(act_fn, act_name, interpret):
                a, sft = _fold_affine(mean, var, eps, scale, bias)
                from anatomix_tpu.ops.pallas.norm_apply import (
                    norm_apply_block,
                )

                t8 = lambda t: jnp.tile(t, (1, 8))[
                    :, None, None, None, :
                ]
                return norm_apply_block(
                    feat, t8(a), t8(sft), act=act_name or "none",
                    interpret=interpret,
                )
            if feat.dtype != jnp.float32:
                # sub-f32 apply (subtract-first Sterbenz form, see
                # ops/norms._bn_train_impl): the f32 materialization of
                # the normalized volume was ~2.2 ms of the dev fwd
                # (wave-45 trace). Per-channel affine folds into (a, b)
                # in f32; the channel-mean's own bf16 quantization folds
                # back into the shift.
                inv = jax.lax.rsqrt(var + eps)
                a = inv
                bsh = jnp.zeros_like(mean)
                if scale is not None:
                    a = a * scale.astype(jnp.float32)
                if bias is not None:
                    bsh = bsh + bias.astype(jnp.float32)
                m_b = mean.astype(feat.dtype)
                bsh = bsh + (m_b.astype(jnp.float32) - mean) * a
                t8 = lambda t: jnp.tile(t, (1, 8))[:, None, None, None, :]
                y = (
                    (feat - t8(m_b)) * t8(a).astype(feat.dtype)
                    + t8(bsh).astype(feat.dtype)
                )
                if act_fn is not None:
                    y = act_fn(y)
                return y.astype(feat.dtype)
            mean8 = jnp.tile(mean, (1, 8))[:, None, None, None, :]
            inv8 = jnp.tile(
                jax.lax.rsqrt(var + eps), (1, 8)
            )[:, None, None, None, :]
        elif all(
            len(set(_even_chunk_sizes(s, n))) == 1
            for s, n in zip((d, h, w), tile_counts)
        ):
            # EVEN tiles (the production 256³/roi-128 case): per-tile
            # stats via free major-dim splits + cast-fused reductions,
            # per-tile affine applied on the same 8-D view. The old
            # path materialized f32 squares (2.1 GB at dev/256³) and
            # broadcast stats back with jnp.repeat -> while-loops +
            # dynamic-update-slices — ~400 ms of the 735 ms full_tiled
            # trace (wave 47).
            t0, t1, t2 = tile_counts
            d0, h0, w0 = d // t0, h // t1, w // t2
            c = c8 // 8
            v = feat.reshape(B, t0, d0, t1, h0, t2, w0, c8)
            cnt = jnp.float32(d0 * h0 * w0 * 8)
            s1 = jnp.sum(
                v, axis=(2, 4, 6), dtype=jnp.float32
            )  # (B, t0, t1, t2, 8C)
            # bf16 squares, f32 accumulation: the f32 cast of the
            # full volume materialized (31 ms of the 448 ms full_tiled
            # trace, wave 48); E[x^2] rel error ~2^-8 is far below the
            # bf16 conv noise (cosine unchanged at 4 decimals, wave 50)
            s2 = jnp.sum(jnp.square(v), axis=(2, 4, 6),
                         dtype=jnp.float32)
            sh = (B, t0, t1, t2, 8, c)
            mean = jnp.sum(s1.reshape(sh), axis=4) / cnt
            m2 = jnp.sum(s2.reshape(sh), axis=4) / cnt
            var = jnp.maximum(m2 - jnp.square(mean), 0.0)
            if _norm_kernel_ok(act_fn, act_name, interpret):
                a, sft = _fold_affine(mean, var, eps, scale, bias)
                from anatomix_tpu.ops.pallas.norm_apply import (
                    norm_apply_block,
                )

                tile8 = lambda t: jnp.tile(t, (1, 1, 1, 1, 8))
                return norm_apply_block(
                    feat, tile8(a), tile8(sft),
                    tile_counts=tuple(tile_counts),
                    act=act_name or "none", interpret=interpret,
                )
            a = jax.lax.rsqrt(var + eps)
            bsh = jnp.zeros_like(mean)
            if scale is not None:
                a = a * scale.astype(jnp.float32)
            if bias is not None:
                bsh = bsh + bias.astype(jnp.float32)
            if feat.dtype == jnp.float32:
                m_b = mean
            else:
                m_b = mean.astype(feat.dtype).astype(jnp.float32)
                bsh = bsh + (m_b - mean) * a
                m_b = m_b.astype(feat.dtype)

            def bc(t):  # (B,t0,t1,t2,C) -> broadcastable over the view
                t8 = jnp.tile(t, (1, 1, 1, 1, 8))
                return t8[:, :, None, :, None, :, None, :]

            y = (
                (v - bc(m_b).astype(v.dtype)).astype(jnp.float32)
                * bc(a)
                + bc(bsh)
            )
            if act_fn is not None:
                y = act_fn(y)
            return y.reshape(feat.shape).astype(feat.dtype)
        else:
            g = f32.reshape(B, d, h, w, 8, c8 // 8)
            sizes = [
                _even_chunk_sizes(s, n)
                for s, n in zip((d, h, w), tile_counts)
            ]
            s1, s2 = g, jnp.square(g)
            for ax, sz in zip((1, 2, 3), sizes):
                s1 = _chunk_sum(s1, ax, sz)
                s2 = _chunk_sum(s2, ax, sz)
            s1 = jnp.sum(s1, axis=4)  # pool the 8 sub-position groups
            s2 = jnp.sum(s2, axis=4)
            counts = 8.0 * (
                np.array(sizes[0], np.float32)[:, None, None]
                * np.array(sizes[1], np.float32)[None, :, None]
                * np.array(sizes[2], np.float32)[None, None, :]
            )[None, ..., None]
            mean = s1 / counts
            var = jnp.maximum(s2 / counts - jnp.square(mean), 0.0)
            inv = jax.lax.rsqrt(var + eps)
            for ax, (s, sz) in enumerate(zip((d, h, w), sizes), start=1):
                reps = np.array(sz)
                mean = jnp.repeat(mean, reps, axis=ax,
                                  total_repeat_length=s)
                inv = jnp.repeat(inv, reps, axis=ax, total_repeat_length=s)
            mean8 = jnp.tile(mean, (1, 1, 1, 1, 8))
            inv8 = jnp.tile(inv, (1, 1, 1, 1, 8))
        y = (f32 - mean8) * inv8
        if scale is not None:
            y = y * jnp.tile(scale.astype(jnp.float32), 8)
        if bias is not None:
            y = y + jnp.tile(bias.astype(jnp.float32), 8)
    elif tile_counts is not None:
        y = tiled_instance_norm(
            feat, tile_counts, eps=eps, scale=scale, bias=bias
        ).astype(jnp.float32)
    else:
        mean = jnp.mean(f32, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(f32 - mean), axis=(1, 2, 3),
                       keepdims=True)
        y = (f32 - mean) * jax.lax.rsqrt(var + eps)
        if scale is not None:
            y = y * scale.astype(jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
    if act_fn is not None:
        y = act_fn(y)
    return y.astype(feat.dtype)


def unet_apply_fused(
    plan: UnetPlan,
    params: dict[str, Any],
    x: jax.Array,  # (B, D, H, W, C), spatial divisible by 2^num_downs
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    in_tile_counts: tuple[int, int, int] | None = None,
    emit: str = "spatial",
) -> jax.Array:
    """Inference forward in whole-level block-space layout. Params must
    come from `prepack_fused` on BN-folded weights (batch norm) or raw
    weights (live instance norms). `in_tile_counts` switches live instance
    norms to per-spatial-tile statistics (the 'full_tiled' strategy).

    `emit='fold'` returns the output as folded flat-lane rows
    (B, D, H, W*C/128, 128) — the exact form the sliding-window scatter
    kernel consumes — produced straight from block space by
    `reshuffle.depth_to_space_fold` with zero XLA relayouts (caller must
    guarantee (W*C) %% 128 == 0, see
    `sliding_window.scatter_kernel_eligible`)."""
    cfg = plan.config
    if not supports_fusion(cfg):
        raise ValueError("config not supported by the fused path")
    act = get_activation(cfg.activation)
    final_act = get_activation(cfg.final_act)
    consumed = params.get("__consumed_acts__", set())
    norm_consumed: set[int] = set()  # acts folded into live-norm passes

    # tail conv: the last conv with only folded/consumed layers after it
    # can store straight into depth-to-space layout (fuses the exit d2s)
    tail_conv = None
    if _EMIT_FULL:
        for t in range(plan.num_layers - 1, -1, -1):
            kind = plan.layers[t].kind
            if kind == "conv":
                tail_conv = t
                break
            if kind == "identity" or (
                kind in ("act", "final_act") and t in consumed
            ):
                continue
            break

    if x.ndim == 4:
        # channel-less (B, D, H, W) volume (input_nc == 1): enter block
        # space straight from the packed 4-D form — avoids ever
        # materializing the 128x-lane-padded (…, W, 1) tensor (see
        # conv3x3.space_to_depth_4d). The entry conv then runs its
        # block-input alternative pack.
        if cfg.input_nc != 1:
            raise ValueError("4-D input requires input_nc == 1")
        import os as _os2

        on_tpu = jax.default_backend() not in ("cpu",) or interpret
        if on_tpu and _os2.environ.get("ANATOMIX_S2D_C1", "0") == "1":
            # opt-in only: the kernel's minor-split reshape is an
            # unsupported Mosaic shape cast on real HW (wave-28 probe);
            # the XLA form's 64x-lane-padded (…, 2) intermediate costs
            # ~1.2 ms per 128³ entry (wave-27 trace)
            from anatomix_tpu.ops.pallas.reshuffle import space_to_depth_c1

            feat = space_to_depth_c1(
                x.astype(compute_dtype), interpret=interpret
            )
        else:
            feat = space_to_depth_4d(x.astype(compute_dtype))
        in_block = True
    else:
        feat = x.astype(compute_dtype)
        in_block = False
    enc_feats: list[tuple[jax.Array, bool]] = []
    exit_conv = max(
        (i for i, s in enumerate(plan.layers) if s.kind == "conv"),
        default=-1,
    )

    def conv_impl_at(idx):
        p = params.get(str(idx), {})
        return p["fused"]["impl"] if "fused" in p else "xla"

    def next_conv_impl(idx):
        for j in range(idx + 1, plan.num_layers):
            if plan.layers[j].kind == "conv":
                return conv_impl_at(j)
        return "xla"

    for idx, spec in enumerate(plan.layers):
        p = params.get(str(idx))
        if spec.kind == "conv":
            packed = p.get("fused") if p else None
            impl = packed["impl"] if packed else "xla"
            # extent guard (see _sparse_w_ok): demote to a plain XLA conv
            # (+ the act absorbed at prepack) when this trace's block-w
            # extent is outside the sparse kernel's shape domain
            if impl == "sparse":
                if isinstance(feat, tuple) and feat[0] == "cat_pair":
                    pass  # eligibility (incl. extent) checked at concat
                else:
                    w_blk = (
                        feat.shape[3] if in_block else feat.shape[3] // 2
                    )
                    if not _sparse_w_ok(w_blk):
                        impl = "demoted"
            elif impl == "sparse_skip" and not (
                isinstance(feat, tuple) and feat[0] == "skip_pair"
            ):
                # the upsample branch declined the pair (extent guard);
                # the upsampled+concat'd input arrives in spatial layout
                impl = "demoted"
            if impl == "demoted":
                if in_block:
                    feat = _d2s(feat, interpret)
                    in_block = False
                feat = conv3d(
                    feat, p["w"], p.get("b"), padding="SAME",
                    pad_type=cfg.pad_type, compute_dtype=compute_dtype,
                )
                feat = _apply_act(feat, packed["act"]).astype(compute_dtype)
            elif impl == "sparse_skip":
                _, enc, small = feat
                feat = conv_block_sparse_skip(
                    enc, small, packed, pad_type=cfg.pad_type,
                    interpret=interpret,
                )
                in_block = True
            elif impl == "entry4" and in_block:
                # 4-D entry: the input is already block layout; run the
                # dense block-input pack of the same entry conv
                feat = _conv_block_dense(
                    feat, packed["alt_block"], cfg.pad_type, compute_dtype,
                    interpret,
                )
            elif impl == "entry4":
                # entry conv + space-to-depth as ONE stride-2 4^3 XLA conv
                mode = "reflect" if cfg.pad_type == "reflect" else "constant"
                xp = jnp.pad(
                    feat, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                    mode=mode,
                )
                z = jax.lax.conv_general_dilated(
                    xp.astype(compute_dtype), packed["w4"],
                    window_strides=(2, 2, 2), padding="VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32,
                )
                z = z + packed["b8"][0]
                feat = _apply_act(z, packed["act"]).astype(compute_dtype)
                in_block = True
            elif impl in ("sparse", "block_dense"):
                if impl == "sparse" and isinstance(feat, tuple):
                    # deferred skip concat: the two block operands feed
                    # the GEMM directly (no interleave materialization)
                    _, enc_c, up_c = feat
                    feat = conv_block_sparse_cat(
                        enc_c, up_c, packed, interpret=interpret,
                        out_dtype=(
                            jnp.float32
                            if emit == "fold" and idx == exit_conv
                            else None
                        ),
                    )
                    in_block = True
                    # (cat pairs are never the tail conv — concat site
                    # declines when idx == tail_conv)
                elif impl == "sparse":
                    if not in_block:
                        feat = _s2d(feat, interpret)
                        in_block = True
                    # fold exits consume f32 (Mosaic strided loads are
                    # 32-bit-only): the tail conv stores its f32
                    # accumulator directly instead of a bf16 round trip
                    # + standalone cast pass
                    feat = conv_block_sparse(
                        feat, packed, pad_type=cfg.pad_type,
                        interpret=interpret, emit_full=idx == tail_conv,
                        out_dtype=(
                            jnp.float32
                            if emit == "fold" and idx == exit_conv
                            else None
                        ),
                    )
                    if idx == tail_conv:
                        in_block = False
                else:
                    if not in_block:
                        feat = _s2d(feat, interpret)
                        in_block = True
                    feat = _conv_block_dense(
                        feat, packed, cfg.pad_type, compute_dtype,
                        interpret,
                    )
            else:
                if in_block:
                    feat = _d2s(feat, interpret)
                    in_block = False
                if packed is not None:  # 'direct'
                    feat = conv3x3_packed(
                        feat, packed, pad_type=cfg.pad_type,
                        compute_dtype=compute_dtype, interpret=interpret,
                    )
                else:
                    feat = conv3d(
                        feat, p["w"], p.get("b"), padding="SAME",
                        pad_type=cfg.pad_type, compute_dtype=compute_dtype,
                    )
        elif spec.kind == "norm":
            # live instance norm (batch norms are folded to 'identity');
            # a directly-following activation rides the normalize pass
            # (the standalone act was ~2.8 ms of the 94M dev fwd @128³,
            # wave-33 trace)
            act_here = None
            act_here_name = None
            if idx + 1 < plan.num_layers and (idx + 1) not in consumed:
                nkind = plan.layers[idx + 1].kind
                if nkind == "act":
                    act_here = act
                    act_here_name = cfg.activation
                elif nkind == "final_act":
                    act_here = final_act
                    act_here_name = cfg.final_act
            if act_here is not None:
                norm_consumed.add(idx + 1)
            feat = _instance_norm_any(
                feat, in_block, eps=cfg.norm_eps,
                scale=p.get("scale") if p else None,
                bias=p.get("bias") if p else None,
                act_fn=act_here,
                act_name=(
                    act_here_name
                    if act_here_name in _EPILOGUE_ACTS
                    else None
                ),
                interpret=interpret,
                tile_counts=in_tile_counts,
            )
        elif spec.kind == "act":
            if idx not in consumed and idx not in norm_consumed:
                feat = act(feat)
        elif spec.kind == "final_act":
            if idx not in consumed and idx not in norm_consumed:
                feat = final_act(feat)
        elif spec.kind == "pool":
            if in_block:
                # 2^3 pooling windows == s2d blocks: a per-block channel-
                # group reduction that exits block layout for free.
                # LANE-SLICE form: the (…, 8, C) split view relayouts on
                # TPU (~2.1 ms of the dev fwd, wave-40 trace)
                c = feat.shape[-1] // 8
                if cfg.pooling == "Max":
                    acc = feat[..., :c]
                    for gi in range(1, 8):
                        acc = jnp.maximum(
                            acc, feat[..., gi * c: (gi + 1) * c]
                        )
                    feat = acc
                else:
                    acc = feat[..., :c].astype(jnp.float32)
                    for gi in range(1, 8):
                        acc = acc + feat[
                            ..., gi * c: (gi + 1) * c
                        ].astype(jnp.float32)
                    feat = (acc * 0.125).astype(feat.dtype)
                in_block = False
            else:
                feat = (
                    max_pool(feat, 2)
                    if cfg.pooling == "Max"
                    else avg_pool(feat, 2)
                )
        elif spec.kind == "upsample":
            nxt = next_conv_impl(idx)
            if nxt == "sparse_skip":
                # extent guard: the fused skip kernel's W is the small
                # (pre-upsample) spatial extent; decline the pair when it
                # is outside the kernel's domain (the conv then demotes)
                ws = 2 * feat.shape[3] if in_block else feat.shape[3]
                if not _sparse_w_ok(ws):
                    nxt = "xla"
            if nxt == "sparse_skip":
                # the fused kernel consumes (encoder block, pre-upsample
                # small) directly; nothing is materialized here
                small = _d2s(feat, interpret) if in_block else feat
                enc, enc_block = enc_feats.pop()
                if not enc_block:
                    enc = _s2d(enc, interpret)
                feat = ("skip_pair", enc, small)
                in_block = True
            else:
                if in_block:
                    feat = _d2s(feat, interpret)
                    in_block = False
                if nxt in ("sparse", "block_dense"):
                    if cfg.interp == "nearest":
                        # nearest x2 == block broadcast: channels tiled
                        # sub-position-major
                        feat = jnp.tile(feat, (1, 1, 1, 1, 8))
                    else:
                        # trilinear x2 emitted straight into block
                        # layout: 8 separable stencils of the small
                        # tensor — no 8x spatial tensor, no s2d relayout
                        import os as _os_tri

                        if _os_tri.environ.get(
                            "ANATOMIX_TRILIN_KERNEL", "1"
                        ) != "0" and (
                            jax.default_backend() != "cpu" or interpret
                        ):
                            # one-pass Pallas form (clamped-DMA halo ==
                            # torch boundary clamp); the XLA flat form's
                            # 8 stencil fusions + concat were ~6.1 ms of
                            # the dev fwd (wave-37 trace)
                            from anatomix_tpu.ops.pallas.upsample import (
                                upsample2x_trilinear_block_pallas,
                            )

                            feat = upsample2x_trilinear_block_pallas(
                                feat, interpret=interpret
                            )
                        else:
                            feat = upsample2x_trilinear_block(feat)
                    in_block = True
                else:
                    feat = upsample2x(feat, cfg.interp)
        # 'identity' (folded norm) falls through

        if cfg.use_skip_connection:
            if idx in plan.decoder_idx and not (
                isinstance(feat, tuple) and feat[0] == "skip_pair"
            ):
                enc, enc_block = enc_feats.pop()
                if enc_block != in_block:
                    enc = (
                        _s2d(enc, interpret) if in_block
                        else _d2s(enc, interpret)
                    )
                if in_block:
                    B, d, h, w, c1 = enc.shape
                    c2 = feat.shape[-1]
                    nxt_j = next(
                        (
                            j
                            for j in range(idx + 1, plan.num_layers)
                            if plan.layers[j].kind == "conv"
                        ),
                        None,
                    )
                    import os as _os3

                    if (
                        nxt_j == idx + 1  # conv consumes the concat next
                        and nxt_j != tail_conv
                        and conv_impl_at(nxt_j) == "sparse"
                        and sparse_cat_eligible(
                            c1 // 8, c2 // 8, w, cfg.pad_type,
                            co=plan.layers[nxt_j].out_ch,
                        )
                        # HW-validated at the dev cat-eligible decoder
                        # shapes (wave-34 probe: bit-exact, faster);
                        # ANATOMIX_CAT_KERNEL=0 restores the
                        # materialized-concat path for A/B
                        and _os3.environ.get("ANATOMIX_CAT_KERNEL", "1")
                        != "0"
                    ):
                        # defer: the sparse kernel consumes both block
                        # operands; the channel interleave (two 6-D
                        # reshapes + concat, ~7.5 ms of the 94M dev fwd,
                        # wave-33 trace) is never materialized
                        feat = ("cat_pair", enc, feat)
                    else:
                        feat = jnp.concatenate(
                            [
                                enc.reshape(B, d, h, w, 8, c1 // 8),
                                feat.reshape(B, d, h, w, 8, c2 // 8),
                            ],
                            axis=-1,
                        ).reshape(B, d, h, w, c1 + c2)
                else:
                    feat = jnp.concatenate([enc, feat], axis=-1)
            if idx in plan.encoder_idx:
                enc_feats.append((feat, in_block))

    if emit == "fold":
        from anatomix_tpu.ops.pallas.reshuffle import (
            depth_to_space_fold,
            fold_supported,
        )

        if in_block and feat.shape[-1] // 8 >= 8 and fold_supported(
            feat.shape[-1] // 8, feat.shape[3]
        ):
            # windows travel to the stitcher in compute dtype (the
            # scatter kernel blends in f32 regardless); the f32 input
            # here comes straight from the exit conv's accumulator
            return depth_to_space_fold(
                feat, out_dtype=compute_dtype, interpret=interpret
            )
        if in_block:
            feat = _d2s(feat, interpret)
        B_, D_, H_, W_, C_ = feat.shape
        return feat.reshape(B_, D_, H_, (W_ * C_) // 128, 128)
    if in_block:
        feat = _d2s(feat, interpret)
    return feat
