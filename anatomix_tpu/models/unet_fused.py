"""Block-space fused UNet inference (Pallas fast path, round-1 v1).

The per-conv space-to-depth repack (`ops/pallas/conv3x3.py`) wins ~1.5–10×
per op but loses end-to-end to the s2d/d2s transposes between consecutive
low-channel layers (PERF.md). This module keeps whole resolution levels in
block (space-to-depth) layout:

* entry: ONE s2d of the (cheap, 1-channel) input;
* convs with block-packed weights run directly on block tensors — the
  'same-reflect' halo in block space is an edge-block copy (the only
  halo voxels with nonzero block weights are exactly the reflected ones);
* MaxPool/AvgPool(2) in block space is a per-block channel-group reduction
  (2³ pooling windows == s2d blocks) and *exits* block layout for free;
* nearest Upsample(2) from normal layout is a channel broadcast and
  *enters* block layout for free;
* skip concats interleave per sub-position with two reshapes;
* exit: ONE d2s of the final feature map.

Supported configs: batch/none norm (folded), nearest interp, Max/Avg pool,
reflect/zeros padding, no intra-block residuals — i.e. the flagship
`anatomix` 6M model. Other configs fall back to the standard paths.
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
    prepack_conv,
)
from anatomix_tpu.ops.pool import avg_pool, max_pool
from anatomix_tpu.ops.resize import upsample2x


def supports_fusion(cfg) -> bool:
    return (
        cfg.norm in ("batch", "none")
        and cfg.interp == "nearest"
        and cfg.pad_type in ("reflect", "zeros")
        and cfg.pooling in ("Max", "Avg")
        and not cfg.residual_connection
    )


def prepack_fused(plan: UnetPlan, params: dict[str, Any],
                  input_spatial=(128, 128, 128), compute_dtype=jnp.bfloat16,
                  interpret: bool = False) -> dict[str, Any]:
    """Pack each conv for its fused role (block weights where the per-layer
    policy picks s2d, lane-padded direct weights for deep layers, raw for
    XLA layers). Requires batch norms already folded."""
    from anatomix_tpu.extract import layer_spatials
    from anatomix_tpu.ops.pallas.conv3x3 import choose_impl

    spatials = layer_spatials(plan, input_spatial)
    new_params = {k: dict(v) for k, v in params.items()}
    for idx, spec in enumerate(plan.layers):
        if spec.kind != "conv":
            continue
        impl = choose_impl(spec.in_ch, spec.out_ch, spatials[idx])
        if impl == "xla":
            continue
        p = new_params[str(idx)]
        p["pallas"] = prepack_conv(
            np.asarray(p["w"]),
            np.asarray(p["b"]) if "b" in p else None,
            spatial=spatials[idx],
            s2d="on" if impl == "pallas_s2d" else "off",
            compute_dtype=compute_dtype,
            interpret=interpret,
        )
    return new_params


def _conv_block_space(x_block, packed, pad_type, out_dtype, interpret):
    """Block-layout 3³ conv: edge-block halo (== reflect at full res; zeros
    for zero padding), lane padding, VALID pallas conv."""
    mode = "edge" if pad_type == "reflect" else "constant"
    xp = jnp.pad(
        x_block, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode=mode
    )
    if packed["cin_pad"]:
        xp = jnp.pad(xp, ((0, 0),) * 4 + ((0, packed["cin_pad"]),))
    out = jax.vmap(
        lambda v: _conv3x3_valid(
            v, packed["w_packed"], packed["b"], out_dtype=out_dtype,
            interpret=interpret,
        )
    )(xp)
    if out.shape[-1] != packed["c_out_eff"]:
        out = out[..., : packed["c_out_eff"]]
    return out


def unet_apply_fused(
    plan: UnetPlan,
    params: dict[str, Any],
    x: jax.Array,  # (B, D, H, W, C), spatial even
    *,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Inference forward in fused block-space layout. Params must come from
    `prepack_fused` on BN-folded weights."""
    cfg = plan.config
    if not supports_fusion(cfg):
        raise ValueError("config not supported by the fused path")
    act = get_activation(cfg.activation)

    feat = x.astype(compute_dtype)
    in_block = False
    enc_feats: list[tuple[jax.Array, bool]] = []

    def next_conv_fused(idx):
        for j in range(idx + 1, plan.num_layers):
            if plan.layers[j].kind == "conv":
                p = params.get(str(j), {})
                return "pallas" in p and p["pallas"]["use_s2d"]
        return False

    def to_block(v):
        return _space_to_depth(v)

    def to_normal(v):
        return _depth_to_space(v)

    for idx, spec in enumerate(plan.layers):
        p = params.get(str(idx))
        if spec.kind == "conv":
            packed = p.get("pallas") if p else None
            if packed is not None and packed["use_s2d"]:
                if not in_block:
                    feat = to_block(feat)
                    in_block = True
                feat = _conv_block_space(
                    feat, packed, cfg.pad_type, compute_dtype, interpret
                )
            else:
                if in_block:
                    feat = to_normal(feat)
                    in_block = False
                if packed is not None:
                    from anatomix_tpu.ops.pallas.conv3x3 import (
                        conv3x3_packed,
                    )

                    feat = conv3x3_packed(
                        feat, packed, pad_type=cfg.pad_type,
                        compute_dtype=compute_dtype, interpret=interpret,
                    )
                else:
                    feat = conv3d(
                        feat, p["w"], p.get("b"), padding="SAME",
                        pad_type=cfg.pad_type, compute_dtype=compute_dtype,
                    )
        elif spec.kind == "act":
            feat = act(feat)
        elif spec.kind == "pool":
            if in_block:
                B, d, h, w, c8 = feat.shape
                grouped = feat.reshape(B, d, h, w, 8, c8 // 8)
                feat = (
                    jnp.max(grouped, axis=-2)
                    if cfg.pooling == "Max"
                    else jnp.mean(
                        grouped.astype(jnp.float32), axis=-2
                    ).astype(feat.dtype)
                )
                in_block = False
            else:
                feat = (
                    max_pool(feat, 2)
                    if cfg.pooling == "Max"
                    else avg_pool(feat, 2)
                )
        elif spec.kind == "upsample":
            if in_block:
                feat = to_normal(feat)
                in_block = False
            if next_conv_fused(idx):
                # nearest ×2 == block broadcast: channels tiled a-major
                feat = jnp.tile(feat, (1, 1, 1, 1, 8))
                in_block = True
            else:
                feat = upsample2x(feat, "nearest")
        # 'identity' (folded norm) and 'final_act' (none) fall through

        if cfg.use_skip_connection:
            if idx in plan.decoder_idx:
                enc, enc_block = enc_feats.pop()
                if enc_block != in_block:
                    enc = to_block(enc) if in_block else to_normal(enc)
                if in_block:
                    B, d, h, w, c1 = enc.shape
                    c2 = feat.shape[-1]
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

    if in_block:
        feat = to_normal(feat)
    return feat
