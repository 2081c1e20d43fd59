"""Whole-level BLOCK-SPACE differentiable UNet forward for pretraining.

The round-3 train path (`unet_apply(conv_impl='pallas_train')`) wraps
every conv in its own s2d -> sparse kernel -> d2s round trip and runs
pools/norms in spatial layout. The wave-35 trace of the 261 ms pretrain
step attributes ~55 ms to exactly that glue: 13.4 ms of per-conv
reshuffles, a 20.2 ms relayout feeding max-pool's select-and-scatter
(T(2,128) layout), 8.7 ms select-and-scatter + 3.8 reduce-window + 2.8
copies for the pool itself, and spatial-layout BN passes.

This module mirrors the fused inference walk (`models/unet_fused.py`):
one `space_to_depth` at entry, consecutive convs chained in block
layout, max-pool as a lane-group reduction (free layout exit), nearest
upsample as a channel tile, skip concat as a lane interleave, batch
norm with lane-group statistics (`ops/norms.batch_norm_train_block`),
and `depth_to_space` only at the NCE tap layers. All ops are
differentiable; conv gradients run the same custom-VJP sparse kernels
as the round-3 path (`ops/pallas/conv_block_train.py`).

Reference semantics: `anatomix/model/network.py:447-548` (forward with
taps at `layer_ids`), torch MaxPool3d's first-argmax backward
(`_max_pool_block`'s custom VJP reproduces the window-scan-order
first-match tie rule).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from anatomix_tpu.models.unet import UnetPlan
from anatomix_tpu.ops.activations import get_activation
from anatomix_tpu.ops.conv import conv3d
from anatomix_tpu.ops.norms import (
    batch_norm_inference_block,
    batch_norm_train_block,
)
from anatomix_tpu.ops.pallas.conv_block_train import (
    conv_block_sparse_train,
    dense_block_conv_train,
    depth_to_space_vjp,
    space_to_depth_vjp,
)


def train_block_eligible(plan: UnetPlan) -> bool:
    """The block walk covers the pretraining backbone family: 3-D, batch
    norm, Max pool, nearest x2 decoders, reflect padding, skip
    connections, no 0.1-residuals, single-channel-ish input."""
    cfg = plan.config
    return (
        cfg.dimension == 3
        and cfg.norm == "batch"
        and cfg.pooling == "Max"
        and cfg.interp == "nearest"
        and cfg.pad_type == "reflect"
        and not cfg.residual_connection
        and cfg.use_skip_connection
        and cfg.input_nc < 16
    )


def _conv_eligible_block(cin: int, cout: int, w_blk: int) -> bool:
    """Sparse train-kernel domain (mirrors `unet._train_conv_eligible`
    plus the Mosaic W%8 flatten rule on the BLOCK extent)."""
    sparse_w = 64 * cin * 8 * cout * 2
    wgrad_acc = 64 * cin * 8 * cout * 4
    return (
        cin % 16 == 0
        and cin >= 16
        and w_blk % 8 == 0
        and sparse_w <= 13 * 2 ** 20
        and wgrad_acc <= 20 * 2 ** 20
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _max_pool_block(xb: jax.Array) -> jax.Array:
    """(B, d, h, w, 8C) block -> (B, d, h, w, C) spatial at half res:
    2^3 pooling windows ARE the s2d blocks, so the pool is a lane-group
    max that exits block layout for free. Implemented as elementwise
    maxima of the 8 LANE SLICES — the (…, 8, C) split view relayouts on
    TPU (14 ms reshape + 14 ms reduce-window in the wave-37 step trace).
    The custom VJP routes each window's gradient to the FIRST maximal
    element in (pd, ph, pw) scan order — torch MaxPool3d's tie rule
    (plain `jnp.max` autodiff splits ties; post-ReLU feature maps tie at
    0.0 constantly)."""
    c = xb.shape[-1] // 8
    y = xb[..., :c]
    for g in range(1, 8):
        y = jnp.maximum(y, xb[..., g * c: (g + 1) * c])
    return y


def _max_pool_block_fwd(xb):
    y = _max_pool_block(xb)
    return y, (xb, y)


def _max_pool_block_bwd(res, dy):
    xb, y = res
    c = xb.shape[-1] // 8
    dy32 = dy.astype(jnp.float32)
    taken = None
    parts = []
    for g in range(8):
        eq = xb[..., g * c: (g + 1) * c] == y
        first = eq if taken is None else (eq & ~taken)
        taken = eq if taken is None else (taken | eq)
        parts.append(jnp.where(first, dy32, 0.0))
    dx = jnp.concatenate(parts, axis=-1)
    return (dx.astype(xb.dtype),)


_max_pool_block.defvjp(_max_pool_block_fwd, _max_pool_block_bwd)


def unet_apply_train_block(
    plan: UnetPlan,
    params: dict[str, Any],
    x: jax.Array,  # (B, D, H, W, C) spatial, even dims
    *,
    layers: Sequence[int],
    compute_dtype=None,
    bn_axis_name: str | None = None,
    eval_norm_layers: Sequence[int] = (),
    interpret: bool = False,
):
    """Train-mode forward; returns `(out, taps, new_stats)` exactly like
    `unet_apply(..., layers=..., train=True)` — taps are the layer
    outputs at `layers` in SPATIAL layout (the patch sampler's index
    space), `new_stats[str(idx)] = (batch_mean, biased_var)` per live
    batch norm."""
    cfg = plan.config
    if not train_block_eligible(plan):
        raise ValueError("plan outside the block train walk's domain")
    cd = compute_dtype or jnp.bfloat16
    act = get_activation(cfg.activation)
    final_act = get_activation(cfg.final_act)
    layers = tuple(layers or ())
    eval_norm_layers = frozenset(eval_norm_layers)

    feat = space_to_depth_vjp(x.astype(cd), interpret)
    in_block = True
    enc_feats: list[jax.Array] = []
    taps: list[jax.Array] = []
    new_stats: dict[str, tuple] = {}

    def to_block(f):
        return space_to_depth_vjp(f, interpret)

    def to_spatial(f):
        return depth_to_space_vjp(f, interpret)

    for idx, spec in enumerate(plan.layers):
        p = params.get(str(idx))
        if spec.kind == "conv":
            if not in_block:
                feat = to_block(feat)
                in_block = True
            cin, cout = spec.in_ch, spec.out_ch
            if cin < 16:
                feat = dense_block_conv_train(
                    feat, p["w"], p.get("b"), pad_type=cfg.pad_type,
                    compute_dtype=cd,
                )
            elif _conv_eligible_block(cin, cout, feat.shape[3]):
                b = p.get("b")
                if b is None:
                    b = jnp.zeros((cout,), jnp.float32)
                feat = conv_block_sparse_train(
                    feat, p["w"], b, "none", cfg.pad_type, cd, interpret
                )
            else:
                # bottleneck/cat shapes outside the sparse kernel's
                # domain (weight pack > VMEM cap or W%8): tiny extents —
                # the spatial round trip is cheap there
                fs = to_spatial(feat)
                fs = conv3d(
                    fs, p["w"], p.get("b"), padding="SAME",
                    pad_type=cfg.pad_type, compute_dtype=cd,
                )
                feat = to_block(fs)
        elif spec.kind == "norm":
            if idx not in eval_norm_layers:
                feat, m, v = batch_norm_train_block(
                    feat, p["mean"], p["var"], p["scale"], p["bias"],
                    eps=cfg.norm_eps, axis_name=bn_axis_name,
                )
                new_stats[str(idx)] = (m, v)
            else:
                feat = batch_norm_inference_block(
                    feat, p["mean"], p["var"], p["scale"], p["bias"],
                    eps=cfg.norm_eps,
                )
        elif spec.kind == "act":
            feat = act(feat)
        elif spec.kind == "final_act":
            feat = final_act(feat)
        elif spec.kind == "pool":
            feat = _max_pool_block(feat)
            in_block = False
        elif spec.kind == "upsample":
            if in_block:
                feat = to_spatial(feat)
            # nearest x2 == sub-position channel broadcast in block space
            feat = jnp.tile(feat, (1, 1, 1, 1, 8))
            in_block = True

        if cfg.use_skip_connection:
            if idx in plan.decoder_idx:
                enc = enc_feats.pop()
                c1 = enc.shape[-1] // 8
                c2 = feat.shape[-1] // 8
                # channel interleave via LANE SLICES (the 6-D split view
                # form relayouts on TPU)
                feat = jnp.concatenate(
                    [
                        t
                        for g in range(8)
                        for t in (
                            enc[..., g * c1: (g + 1) * c1],
                            feat[..., g * c2: (g + 1) * c2],
                        )
                    ],
                    axis=-1,
                )
            if idx in plan.encoder_idx:
                enc_feats.append(feat)

        if idx in layers:
            taps.append(to_spatial(feat) if in_block else feat)

    out = to_spatial(feat) if in_block else feat
    return out, taps, new_stats
