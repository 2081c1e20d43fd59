"""Primus/PrimusV2: EVA-style 3D ViT with conv tokenizer + patch decoder.

Functional JAX reconstruction of the reference's `anatomix-dev-vit` model
(`/root/reference/anatomix/model/load_from_hf.py:25-35` config;
`anatomix/model/vit3d/architectures.py` wrapper). The transformer follows
the EVA-02 design the upstream Primus builds on: pre-norm blocks with
separate q/k/v projections (k without bias), optional per-head QK LayerNorm
(the anatomix extension, `architectures.py:108-115`), 3-axis axial rotary
position embeddings on non-register tokens, learned absolute position
embeddings, LayerScale (init 0.1), optional inner attention norm
(`scale_attn_inner`), SwiGLU MLP, register tokens re-initialized to
`register_init_std` (`architectures.py:117-120`), and configurable output
volume normalization (`build_out_norm`, `architectures.py:55-86`).

NOTE ON PARITY: the upstream `dynamic-network-architectures` source and the
pretrained `.pth` are not available in this environment, so this is a
faithful-by-design reconstruction of the documented architecture (EVA-02
block + PatchEmbed_deeper tokenizer + transposed-conv decoder) with the
exact registry configuration surface; the checkpoint converter maps the
upstream key layout best-effort and hard-fails on unknown keys.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.ops.conv import conv3d
from anatomix_tpu.ops.norms import (
    channel_demean,
    channel_layer_norm,
    instance_norm,
)

PRIMUS_CONFIGS = {
    "S": {"eva_depth": 12, "eva_numheads": 6, "embed_dim": 396},
    "B": {"eva_depth": 12, "eva_numheads": 12, "embed_dim": 792},
    "M": {"eva_depth": 16, "eva_numheads": 12, "embed_dim": 864},
    "L": {"eva_depth": 24, "eva_numheads": 16, "embed_dim": 1056},
}


@dataclasses.dataclass(frozen=True)
class PrimusConfig:
    input_channels: int = 1
    num_classes: int = 32
    embed_dim: int = 396
    eva_depth: int = 12
    eva_numheads: int = 6
    patch_embed_size: tuple = (8, 8, 8)
    input_shape: tuple = (128, 128, 128)
    num_register_tokens: int = 8
    init_values: float | None = 0.1
    scale_attn_inner: bool = False
    qk_norm: bool = False
    out_norm: str = "none"
    out_norm_eps: float = 1e-5
    register_init_std: float = 1e-6
    in_eps: float = 1e-5  # tokenizer InstanceNorm eps (V2)
    mlp_ratio: float = 4 * 2 / 3  # EVA-02 SwiGLU ratio
    use_rot_pos_emb: bool = True
    use_abs_pos_embed: bool = True
    version: str = "v2"  # 'v1' single-conv patch embed; 'v2' deep tokenizer
    tokenizer_base_features: int = 32
    tokenizer_depth_per_level: tuple = (1, 1, 1)
    rope_theta: float = 100.0

    @property
    def grid_shape(self):
        return tuple(
            s // p for s, p in zip(self.input_shape, self.patch_embed_size)
        )

    @property
    def num_tokens(self):
        g = self.grid_shape
        return g[0] * g[1] * g[2]

    @property
    def head_dim(self):
        return self.embed_dim // self.eva_numheads

    @property
    def mlp_hidden(self):
        return int(self.embed_dim * self.mlp_ratio)


def build_out_norm(mode, eps: float):
    """Output-volume normalization factory (`architectures.py:55-86`)."""
    if isinstance(mode, bool):
        mode = "instance" if mode else "none"
    mode = (mode or "none").lower()
    if mode in ("none", "identity", "off"):
        return lambda x: x
    if mode in ("instance", "instancenorm", "in"):
        return lambda x: instance_norm(x, eps=eps)
    if mode in ("demean", "center"):
        return channel_demean
    if mode in ("layernorm", "layer", "ln"):
        return lambda x: channel_layer_norm(x, eps=eps)
    raise ValueError(f"unsupported output normalization: {mode!r}")


# -----------------------------------------------------------------------------
# Init

def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def _linear(key, fan_in, fan_out, bias=True, std=0.02):
    kw, _ = jax.random.split(key)
    p = {"w": _trunc_normal(kw, (fan_in, fan_out), std)}
    if bias:
        p["b"] = jnp.zeros((fan_out,))
    return p


def _ln(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _conv_p(key, shape, bias=True):
    fan_in = shape[0] * shape[1] * shape[2] * shape[3]
    std = math.sqrt(2.0 / fan_in)
    p = {"w": jax.random.normal(key, shape) * std}
    if bias:
        p["b"] = jnp.zeros((shape[-1],))
    return p


def init_primus_params(cfg: PrimusConfig, key: jax.Array) -> dict[str, Any]:
    keys = iter(jax.random.split(key, 64 + 16 * cfg.eva_depth))

    params: dict[str, Any] = {}

    # ---- tokenizer -----------------------------------------------------------
    if cfg.version == "v2":
        base = cfg.tokenizer_base_features
        tok: dict[str, Any] = {
            "stem": _conv_p(next(keys), (3, 3, 3, cfg.input_channels, base)),
        }
        ch = base
        stages = []
        for level, depth in enumerate(cfg.tokenizer_depth_per_level):
            out_ch = min(ch * 2, cfg.embed_dim)
            stage = {
                "down": _conv_p(next(keys), (3, 3, 3, ch, out_ch)),
                "blocks": [
                    {
                        "conv1": _conv_p(
                            next(keys), (3, 3, 3, out_ch, out_ch)
                        ),
                        "conv2": _conv_p(
                            next(keys), (3, 3, 3, out_ch, out_ch)
                        ),
                    }
                    for _ in range(depth)
                ],
            }
            stages.append(stage)
            ch = out_ch
        tok["stages"] = stages
        tok["proj"] = _conv_p(next(keys), (1, 1, 1, ch, cfg.embed_dim))
        params["tokenizer"] = tok
    else:  # v1: single strided conv patch embed + token LayerNorm
        p = cfg.patch_embed_size
        params["tokenizer"] = {
            "proj": _conv_p(
                next(keys),
                (p[0], p[1], p[2], cfg.input_channels, cfg.embed_dim),
            ),
            "norm": _ln(cfg.embed_dim),
        }

    # ---- embeddings ----------------------------------------------------------
    if cfg.use_abs_pos_embed:
        params["pos_embed"] = _trunc_normal(
            next(keys), (cfg.num_tokens, cfg.embed_dim), 0.02
        )
    if cfg.num_register_tokens > 0:
        params["register_tokens"] = (
            jax.random.normal(
                next(keys), (cfg.num_register_tokens, cfg.embed_dim)
            )
            * cfg.register_init_std
        )

    # ---- EVA blocks -----------------------------------------------------------
    d = cfg.embed_dim
    blocks = []
    for _ in range(cfg.eva_depth):
        block = {
            "norm1": _ln(d),
            "q_proj": _linear(next(keys), d, d, bias=True),
            "k_proj": _linear(next(keys), d, d, bias=False),
            "v_proj": _linear(next(keys), d, d, bias=True),
            "proj": _linear(next(keys), d, d, bias=True),
            "norm2": _ln(d),
            # SwiGLU: hidden = silu(x@w1) * (x@w2); out = hidden @ w3
            "mlp_w1": _linear(next(keys), d, cfg.mlp_hidden, bias=True),
            "mlp_w2": _linear(next(keys), d, cfg.mlp_hidden, bias=True),
            "mlp_w3": _linear(next(keys), cfg.mlp_hidden, d, bias=True),
        }
        if cfg.qk_norm:
            block["q_norm"] = _ln(cfg.head_dim)
            block["k_norm"] = _ln(cfg.head_dim)
        if cfg.scale_attn_inner:
            block["attn_inner_norm"] = _ln(d)
        if cfg.init_values is not None:
            block["gamma1"] = jnp.full((d,), cfg.init_values)
            block["gamma2"] = jnp.full((d,), cfg.init_values)
        blocks.append(block)
    params["blocks"] = blocks
    params["norm"] = _ln(d)

    # ---- decoder: 3 transposed-conv ×2 stages to invert the 8³ patch ----------
    n_up = int(round(math.log2(cfg.patch_embed_size[0])))
    dec = []
    ch = d
    for i in range(n_up):
        out_ch = cfg.num_classes if i == n_up - 1 else max(ch // 2, 32)
        dec.append(_conv_p(next(keys), (2, 2, 2, ch, out_ch)))  # DHWIO
        ch = out_ch
    params["decoder"] = dec
    return params


def primus_param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in
               jax.tree_util.tree_leaves(params))


# -----------------------------------------------------------------------------
# Forward pieces

def _layer_norm(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _apply_linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _rope_tables(cfg: PrimusConfig):
    """Axial 3-D rotary tables (cos, sin) of shape (N, head_dim//2)."""
    hd = cfg.head_dim
    per_axis = (hd // 2) // 3  # rotary pairs per axis
    g = cfg.grid_shape
    coords = np.stack(
        np.meshgrid(
            np.arange(g[0]), np.arange(g[1]), np.arange(g[2]), indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 3)
    freqs = cfg.rope_theta ** (
        -np.arange(per_axis, dtype=np.float64) / max(per_axis, 1)
    )
    angle_list = []
    for axis in range(3):
        angle_list.append(coords[:, axis: axis + 1] * freqs[None, :])
    angles = np.concatenate(angle_list, axis=1)  # (N, 3*per_axis)
    pad = hd // 2 - angles.shape[1]
    if pad > 0:
        angles = np.concatenate(
            [angles, np.zeros((angles.shape[0], pad))], axis=1
        )
    return (
        jnp.asarray(np.cos(angles), jnp.float32),
        jnp.asarray(np.sin(angles), jnp.float32),
    )


def _apply_rope(x, cos, sin):
    """x (..., N, head_dim); rotate interleaved pairs."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    out = jnp.stack([r1, r2], axis=-1)
    return out.reshape(x.shape)


def _apply_rope_half(x, cos, sin):
    """Rotate-half form: x's rotation pairs live at (i, i + hd//2) instead
    of (2i, 2i+1) — contiguous half-slices replace the stride-2
    deinterleave + interleave relayouts of `_apply_rope`. Exact same math
    when q/k channels are pre-permuted (see `_rope_half_perm`): the attention
    scores q·k are invariant to any fixed channel permutation applied to
    both."""
    hd = x.shape[-1]
    x1 = x[..., : hd // 2]
    x2 = x[..., hd // 2:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )


def _rope_half_perm(hd: int) -> np.ndarray:
    """Channel permutation mapping rotate-half layout to interleaved:
    new channel i reads old channel perm[i]."""
    half = hd // 2
    perm = np.empty((hd,), np.int32)
    perm[:half] = 2 * np.arange(half)
    perm[half:] = 2 * np.arange(half) + 1
    return perm


def _flash_attention(q, k, v, scale: float):
    """(B, H, N, hd) x3 -> (B, H, N, hd) via the stock TPU flash kernel."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, N, hd = q.shape
    # Default 1408 from the wave-25/26 HW sweep (tools/_exp_flashblk.py):
    # at the production shape (N=4104 -> Np=4224) per-attn is 0.170 ms vs
    # 0.426 at 384 — bigger blocks win at this tiny N until the kernel
    # vmem-OOMs (4224 single-block needs a 22.8M scoped stack > 16M).
    # End-to-end: ViT sliding 256³ 9.43 s -> 7.64 s (wave-26 C1).
    # Override via env for sweeps. TRACE-TIME ONLY: the value is baked
    # into the jit cache — two runs in one process with different env
    # values keep the first trace.
    import os

    _raw = os.environ.get("ANATOMIX_FLASH_BLK", "1408")
    try:
        parts = [int(p) for p in _raw.split(",")]
        if len(parts) == 1:
            # single-value form: kv blocks are lane-tiled (multiple of
            # 128), so round blk_k up rather than rejecting legacy
            # values like '64' (ADVICE r4 #2)
            blk_q = parts[0]
            blk_k = max(128, -(-parts[0] // 128) * 128)
        elif len(parts) == 2:
            blk_q, blk_k = parts  # rectangular: 'block_q,block_k'
        else:
            raise ValueError(_raw)
    except ValueError as e:
        raise ValueError(
            f"ANATOMIX_FLASH_BLK={_raw!r}: need 'blk' or 'blk_q,blk_k' "
            "integers"
        ) from e
    if not (8 <= blk_q <= 8192) or blk_q % 8 or not (
            128 <= blk_k <= 8192) or blk_k % 128:
        raise ValueError(
            f"ANATOMIX_FLASH_BLK={_raw!r} out of range: block_q must be a "
            "multiple of 8 in [8, 8192] and block_k a multiple of 128 in "
            "[128, 8192] (kv blocks are lane-tiled)"
        )
    # the padded sequence must tile by BOTH block sizes
    Np = -(-N // blk_q) * blk_q
    while Np % blk_k:
        Np += blk_q
    hdp = max(128, -(-hd // 128) * 128)
    pad = ((0, 0), (0, 0), (0, Np - N), (0, hdp - hd))
    qf, kf, vf = (jnp.pad(t, pad) for t in (q, k, v))
    seg = jnp.broadcast_to(
        (jnp.arange(Np) < N).astype(jnp.int32)[None], (B, Np)
    )
    sizes = BlockSizes(
        block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
        block_q_major_dkv=blk_q, block_k_major_dkv=blk_k, block_k_dkv=blk_k,
        block_q_dkv=blk_q, block_k_major_dq=blk_k, block_k_dq=blk_k,
        block_q_dq=blk_q,
    )
    out = flash_attention(
        qf, kf, vf, segment_ids=SegmentIds(seg, seg), sm_scale=scale,
        block_sizes=sizes,
    )
    return out[:, :, :N, :hd]


def _attention(cfg, block, x, rope, n_prefix, compute_dtype=None):
    B, N, D = x.shape
    H = cfg.eva_numheads
    hd = cfg.head_dim
    dt = compute_dtype or x.dtype

    # rotate-half RoPE: apply a fixed per-head channel permutation to the
    # q/k PROJECTION WEIGHTS (attention scores are invariant to a shared
    # q/k channel permutation) so the rotation pairs are contiguous
    # half-slices instead of stride-2 interleaved lanes — kills 4
    # deinterleave+interleave relayouts per block.
    rope_half = cfg.use_rot_pos_emb and hd % 2 == 0
    if rope_half:
        perm = _rope_half_perm(hd)
        cols = (np.arange(H)[:, None] * hd + perm[None, :]).reshape(-1)

        def proj_perm(p):
            w = p["w"][:, cols]
            return {"w": w, "b": p["b"][cols]} if "b" in p else {"w": w}

        def norm_perm(p):
            return {"scale": p["scale"][perm], "bias": p["bias"][perm]}

        q = _apply_linear(proj_perm(block["q_proj"]), x).reshape(B, N, H, hd)
        k = _apply_linear(proj_perm(block["k_proj"]), x).reshape(B, N, H, hd)
        if cfg.qk_norm:
            q = _layer_norm(q, norm_perm(block["q_norm"]), eps=1e-5)
            k = _layer_norm(k, norm_perm(block["k_norm"]), eps=1e-5)
    else:
        q = _apply_linear(block["q_proj"], x).reshape(B, N, H, hd)
        k = _apply_linear(block["k_proj"], x).reshape(B, N, H, hd)
        if cfg.qk_norm:
            q = _layer_norm(q, block["q_norm"], eps=1e-5)
            k = _layer_norm(k, block["k_norm"], eps=1e-5)
    v = _apply_linear(block["v_proj"], x).reshape(B, N, H, hd)
    q = q.transpose(0, 2, 1, 3)  # (B, H, N, hd)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if cfg.use_rot_pos_emb:
        cos, sin = rope
        apply = _apply_rope_half if rope_half else _apply_rope
        q_spatial = apply(q[:, :, n_prefix:], cos, sin)
        k_spatial = apply(k[:, :, n_prefix:], cos, sin)
        q = jnp.concatenate([q[:, :, :n_prefix], q_spatial], axis=2)
        k = jnp.concatenate([k[:, :, :n_prefix], k_spatial], axis=2)

    scale = 1.0 / math.sqrt(hd)
    if jax.default_backend() != "cpu" and N >= 1024:
        # Pallas flash attention: the XLA path materializes the full
        # (H, N, N) f32 attention matrix per block (404 MB at 128³ input —
        # ~1.9 ms/block of pure HBM traffic); flash keeps it in VMEM
        # tiles. Sequence padded to a block multiple with segment-id
        # masking, head dim zero-padded to the 128-lane tile (zero dims
        # add nothing to q·k and produce discarded zero outputs).
        out = _flash_attention(
            q.astype(dt), k.astype(dt), v.astype(dt), scale
        )
    else:
        logits = jnp.einsum(
            "bhnd,bhmd->bhnm", q.astype(dt), k.astype(dt),
            preferred_element_type=jnp.float32,
        ) * scale
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn.astype(dt), v.astype(dt),
            preferred_element_type=jnp.float32,
        )
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D).astype(x.dtype)
    if cfg.scale_attn_inner:
        out = _layer_norm(out, block["attn_inner_norm"], eps=1e-6)
    return _apply_linear(block["proj"], out)


def _mlp(block, x):
    h = jax.nn.silu(_apply_linear(block["mlp_w1"], x)) * _apply_linear(
        block["mlp_w2"], x
    )
    return _apply_linear(block["mlp_w3"], h)


def _tokenizer_v2(cfg, tok, x, compute_dtype=None):
    """Residual conv tokenizer (PatchEmbed_deeper equivalent): stem +
    stride-2 stages with InstanceNorm(in_eps)/LeakyReLU residual blocks +
    1×1×1 projection."""

    def conv(p, v, stride=1):
        return conv3d(
            v, p["w"], p.get("b"), stride=stride, padding="SAME"
            if stride == 1 else [(1, 1)] * 3,
            compute_dtype=compute_dtype,
        )

    def norm_act(v):
        return jax.nn.leaky_relu(
            instance_norm(v, eps=cfg.in_eps), negative_slope=0.01
        )

    y = norm_act(conv(tok["stem"], x))
    for stage in tok["stages"]:
        y = norm_act(conv(stage["down"], y, stride=2))
        for blk in stage["blocks"]:
            r = y
            y = norm_act(conv(blk["conv1"], y))
            y = conv(blk["conv2"], y)
            y = jax.nn.leaky_relu(
                instance_norm(y, eps=cfg.in_eps) + r, negative_slope=0.01
            )
    y = conv3d(y, tok["proj"]["w"], tok["proj"].get("b"),
               compute_dtype=compute_dtype)
    return y  # (B, d, h, w, embed)


def _stage_sparse_ok(stage):
    """The sparse GEMM weight format is 64x the dense taps: deep wide
    stages (256ch) blow scoped VMEM — those stay XLA (cheap anyway:
    small spatial dims)."""
    ci = stage["down"]["w"].shape[-1]
    return ci % 16 == 0 and 64 * ci * 8 * ci * 2 <= 18 * 2 ** 20


def prepack_primus_tokenizer(cfg, params, compute_dtype=jnp.bfloat16):
    """One-time packing of the fused tokenizer's residual-stage conv
    weights into the sparse block-GEMM layout. Without this the pack
    gathers re-run in-graph on every forward (and on every sliding-window
    chunk step). Returns a params pytree with extra ('w0','w1','w2','b8')
    leaves on the sparse-eligible stage convs; `_tokenizer_v2_fused` uses
    them when present and their dtype matches."""
    from anatomix_tpu.ops.pallas.conv3x3 import prepack_conv
    from anatomix_tpu.ops.pallas.conv_block_train import (
        pack_sparse_weights_jnp,
    )

    tok = params.get("tokenizer")
    if not isinstance(tok, dict) or "stages" not in tok:
        return params

    # stem: pack the dense block-space form for the Pallas VALID kernel
    # (inference only — the XLA dense_block_conv_train stays for the
    # differentiable path, which never sees prepacked leaves). The XLA
    # block conv is lane-poor (Ci_block=8) and ran 1.9 ms + 0.4 ms of
    # relayout at 128³ in the wave-27 trace vs ~0.4 ms MXU-rate here.
    stem = dict(tok["stem"])
    stem["pallas"] = prepack_conv(
        np.asarray(stem["w"], np.float32),
        None if stem.get("b") is None else np.asarray(
            stem["b"], np.float32
        ),
        s2d="on", act="none", compute_dtype=compute_dtype,
        interpret=jax.default_backend() == "cpu",
    )
    tok = {**tok, "stem": stem}

    from anatomix_tpu.ops.pallas.conv_block import (
        wide_weights_from_groups_jnp,
    )

    @jax.jit
    def _pack(w):
        return pack_sparse_weights_jnp(jnp.asarray(w).astype(compute_dtype))

    stages = []
    for stage in tok["stages"]:
        if not stage["blocks"] or not _stage_sparse_ok(stage):
            stages.append(stage)
            continue
        blocks = []
        for blk in stage["blocks"]:
            nb = dict(blk)
            for key in ("conv1", "conv2"):
                p = dict(nb[key])
                w0, w1, w2 = _pack(p["w"])
                co = p["w"].shape[-1]
                b = p.get("b")
                b = np.zeros((co,), np.float32) if b is None else b
                p["w0"], p["w1"], p["w2"] = w0, w1, w2
                # wide-assembly regroup for the valid kernel (round 5)
                for name, g in zip(
                    ("g1", "g2", "g3", "g4", "g5"),
                    wide_weights_from_groups_jnp(
                        w0, w1, w2, p["w"].shape[3]
                    ),
                ):
                    p[name] = g
                p["b8"] = jnp.tile(
                    jnp.asarray(b).astype(jnp.float32), 8
                )[None]
                nb[key] = p
            blocks.append(nb)
        stages.append({**stage, "blocks": blocks})
    return {**params, "tokenizer": {**tok, "stages": stages}}


def _tokenizer_v2_fused(cfg, tok, x, compute_dtype=None):
    """Block-space tokenizer: residual-stage convs run as sparse Pallas
    block GEMMs with instance norms (+ residual + LeakyReLU) fused into
    block-layout elementwise passes — one s2d/d2s pair per stage replaces
    the XLA conv/norm relayout traffic (trace r3: the XLA tokenizer cost
    6.3 ms of convs + 8.5 ms of norm-glue copies out of the 34.4 ms ViT
    forward). Exact same math as `_tokenizer_v2` (bf16-level differences
    only); stride-2 downsample convs run block->dense in a dedicated
    Pallas kernel (ops/pallas/conv_down.py) so no full-res depth_to_space
    ever materializes."""
    from anatomix_tpu.models.unet_fused import _instance_norm_any
    from anatomix_tpu.ops.pallas.conv_block import conv_block_sparse
    from anatomix_tpu.ops.pallas.conv_block_train import (
        pack_sparse_weights_jnp,
    )
    from anatomix_tpu.ops.pallas.conv_down import conv_down2_block
    from anatomix_tpu.ops.pallas.reshuffle import (
        depth_to_space,
        space_to_depth,
    )

    interpret = jax.default_backend() == "cpu"
    # no compute_dtype = full-precision semantics: the kernels request
    # HIGHEST-precision f32 dots (production passes bf16 explicitly)
    cd = compute_dtype or jnp.float32

    def lrelu(v):
        return jax.nn.leaky_relu(v, negative_slope=0.01)

    def conv(p, v, stride=1):
        return conv3d(
            v, p["w"], p.get("b"), stride=stride, padding="SAME"
            if stride == 1 else [(1, 1)] * 3,
            compute_dtype=compute_dtype,
        )

    def pack(p):
        if "w0" in p and p["w0"].dtype == cd:
            # prepacked once by `prepack_primus_tokenizer`
            out = {
                "w0": p["w0"], "w1": p["w1"], "w2": p["w2"],
                "b8": p["b8"], "act": "none",
                "ci": p["w"].shape[3], "co": p["w"].shape[4],
            }
            for name in ("g1", "g2", "g3", "g4", "g5"):
                if name in p:
                    out[name] = p[name]
            return out
        w = p["w"].astype(cd)
        co = w.shape[-1]
        w0, w1, w2 = pack_sparse_weights_jnp(w)
        b = p.get("b")
        b = jnp.zeros((co,), jnp.float32) if b is None else b
        return {
            "w0": w0, "w1": w1, "w2": w2,
            "b8": jnp.tile(b.astype(jnp.float32), 8)[None],
            "act": "none", "ci": w.shape[3], "co": co,
        }

    def norm_act(v):
        return lrelu(instance_norm(v, eps=cfg.in_eps))

    from anatomix_tpu.ops.pallas.conv_block_train import (
        dense_block_conv_train,
    )

    # stem: the XLA full-res Ci=1 conv is a pathological lane-1 loop
    # fusion that also swallows the following IN's statistics (16.8 ms of
    # the 49 ms round-3 trace) — run it as a dense block-space conv (MXU
    # rate) with the IN+LeakyReLU riding a block-layout elementwise pass.
    # A 4-D (B, D, H, W) input (the sliding path's packed window form) or
    # a (…, 1) volume both route through the packed channel-less s2d —
    # the (…, W, 1) tensor is 128x lane-padded under T(8,128) so slicing
    # or reading it costs ~1 GB at 128³ (conv3x3.space_to_depth_4d).
    from anatomix_tpu.ops.pallas.conv3x3 import space_to_depth_4d
    from anatomix_tpu.ops.pallas.reshuffle import space_to_depth_c1

    _use_c1 = (
        jax.default_backend() not in ("cpu",) or interpret
    ) and os.environ.get("ANATOMIX_S2D_C1", "0") == "1"
    # default OFF: the s2d_c1 kernel's (…,2w)->(…,w,2) minor-split
    # reshape is an unsupported Mosaic shape cast on real HW (wave-28
    # probe, tools/logs/w28_d2sprobe.log) — interpret mode accepts it.
    # The XLA space_to_depth_4d entry (~1.2 ms at 128³) is the fallback.

    def _s2d_c1(x4):
        # Pallas channel-less entry unless gated off (the XLA form
        # materializes a 64x-lane-padded (…, 2) intermediate — ~1.2 ms
        # per 128³ entry, wave-27 trace)
        if _use_c1:
            return space_to_depth_c1(x4.astype(cd), interpret=interpret)
        return space_to_depth_4d(x4.astype(cd))

    if x.ndim == 4:
        xb = _s2d_c1(x)
    elif x.shape[-1] == 1:
        xb = _s2d_c1(x[..., 0])
    else:
        xb = space_to_depth(x.astype(cd), interpret=interpret)
    stem_pallas = tok["stem"].get("pallas")
    if (
        stem_pallas is not None
        and stem_pallas["w_packed"].dtype == cd
        and os.environ.get("ANATOMIX_VIT_STEM_PALLAS", "1") == "1"
    ):
        # inference: prepacked Pallas dense block conv (MXU-rate); the
        # XLA block conv below is lane-poor at Ci_block=8 (~2.3 ms of
        # the 25 ms wave-27 ViT forward incl. relayouts)
        from anatomix_tpu.models.unet_fused import _conv_block_dense

        yb = _conv_block_dense(xb, stem_pallas, "zeros", cd, interpret)
    else:
        yb = dense_block_conv_train(
            xb, tok["stem"]["w"].astype(cd),
            tok["stem"].get("b"), act="none", pad_type="zeros",
            compute_dtype=cd,
        )
    yb = _instance_norm_any(yb, True, eps=cfg.in_eps, act_fn=lrelu, act_name="lrelu")
    y = None  # (block yb) xor (dense y): materialize one representation

    def to_dense(y, yb):
        if y is None:
            y = depth_to_space(yb, interpret=interpret)
            if compute_dtype is None:
                y = y.astype(x.dtype)  # block path may run a narrower
                # dtype; XLA ops expect operands matching the f32 weights
        return y

    for stage in tok["stages"]:
        wd = stage["down"]["w"]
        ci, co = int(wd.shape[3]), int(wd.shape[4])
        # Mosaic legality: the kernel slices the (w + halo) scratch axis
        # at extent w on the sublane dim — extents not 8-aligned fail to
        # compile (HW: "Slice shape along dimension 2 must be aligned to
        # tiling (8), but is 4" at block-w 4). Production 128³ ladders
        # (64/32/16) are always legal; small test volumes demote.
        down_ok = yb is not None and yb.shape[3] % 8 == 0
        if down_ok and (8 * ci) % 128 == 0:
            # stride-2 down conv straight from block space: the stride-2
            # output grid IS the input block grid, so the kernel emits a
            # dense tensor at 1.0x nominal FLOPs with no depth_to_space
            # (the d2s relayout + misplaced-layout XLA conv were
            # 3.2 + 4.0 ms of the 36.8 ms round-3 trace)
            wdc = wd.astype(cd)
            bd = stage["down"].get("b")
            bd = jnp.zeros((co,), jnp.float32) if bd is None else bd
            y = conv_down2_block(
                yb,
                wdc[:, :, :1].reshape(9 * ci, co),
                wdc[:, :, 1:].reshape(18 * ci, co),
                bd.astype(jnp.float32)[None],
                act="none", out_dtype=cd, interpret=interpret,
            )
            if compute_dtype is None:
                y = y.astype(x.dtype)
        else:
            y = conv(stage["down"], to_dense(y, yb), stride=2)
        yb = None
        if stage["blocks"] and _stage_sparse_ok(stage):
            yb = space_to_depth(y.astype(cd), interpret=interpret)
            y = None
            yb = _instance_norm_any(
                yb, True, eps=cfg.in_eps, act_fn=lrelu, act_name="lrelu"
            )
            for blk in stage["blocks"]:
                r = yb
                z = conv_block_sparse(
                    yb, pack(blk["conv1"]), pad_type="zeros",
                    interpret=interpret,
                )
                z = _instance_norm_any(
                    z, True, eps=cfg.in_eps, act_fn=lrelu, act_name="lrelu"
                )
                z = conv_block_sparse(
                    z, pack(blk["conv2"]), pad_type="zeros",
                    interpret=interpret,
                )
                # IN + residual + act ride one block elementwise pass
                yb = _instance_norm_any(
                    z, True, eps=cfg.in_eps,
                    act_fn=lambda v, r=r: lrelu(
                        v + r.astype(jnp.float32)
                    ),
                )
        else:
            y = norm_act(y)
            for blk in stage["blocks"]:
                r = y
                y = norm_act(conv(blk["conv1"], y))
                y = conv(blk["conv2"], y)
                y = jax.nn.leaky_relu(
                    instance_norm(y, eps=cfg.in_eps) + r,
                    negative_slope=0.01,
                )
    y = to_dense(y, yb)
    y = conv3d(y, tok["proj"]["w"], tok["proj"].get("b"),
               compute_dtype=compute_dtype)
    return y


def _decoder_block_space(dec, grid, compute_dtype=None, fuse_demean=False,
                         interpret=False, emit="spatial"):
    """Whole decoder tower in block space: the three ×2 transposed-conv
    stages are per-sub-voxel GEMMs on the 16³ grid (never materializing
    the 32³/64³ intermediate layouts or their LayerNorm relayouts — the
    wave-27 trace charged ~2 ms of the 25 ms ViT forward to them), and
    ONE factor-8 Pallas reshuffle (`reshuffle.depth_to_space8`) exits:
    'packed' emits (B, 8d, 8h, w, 8C), the row-major byte image of the
    spatial tensor, with ZERO relayout (the production inference fetch);
    'spatial' adds one XLA minor-split reshape.

    Math-identical to the stage-by-stage path: a stride-2 kernel-2
    transposed conv is one GEMM whose output columns are (kd, kh, kw,
    co)-major, and the inter-stage bias/LayerNorm/GELU act per sub-voxel
    over channels — layout-independent. Returns (volume, demeaned,
    packed) like `_decoder`, or None when the config is outside the
    kernel's envelope (then the caller falls through to `_decoder`'s
    stage-by-stage path). Reference semantics: the transposed-conv
    decoder of `/root/reference/anatomix/model/vit3d/architectures.py`
    (upstream Primus patch decoder)."""
    from anatomix_tpu.ops.pallas.reshuffle import (
        d2s8_supported,
        depth_to_space8,
    )

    n = len(dec)
    C = dec[-1]["w"].shape[4]
    if n != 3 or not d2s8_supported(C):
        return None
    # 'fold' (the (…, 8wC/128, 128) flat-lane form the sliding scatter
    # consumes) stays on the proven stage path: producing those rows
    # in-kernel needs the sublane interleave Mosaic rejects (wave-28).
    if emit not in ("spatial", "packed"):
        return None
    # the packed form is only byte-exact w.r.t. the FINAL output when the
    # out-norm rides the kernel's subtract port — a spatial out_norm
    # applied by the caller would see the packed layout
    pack = emit == "packed"
    if pack and not fuse_demean:
        return None
    dt = compute_dtype or grid.dtype
    y = grid.astype(dt)  # (B, d, h, w, C0)
    K = 1
    for i, p in enumerate(dec):
        w = p["w"]  # (2, 2, 2, ci, co)
        ci, co = w.shape[3], w.shape[4]
        w2 = jnp.transpose(w, (3, 0, 1, 2, 4)).reshape(ci, 8 * co)
        # per-sub-voxel GEMM: (..., K, ci) @ (ci, 8co) -> (..., K, 8, co)
        y = jnp.einsum(
            "bdhwkc,ce->bdhwke", y.reshape(y.shape[:4] + (K, ci)),
            w2.astype(dt), preferred_element_type=jnp.float32,
        ).astype(dt)
        K *= 8
        y = y.reshape(y.shape[:4] + (K, co))
        if i < n - 1:
            if "b" in p:
                y = y + p["b"].astype(y.dtype)
            y = jax.nn.gelu(channel_layer_norm(y, eps=1e-6))
    B = y.shape[0]
    yk = y  # (B, d, h, w, 512, C)
    y = y.reshape(y.shape[:4] + (512 * C,))
    sub = None
    demeaned = False
    if fuse_demean:
        # per-channel spatial mean over every voxel × sub-position — the
        # same value set as the full-res mean; the final bias cancels
        # under demean (demean(y + b) == demean(y))
        m = jnp.mean(
            yk.astype(jnp.float32), axis=(1, 2, 3, 4)
        )  # (B, C)
        sub = jnp.tile(m, (1, 512))
        demeaned = True
    elif "b" in dec[-1]:
        # ride the final bias add on the exit kernel's subtract port
        b = dec[-1]["b"].astype(jnp.float32)
        sub = jnp.broadcast_to(jnp.tile(-b, 512)[None], (B, 512 * C))
    out_dtype = y.dtype if pack else jnp.float32
    vol = depth_to_space8(
        y, sub=sub, out_dtype=out_dtype,
        emit="packed" if pack else "spatial", interpret=interpret,
    )
    return vol, demeaned, pack


def _decoder(cfg, dec, grid, compute_dtype=None, fuse_demean=False,
             interpret=False, emit="spatial"):
    """Transposed-conv ×2 stages back to full resolution.

    A stride-2 kernel-2 transposed conv has non-overlapping windows, so
    each stage is exactly ONE GEMM into block layout (output channels
    (ad, ah, aw)-major) followed by depth-to-space — XLA's conv_transpose
    lowering is replaced by a plain matmul + the Pallas reshuffle.

    With `fuse_demean` (the 'demean' out-norm) the final bias cancels
    (demean(y + b) == demean(y)) and the per-channel spatial mean is taken
    on the SMALL pre-d2s block tensor, with the subtract + f32 cast fused
    into the exit reshuffle — the separate full-res f32 materialize /
    reduce / sub chain was ~3 ms of the 36.8 ms round-3 ViT trace.
    With `emit='fold'` the final stage returns the folded flat-lane form
    (B, D, H, W*C/128, 128) for the sliding-window scatter kernel
    (`reshuffle.depth_to_space_fold` — no full-res narrow-C tensor is
    ever materialized). With `emit='packed'` the contract is only "a
    row-major byte-exact repacking of the spatial output" — the
    block-space path returns (B, D, H, W/8, 8C), this stage path returns
    the fold form — for byte-level consumers (host fetch).
    Returns (volume, demeaned: bool, folded/packed: bool).
    """
    from anatomix_tpu.ops.pallas.conv3x3 import _depth_to_space
    from anatomix_tpu.ops.pallas.reshuffle import depth_to_space as _d2s
    from anatomix_tpu.ops.pallas.reshuffle import (
        depth_to_space_fold,
        fold_supported,
    )

    on_tpu = jax.default_backend() not in ("cpu",) or interpret
    y = grid
    n = len(dec)
    # default ON: the factor-8 packed emit passed the wave-29 HW Mosaic
    # probe (bit-exact, tools/logs/w29_d2s8.log) and the block-space
    # decoder measured faster in both emit modes (packed 18.69 vs
    # 18.85 ms, spatial 19.69 vs 20.05 — tools/logs/w29_vitab.log);
    # parity vs the stage path is pinned by test_vit3d's decoder A/B
    if on_tpu and os.environ.get("ANATOMIX_DECODER_BLOCK", "1") == "1":
        yb = _decoder_block_space(
            dec, grid, compute_dtype=compute_dtype,
            fuse_demean=fuse_demean, interpret=interpret, emit=emit,
        )
        if yb is not None:
            return yb
    for i, p in enumerate(dec):
        w = p["w"]  # (2, 2, 2, in, out)
        ci, co = w.shape[3], w.shape[4]
        dt = compute_dtype or y.dtype
        w2 = jnp.transpose(w, (3, 0, 1, 2, 4)).reshape(ci, 8 * co)
        yb = jnp.einsum(
            "bdhwc,ce->bdhwe", y.astype(dt), w2.astype(dt),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        use_kernel_d2s = on_tpu and co >= 8
        if fuse_demean and i == n - 1 and use_kernel_d2s:
            B = yb.shape[0]
            m8 = jnp.mean(yb.astype(jnp.float32), axis=(1, 2, 3))
            m = m8.reshape(B, 8, co).mean(axis=1)  # (B, C) spatial mean
            if (emit in ("fold", "packed")
                    and fold_supported(co, yb.shape[3])):
                # 'packed' on the stage path degrades to the fold form —
                # also a byte-exact spatial repacking, different shape
                # bf16 folded windows: the demean subtract still runs in
                # f32 inside the kernel, and the sliding scatter
                # accumulates in f32 — the bf16 hop halves the exit
                # write + stitch read (same precision class as the UNet
                # sliding path, whose window outputs are compute-dtype)
                y = depth_to_space_fold(
                    yb, sub=jnp.tile(m, (1, 8)),
                    out_dtype=yb.dtype, interpret=interpret,
                )
                return y, True, True
            if os.environ.get("ANATOMIX_D2S_INTERLEAVE", "0") == "1":
                # opt-in only: the in-kernel (w,2C)->(2w,C) minor-split
                # reshape is an unsupported Mosaic shape cast on real HW
                # (wave-28 probe) — would kill the 4.5 ms XLA relayout at
                # the 128³ exit if a legal formulation lands
                from anatomix_tpu.ops.pallas.reshuffle import (
                    depth_to_space_interleave,
                )

                y = depth_to_space_interleave(
                    yb, sub=jnp.tile(m, (1, 8)),
                    out_dtype=jnp.float32, interpret=interpret,
                )
                return y, True, False
            y = _d2s(yb, sub=jnp.tile(m, (1, 8)),
                     out_dtype=jnp.float32, interpret=interpret)
            return y, True, False
        # stay in compute dtype between stages: materializing the d2s
        # output in f32 cost ~4.3 ms of pure HBM traffic at the 128³ stage
        # (trace r3); the inter-stage LayerNorm computes its statistics in
        # f32 internally regardless, and the final f32 cast happens once at
        # the decoder output.
        y = (_d2s(yb, interpret=interpret) if use_kernel_d2s
             else _depth_to_space(yb))
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        if i < n - 1:
            y = jax.nn.gelu(channel_layer_norm(y, eps=1e-6))
    return y.astype(jnp.float32), False, False


def primus_apply(
    cfg: PrimusConfig,
    params: dict[str, Any],
    x: jax.Array,  # (B, D, H, W, C) — spatial must equal cfg.input_shape
    *,
    layers=None,
    encode_only: bool = False,
    compute_dtype=None,
    tokenizer_impl: str = "auto",
    emit: str = "spatial",
):
    """Forward pass with the anatomix pretraining interface
    (`architectures.py:126-165`): plain -> normalized volume; `layers`
    truthy -> (volume, [volume]) or, with `encode_only`, [volume].

    `tokenizer_impl`: 'auto' = block-space Pallas tokenizer on TPU, XLA on
    CPU; 'fused' / 'xla' force (the fused path uses interpret mode on CPU,
    for tests).

    `emit`: 'spatial' (default) returns (B, D, H, W, C); 'fold' returns
    the flat-lane form (B, D, H, W*C/128, 128) the sliding-window scatter
    consumes; 'packed' returns SOME row-major byte-exact repacking of the
    spatial tensor — shape depends on the decoder path ((…, W*C/128, 128)
    or (…, W/8, 8C)) — for byte-level consumers (host fetch / np.reshape).
    Both non-spatial emits skip the narrow-C relayout on TPU."""
    if tuple(x.shape[1:4]) != tuple(cfg.input_shape):
        raise ValueError(
            f"Primus is bound to input_shape={cfg.input_shape}; got "
            f"{x.shape[1:4]} (use sliding windows for other sizes)."
        )
    B = x.shape[0]

    if cfg.version == "v2":
        use_fused = tokenizer_impl == "fused" or (
            tokenizer_impl == "auto" and jax.default_backend() != "cpu"
        )  # per-stage sparse/XLA gating lives in _tokenizer_v2_fused
        tok_fn = _tokenizer_v2_fused if use_fused else _tokenizer_v2
        # 4-D (B, D, H, W) channel-less input: the fused tokenizer packs
        # it directly (space_to_depth_4d); the XLA tokenizer needs the
        # explicit channel dim
        x_tok = x[..., None] if x.ndim == 4 and not use_fused else x
        grid = tok_fn(
            cfg, params["tokenizer"], x_tok, compute_dtype=compute_dtype
        )
    else:
        p = cfg.patch_embed_size
        grid = conv3d(
            x if x.ndim == 5 else x[..., None],
            params["tokenizer"]["proj"]["w"],
            params["tokenizer"]["proj"].get("b"),
            stride=p, padding="VALID", compute_dtype=compute_dtype,
        )
        grid = _layer_norm(grid, params["tokenizer"]["norm"])

    gd, gh, gw = cfg.grid_shape
    tokens = grid.reshape(B, gd * gh * gw, cfg.embed_dim)
    if cfg.use_abs_pos_embed:
        tokens = tokens + params["pos_embed"]

    n_prefix = cfg.num_register_tokens
    if n_prefix > 0:
        regs = jnp.broadcast_to(
            params["register_tokens"],
            (B, n_prefix, cfg.embed_dim),
        )
        tokens = jnp.concatenate([regs, tokens], axis=1)

    rope = _rope_tables(cfg) if cfg.use_rot_pos_emb else None

    for block in params["blocks"]:
        attn_out = _attention(
            cfg, block, _layer_norm(tokens, block["norm1"]), rope,
            n_prefix, compute_dtype=compute_dtype,
        )
        if "gamma1" in block:
            attn_out = attn_out * block["gamma1"]
        tokens = tokens + attn_out
        mlp_out = _mlp(block, _layer_norm(tokens, block["norm2"]))
        if "gamma2" in block:
            mlp_out = mlp_out * block["gamma2"]
        tokens = tokens + mlp_out

    tokens = _layer_norm(tokens, params["norm"])
    tokens = tokens[:, n_prefix:]
    grid = tokens.reshape(B, gd, gh, gw, cfg.embed_dim)

    mode = cfg.out_norm
    if isinstance(mode, bool):
        mode = "instance" if mode else "none"
    volume, demeaned, folded = _decoder(
        cfg, params["decoder"], grid, compute_dtype=compute_dtype,
        fuse_demean=(mode or "none").lower() in ("demean", "center"),
        emit=emit,
    )
    if demeaned:
        output = volume
    else:
        out_norm = build_out_norm(cfg.out_norm, cfg.out_norm_eps)
        output = out_norm(volume)

    if emit in ("fold", "packed") and not folded:
        # fallback: fold via an XLA reshape (caller guaranteed
        # (W*C) % 128 == 0 via scatter_kernel_eligible)
        B_, D_, H_, W_, C_ = output.shape
        output = output.reshape(B_, D_, H_, (W_ * C_) // 128, 128)

    if layers:
        features = [output]
        return features if encode_only else (output, features)
    return output


def load_primus_v2(vit_kwargs: dict, cache_path=None, repo_id=None,
                   revision=None, variant=None, seed: int = 0):
    """Build PrimusV2 from registry kwargs; load converted weights when a
    cache path is given, else random init (the upstream `.pth` layout is
    converted by `convert_primus_state_dict` when available)."""
    cfg = PrimusConfig(
        input_channels=vit_kwargs["input_channels"],
        num_classes=vit_kwargs["num_classes"],
        embed_dim=vit_kwargs["embed_dim"],
        eva_depth=vit_kwargs["eva_depth"],
        eva_numheads=vit_kwargs["eva_numheads"],
        patch_embed_size=tuple(vit_kwargs["patch_embed_size"]),
        input_shape=tuple(vit_kwargs["input_shape"]),
        num_register_tokens=vit_kwargs["num_register_tokens"],
        init_values=vit_kwargs.get("init_values", 0.1),
        scale_attn_inner=vit_kwargs.get("scale_attn_inner", False),
        qk_norm=vit_kwargs.get("qk_norm", False),
        out_norm=vit_kwargs.get("out_norm", "none"),
        out_norm_eps=vit_kwargs.get("out_norm_eps", 1e-5),
        register_init_std=vit_kwargs.get("register_init_std", 1e-6),
        in_eps=vit_kwargs.get("in_eps", 1e-5),
        version="v2",
    )
    if cache_path is not None and str(cache_path).endswith(".npz"):
        from anatomix_tpu.utils.checkpoint import load_pytree

        return cfg, load_pytree(cache_path)
    params = init_primus_params(cfg, jax.random.PRNGKey(seed))
    return cfg, params
