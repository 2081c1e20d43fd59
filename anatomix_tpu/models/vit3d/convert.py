"""Best-effort Primus/PrimusV2 torch-checkpoint conversion.

The upstream `dynamic-network-architectures` package and the pretrained
`anatomix-dev-vit.pth` are unavailable in this environment, so the key map
below targets the *expected* upstream layout (timm-EVA attribute names plus
the anatomix wrapper's additions, `/root/reference/anatomix/model/vit3d/
architectures.py:108-120`) with aliases per slot. The converter is strict:
it reports every source key it could not map and every target it could not
fill, so validating against real weights is a single run.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from anatomix_tpu.models.convert import strip_prefixes
from anatomix_tpu.models.vit3d.primus import PrimusConfig


def _t(w):  # torch Linear weight (out, in) -> (in, out)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


def _conv_t(w):  # torch Conv3d (O, I, kD, kH, kW) -> DHWIO
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))


def _deconv_t(w):
    """torch ConvTranspose3d (I, O, kD, kH, kW) -> DHWIO scatter layout:
    w[a, b, c, ci, co] scatters to output offset (a, b, c), exactly
    torch's convention and what `primus._decoder` (GEMM + depth-to-space)
    consumes. NO spatial flip — a flip is only needed when feeding
    `lax.conv_transpose`, which the runtime does not use. Verified
    against `nn.ConvTranspose3d` through the real decoder in
    tests/test_vit3d.py."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 4, 0, 1)))


def convert_primus_state_dict(
    cfg: PrimusConfig, state_dict: Mapping[str, Any]
) -> tuple[dict[str, Any], list[str], list[str]]:
    """Returns (params, unmapped_source_keys, unfilled_targets).

    Raises if any transformer-core target stays unfilled while plausible
    source keys exist (i.e. a true layout mismatch rather than an absent
    component).
    """
    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                      else v)
        for k, v in strip_prefixes(state_dict).items()
    }
    used: set[str] = set()
    unfilled: list[str] = []

    def take(*names, transform=None, optional=False):
        for name in names:
            if name in sd:
                used.add(name)
                val = sd[name]
                return transform(val) if transform else val.astype(
                    np.float32
                )
        if not optional:
            unfilled.append(names[0])
        return None

    params: dict[str, Any] = {}

    # embeddings
    pos = take("eva.pos_embed", "pos_embed", optional=True)
    if pos is not None:
        params["pos_embed"] = pos.reshape(-1, cfg.embed_dim)
    regs = take(
        "register_tokens", "eva.register_tokens", optional=True
    )
    if regs is not None:
        params["register_tokens"] = regs.reshape(-1, cfg.embed_dim)

    # EVA blocks
    blocks = []
    for i in range(cfg.eva_depth):
        base = f"eva.blocks.{i}"
        blk: dict[str, Any] = {}
        blk["norm1"] = {
            "scale": take(f"{base}.norm1.weight"),
            "bias": take(f"{base}.norm1.bias"),
        }
        blk["q_proj"] = {
            "w": take(f"{base}.attn.q_proj.weight", transform=_t),
            "b": take(f"{base}.attn.q_bias", f"{base}.attn.q_proj.bias"),
        }
        blk["k_proj"] = {
            "w": take(f"{base}.attn.k_proj.weight", transform=_t),
        }
        blk["v_proj"] = {
            "w": take(f"{base}.attn.v_proj.weight", transform=_t),
            "b": take(f"{base}.attn.v_bias", f"{base}.attn.v_proj.bias"),
        }
        blk["proj"] = {
            "w": take(f"{base}.attn.proj.weight", transform=_t),
            "b": take(f"{base}.attn.proj.bias"),
        }
        if cfg.qk_norm:
            blk["q_norm"] = {
                "scale": take(f"{base}.attn.q_norm.weight"),
                "bias": take(f"{base}.attn.q_norm.bias"),
            }
            blk["k_norm"] = {
                "scale": take(f"{base}.attn.k_norm.weight"),
                "bias": take(f"{base}.attn.k_norm.bias"),
            }
        if cfg.scale_attn_inner:
            blk["attn_inner_norm"] = {
                "scale": take(f"{base}.attn.norm.weight"),
                "bias": take(f"{base}.attn.norm.bias"),
            }
        if cfg.init_values is not None:
            blk["gamma1"] = take(f"{base}.gamma_1", f"{base}.ls1.gamma")
            blk["gamma2"] = take(f"{base}.gamma_2", f"{base}.ls2.gamma")
        blk["norm2"] = {
            "scale": take(f"{base}.norm2.weight"),
            "bias": take(f"{base}.norm2.bias"),
        }
        blk["mlp_w1"] = {
            "w": take(f"{base}.mlp.w1.weight", f"{base}.mlp.fc1_g.weight",
                      transform=_t),
            "b": take(f"{base}.mlp.w1.bias", f"{base}.mlp.fc1_g.bias"),
        }
        blk["mlp_w2"] = {
            "w": take(f"{base}.mlp.w2.weight", f"{base}.mlp.fc1_x.weight",
                      transform=_t),
            "b": take(f"{base}.mlp.w2.bias", f"{base}.mlp.fc1_x.bias"),
        }
        blk["mlp_w3"] = {
            "w": take(f"{base}.mlp.w3.weight", f"{base}.mlp.fc2.weight",
                      transform=_t),
            "b": take(f"{base}.mlp.w3.bias", f"{base}.mlp.fc2.bias"),
        }
        blocks.append(blk)
    params["blocks"] = blocks
    params["norm"] = {
        "scale": take("eva.norm.weight", "eva.fc_norm.weight"),
        "bias": take("eva.norm.bias", "eva.fc_norm.bias"),
    }

    # ---- tokenizer / decoder convs ------------------------------------------
    # The upstream sub-module names inside down_projection/up_projection are
    # not pinned here (package unavailable), so convs are matched to the
    # runtime structure by their expected forward-order DHWIO shapes; ties
    # between same-shape convs resolve in NATURAL key order (numeric module
    # indices compare as integers — lexicographic order would put
    # "encoder.10" before "encoder.2" and silently swap same-shape convs).
    import re as _re

    def _natkey(k):
        # (0, int) / (1, str) tuples keep mixed tokens comparable
        return [(0, int(t)) if t.isdigit() else (1, t)
                for t in _re.split(r"(\d+)", k)]

    def _grab_convs(prefix, transform):
        items = []
        for k in sorted(sd, key=_natkey):
            if (
                k.startswith(prefix)
                and k.endswith("weight")
                and sd[k].ndim == 5
            ):
                bk = k[: -len("weight")] + "bias"
                items.append(
                    (
                        k,
                        transform(sd[k]).astype(np.float32),
                        sd[bk].astype(np.float32) if bk in sd else None,
                        bk,
                    )
                )
        return items

    def _pop_match(items, shape, what):
        for idx, (k, w, b, bk) in enumerate(items):
            if w.shape == shape:
                items.pop(idx)
                used.add(k)
                p = {"w": w}
                if b is not None:
                    used.add(bk)
                    p["b"] = b
                return p
        unfilled.append(f"{what} {shape}")
        return {"w": np.zeros(shape, np.float32)}

    tok_items = _grab_convs("down_projection.", _conv_t)
    if cfg.version == "v2":
        base = cfg.tokenizer_base_features
        tok: dict[str, Any] = {
            "stem": _pop_match(
                tok_items,
                (3, 3, 3, cfg.input_channels, base),
                "tokenizer stem",
            )
        }
        ch = base
        stages = []
        for level, depth in enumerate(cfg.tokenizer_depth_per_level):
            out_ch = min(ch * 2, cfg.embed_dim)
            stage = {
                "down": _pop_match(
                    tok_items, (3, 3, 3, ch, out_ch),
                    f"tokenizer stage{level} down",
                ),
                "blocks": [
                    {
                        "conv1": _pop_match(
                            tok_items, (3, 3, 3, out_ch, out_ch),
                            f"tokenizer stage{level} block{j} conv1",
                        ),
                        "conv2": _pop_match(
                            tok_items, (3, 3, 3, out_ch, out_ch),
                            f"tokenizer stage{level} block{j} conv2",
                        ),
                    }
                    for j in range(depth)
                ],
            }
            stages.append(stage)
            ch = out_ch
        tok["stages"] = stages
        tok["proj"] = _pop_match(
            tok_items, (1, 1, 1, ch, cfg.embed_dim), "tokenizer proj"
        )
        params["tokenizer"] = tok
    else:  # v1: single strided patch-embed conv + token LayerNorm
        p = cfg.patch_embed_size
        params["tokenizer"] = {
            "proj": _pop_match(
                tok_items,
                (p[0], p[1], p[2], cfg.input_channels, cfg.embed_dim),
                "patch embed proj",
            ),
            "norm": {
                "scale": take(
                    "down_projection.norm.weight", optional=True
                ),
                "bias": take("down_projection.norm.bias", optional=True),
            },
        }

    import math

    dec_items = _grab_convs("up_projection.", _deconv_t)
    n_up = int(round(math.log2(cfg.patch_embed_size[0])))
    dec = []
    ch = cfg.embed_dim
    for i in range(n_up):
        out_ch = cfg.num_classes if i == n_up - 1 else max(ch // 2, 32)
        dec.append(
            _pop_match(dec_items, (2, 2, 2, ch, out_ch), f"decoder up{i}")
        )
        ch = out_ch
    params["decoder"] = dec

    unmapped = sorted(set(sd) - used)
    return params, unmapped, unfilled
