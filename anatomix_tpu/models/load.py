"""Model loading: HuggingFace Hub variants, local `.pth`, or from-scratch.

Mirrors `load_from_hf` (`/root/reference/anatomix/model/load_from_hf.py:
52-79`) and the registration/segmentation `load_model` helpers
(`convex_adam_utils.py:16-78`, `segmentation_utils.py:36-116`), returning
`(plan, params)` pytrees instead of an nn.Module.

Also supports `.npz` checkpoints written by `save_npz` (the native
anatomix_tpu format — no torch required to load).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from anatomix_tpu.models.convert import (
    convert_state_dict,
    load_torch_state_dict,
)
from anatomix_tpu.models.registry import ANATOMIX_VARIANTS, DEFAULT_REPO
from anatomix_tpu.models.unet import UnetConfig, UnetPlan, build_plan


def save_npz(path: str, params: dict[str, Any]) -> None:
    """Save a params pytree as a flat .npz ('idx/leaf' keys)."""
    flat = {}
    for idx, sub in params.items():
        for leaf, val in sub.items():
            flat[f"{idx}/{leaf}"] = np.asarray(val)
    np.savez(path, **flat)


def load_npz(path: str) -> dict[str, Any]:
    flat = np.load(path)
    params: dict[str, Any] = {}
    for key in flat.files:
        idx, leaf = key.split("/", 1)
        params.setdefault(idx, {})[leaf] = flat[key]
    return params


def _params_from_file(plan: UnetPlan, path: str) -> dict[str, Any]:
    if path.endswith(".npz"):
        return load_npz(path)
    return convert_state_dict(plan, load_torch_state_dict(path))


def load_from_hf(
    variant: str,
    repo_id: str = DEFAULT_REPO,
    revision: str | None = None,
    cache_path: str | None = None,
):
    """Download `<variant>.pth` from the Hub, convert, return (plan, params).

    `cache_path` short-circuits the download with a local `.pth`/`.npz`
    (useful in air-gapped environments).
    """
    if variant not in ANATOMIX_VARIANTS:
        raise ValueError(
            f"Unknown variant {variant!r}. Known: {sorted(ANATOMIX_VARIANTS)}"
        )
    config = ANATOMIX_VARIANTS[variant]
    if "vit_kwargs" in config:
        from anatomix_tpu.models.vit3d import load_primus_v2

        return load_primus_v2(config["vit_kwargs"], cache_path=cache_path,
                              repo_id=repo_id, revision=revision,
                              variant=variant)

    plan = build_plan(UnetConfig(**config["unet_kwargs"]))
    if cache_path is None:
        from huggingface_hub import hf_hub_download

        cache_path = hf_hub_download(
            repo_id, f"{variant}.pth", revision=revision
        )
    return plan, _params_from_file(plan, cache_path)


def load_model(
    ckpt_path: str | None = None,
    hf_variant: str | None = None,
    *,
    num_downs: int = 4,
    ngf: int = 16,
    output_nc: int = 16,
    norm: str = "batch",
    interp: str = "nearest",
    pooling: str = "Max",
    allow_scratch: bool = False,
    seed: int = 0,
):
    """Registration-style loader (`convex_adam_utils.py:16-78`).

    Exactly one of `ckpt_path` / `hf_variant`; 'scratch' rejected unless
    `allow_scratch` (segmentation allows it, registration does not).
    Returns `(plan, params)`.
    """
    if (ckpt_path is None) == (hf_variant is None):
        raise ValueError("Provide exactly one of `ckpt_path` or `hf_variant`.")

    if hf_variant is not None:
        return load_from_hf(hf_variant)

    config = UnetConfig(
        dimension=3,
        input_nc=1,
        output_nc=output_nc,
        num_downs=num_downs,
        ngf=ngf,
        norm=norm,
        interp=interp,
        pooling=pooling,
    )
    plan = build_plan(config)

    if ckpt_path == "scratch":
        if not allow_scratch:
            raise ValueError(
                "'scratch' is not supported for registration; "
                "registration requires pretrained weights."
            )
        import jax

        from anatomix_tpu.models.unet import init_params

        return plan, init_params(plan, jax.random.PRNGKey(seed))

    if not os.path.isfile(ckpt_path):
        raise FileNotFoundError(f"Checkpoint file not found: {ckpt_path}")
    return plan, _params_from_file(plan, ckpt_path)
