"""Checkpoint conversion: PyTorch `.pth` state dicts <-> JAX pytrees.

The reference ships weights as flat-Sequential torch state dicts with keys
`model.<idx>.weight` / `.bias` / `.running_mean` / `.running_var`
(`/root/reference/anatomix/model/network.py:465`), possibly wrapped with
`_orig_mod.` (torch.compile) or `module.` (DataParallel) prefixes
(`load_from_hf.py:39-49`, `pretraining/models/base_model.py:458-466`).

Conversion is numpy-only at its core (`convert_state_dict`); loading an
actual `.pth` file uses torch when available (torch-cpu is in the image) and
falls back to a numpy-compatible zipfile reader otherwise.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from anatomix_tpu.models.unet import UnetPlan
from anatomix_tpu.ops.conv import (
    jax_conv_weight_to_torch,
    torch_conv_weight_to_jax,
)

_PREFIXES = ("_orig_mod.", "module.")


def strip_prefixes(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Strip `_orig_mod.` / `module.` wrappers (possibly stacked)."""
    out = {}
    for key, val in state_dict.items():
        changed = True
        while changed:
            changed = False
            for pre in _PREFIXES:
                if key.startswith(pre):
                    key = key[len(pre):]
                    changed = True
        out[key] = val
    return out


def _to_numpy(val) -> np.ndarray:
    if isinstance(val, np.ndarray):
        return val
    # torch.Tensor without importing torch at module scope
    if hasattr(val, "detach"):
        return val.detach().cpu().numpy()
    return np.asarray(val)


def convert_state_dict(
    plan: UnetPlan, state_dict: Mapping[str, Any]
) -> dict[str, Any]:
    """torch UNet state dict -> anatomix_tpu params pytree.

    Conv weights go (O,I,kD,kH,kW) -> DHWIO; norm parameters map
    weight/bias/running_mean/running_var -> scale/bias/mean/var.
    """
    sd = {k: _to_numpy(v) for k, v in strip_prefixes(state_dict).items()}
    cfg = plan.config
    params: dict[str, Any] = {}
    consumed = set()
    prelu_vals: list[np.ndarray] = []
    for idx, spec in enumerate(plan.layers):
        base = f"model.{idx}"
        if spec.kind == "conv":
            w = sd[f"{base}.weight"]
            consumed.add(f"{base}.weight")
            p = {"w": torch_conv_weight_to_jax(w).astype(np.float32)}
            if f"{base}.bias" in sd:
                p["b"] = sd[f"{base}.bias"].astype(np.float32)
                consumed.add(f"{base}.bias")
            params[str(idx)] = p
        elif spec.kind == "act" and cfg.activation == "prelu":
            # The reference appends ONE shared nn.PReLU() instance at every
            # act slot (`network.py:301` — built once), so the state dict
            # repeats the same tensor under each index; keep one copy and
            # verify they agree.
            prelu_vals.append(sd[f"{base}.weight"].astype(np.float32))
            consumed.add(f"{base}.weight")
        elif spec.kind == "final_act" and cfg.final_act == "prelu":
            # FinalActivation is its OWN module instance (`network.py:302`).
            params["final_prelu"] = {
                "w": sd[f"{base}.weight"].astype(np.float32)
            }
            consumed.add(f"{base}.weight")
        elif spec.kind == "norm":
            if cfg.norm == "batch":
                params[str(idx)] = {
                    "scale": sd[f"{base}.weight"].astype(np.float32),
                    "bias": sd[f"{base}.bias"].astype(np.float32),
                    "mean": sd[f"{base}.running_mean"].astype(np.float32),
                    "var": sd[f"{base}.running_var"].astype(np.float32),
                }
                consumed |= {
                    f"{base}.weight",
                    f"{base}.bias",
                    f"{base}.running_mean",
                    f"{base}.running_var",
                    f"{base}.num_batches_tracked",
                }
            elif cfg.norm == "instance_affine":
                params[str(idx)] = {
                    "scale": sd[f"{base}.weight"].astype(np.float32),
                    "bias": sd[f"{base}.bias"].astype(np.float32),
                }
                consumed |= {f"{base}.weight", f"{base}.bias"}
            # plain instance norm: no parameters
    if prelu_vals:
        for v in prelu_vals[1:]:
            if not np.array_equal(v, prelu_vals[0]):
                raise ValueError(
                    "PReLU act weights differ across layers — the reference "
                    "shares one instance; this checkpoint does not match."
                )
        params["prelu"] = {"w": prelu_vals[0]}
    leftovers = {
        k for k in sd if k not in consumed and not k.endswith(
            "num_batches_tracked"
        )
    }
    if leftovers:
        raise ValueError(
            f"Unconsumed checkpoint keys (architecture mismatch?): "
            f"{sorted(leftovers)[:8]}..."
        )
    return params


def params_to_state_dict(plan: UnetPlan, params: Mapping[str, Any]):
    """anatomix_tpu params -> torch-style state dict (numpy values)."""
    cfg = plan.config
    sd: dict[str, np.ndarray] = {}
    for idx, spec in enumerate(plan.layers):
        p = params.get(str(idx))
        base = f"model.{idx}"
        if spec.kind == "conv":
            sd[f"{base}.weight"] = jax_conv_weight_to_torch(
                np.asarray(p["w"], dtype=np.float32), cfg.dimension
            )
            if "b" in p:
                sd[f"{base}.bias"] = np.asarray(p["b"], dtype=np.float32)
        elif spec.kind == "act" and cfg.activation == "prelu":
            sd[f"{base}.weight"] = np.asarray(
                params["prelu"]["w"], dtype=np.float32
            )
        elif spec.kind == "final_act" and cfg.final_act == "prelu":
            sd[f"{base}.weight"] = np.asarray(
                params["final_prelu"]["w"], dtype=np.float32
            )
        elif spec.kind == "norm" and cfg.norm == "batch":
            sd[f"{base}.weight"] = np.asarray(p["scale"], dtype=np.float32)
            sd[f"{base}.bias"] = np.asarray(p["bias"], dtype=np.float32)
            sd[f"{base}.running_mean"] = np.asarray(
                p["mean"], dtype=np.float32
            )
            sd[f"{base}.running_var"] = np.asarray(p["var"], dtype=np.float32)
        elif spec.kind == "norm" and cfg.norm == "instance_affine":
            sd[f"{base}.weight"] = np.asarray(p["scale"], dtype=np.float32)
            sd[f"{base}.bias"] = np.asarray(p["bias"], dtype=np.float32)
    return sd


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a `.pth` file into a numpy state dict (no GPU, no grad)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: _to_numpy(v) for k, v in sd.items()}
