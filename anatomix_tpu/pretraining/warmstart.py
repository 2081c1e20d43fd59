"""Warm-start / partial checkpoint loading.

Mirrors the reference `BaseModel` behaviors (`/root/reference/pretraining/
models/base_model.py`): a graceful *partial load* that re-initializes only
output-head parameters when their shapes changed and hard-fails on any
other mismatch (`base_model.py:267-388`), and the three-way load precedence
continue_train > pretrained_name > pretrained_G_only_ckpt
(`base_model.py:119-143`).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from anatomix_tpu.models.unet import UnetPlan


def head_layer_keys(plan: UnetPlan) -> set[str]:
    """Parameter keys of the output head (the final conv layer)."""
    last_conv = max(
        i for i, s in enumerate(plan.layers) if s.kind == "conv"
    )
    return {str(last_conv)}


def load_partial(
    plan: UnetPlan,
    current: dict[str, Any],
    loaded: dict[str, Any],
) -> dict[str, Any]:
    """Merge `loaded` into `current`: exact-shape keys are taken from the
    checkpoint; output-head keys may keep their fresh init when shapes
    differ; any other mismatch raises."""
    head = head_layer_keys(plan)
    merged: dict[str, Any] = {}
    reinit: list[str] = []
    for key, cur_sub in current.items():
        if key not in loaded:
            if key in head:
                reinit.append(key)
                merged[key] = cur_sub
                continue
            raise ValueError(f"Checkpoint is missing layer {key}")
        new_sub = {}
        for leaf, cur_val in cur_sub.items():
            loaded_val = loaded[key].get(leaf)
            if loaded_val is not None and np.shape(loaded_val) == np.shape(
                cur_val
            ):
                new_sub[leaf] = loaded_val
            elif key in head:
                reinit.append(f"{key}.{leaf}")
                new_sub[leaf] = cur_val
            else:
                raise ValueError(
                    f"Shape mismatch at {key}.{leaf}: checkpoint "
                    f"{np.shape(loaded_val)} vs model {np.shape(cur_val)}"
                )
        merged[key] = new_sub
    if reinit:
        print(f"Partially loaded; re-initialized head params: {reinit}")
    return merged


def resolve_warm_start(
    run_dir: str,
    *,
    continue_train: bool = False,
    pretrained_name: str | None = None,
    pretrained_g_only_ckpt: str | None = None,
    ckpt_root: str | None = None,
):
    """Return (g_ckpt_path, f_ckpt_path, resume_state_path) per the
    reference precedence. Any component may be None."""
    if continue_train:
        state = os.path.join(run_dir, "latest_train_state.npz")
        if os.path.exists(state):
            return None, None, state
        print("continue_train set but no train state found; starting fresh")
    if pretrained_name and pretrained_name != "None":
        base = os.path.join(ckpt_root or os.path.dirname(run_dir),
                            pretrained_name)
        return (
            os.path.join(base, "latest_net_G.npz"),
            os.path.join(base, "latest_net_F.npz"),
            None,
        )
    if pretrained_g_only_ckpt and pretrained_g_only_ckpt != "None":
        return pretrained_g_only_ckpt, None, None
    return None, None, None


class EarlyStopping:
    """Validation-loss early stopping (`pretraining_networks.py`, present in
    the reference API though unused by its loop)."""

    def __init__(self, patience: int = 7, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = float("inf")
        self.counter = 0
        self.should_stop = False

    def step(self, val_loss: float) -> bool:
        if val_loss < self.best - self.min_delta:
            self.best = val_loss
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop
