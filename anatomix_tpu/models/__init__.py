"""Model core: UNet, variant registry, checkpoint conversion, ViT."""

from anatomix_tpu.models.registry import ANATOMIX_VARIANTS, DEFAULT_REPO
from anatomix_tpu.models.unet import (
    LayerSpec,
    Unet,
    UnetConfig,
    UnetPlan,
    build_plan,
    init_params,
    param_count,
    unet_apply,
)
from anatomix_tpu.models.convert import (
    convert_state_dict,
    params_to_state_dict,
    strip_prefixes,
)
from anatomix_tpu.models.load import (
    load_from_hf,
    load_model,
    load_npz,
    save_npz,
)

__all__ = [
    "ANATOMIX_VARIANTS",
    "DEFAULT_REPO",
    "LayerSpec",
    "Unet",
    "UnetConfig",
    "UnetPlan",
    "build_plan",
    "convert_state_dict",
    "init_params",
    "load_from_hf",
    "load_model",
    "load_npz",
    "param_count",
    "params_to_state_dict",
    "save_npz",
    "strip_prefixes",
    "unet_apply",
]
