"""Few-shot semantic segmentation finetuning.

Public surface mirrors the reference's `anatomix/segmentation/__init__.py`:
`load_model, get_train_transforms, get_val_transforms, data_handler,
save_ckp` equivalents.
"""

from anatomix_tpu.segmentation.data import VolumeCache, data_handler, natsorted
from anatomix_tpu.segmentation.losses import (
    cross_entropy_loss,
    dice_ce_loss,
    dice_loss,
)
from anatomix_tpu.segmentation.model import (
    apply_head,
    init_head,
    load_seg_model,
    seg_forward,
)
from anatomix_tpu.segmentation.transforms import train_transform, val_transform

load_model = load_seg_model  # reference-compatible alias

__all__ = [
    "VolumeCache",
    "apply_head",
    "cross_entropy_loss",
    "data_handler",
    "dice_ce_loss",
    "dice_loss",
    "init_head",
    "load_model",
    "load_seg_model",
    "natsorted",
    "seg_forward",
    "train_transform",
    "val_transform",
]
