"""Few-shot segmentation data handling.

Matches `data_handler` (`/root/reference/anatomix/segmentation/
segmentation_utils.py:235-305`): natural-sorted globs of
imagesTr/labelsTr/imagesVal/labelsVal, a seeded (12345) permutation, the
first `finetuning_amount` pairs, replicated ×(iters·bs // amount) to fill an
epoch. The natural sort is implemented locally (no natsort dependency).
"""

from __future__ import annotations

import os
import re
from glob import glob

import numpy as np


def natsorted(items):
    """Natural sort: numeric runs compare numerically ('img2' < 'img10')."""

    def key(s):
        return [
            int(tok) if tok.isdigit() else tok.lower()
            for tok in re.split(r"(\d+)", str(s))
        ]

    return sorted(items, key=key)


def data_handler(
    basedir: str,
    finetuning_amount: int = 3,
    iters_per_epoch: int = 75,
    batch_size: int = 3,
    seed: int = 12345,
    ext: str = "*.nii.gz",
):
    trimages = natsorted(glob(os.path.join(basedir, "imagesTr", ext)))
    trsegs = natsorted(glob(os.path.join(basedir, "labelsTr", ext)))
    assert len(trimages) > 0
    assert len(trimages) == len(trsegs)

    trimages = (
        np.random.RandomState(seed=seed).permutation(trimages).tolist()
    )
    trsegs = np.random.RandomState(seed=seed).permutation(trsegs).tolist()
    trimages = trimages[:finetuning_amount]
    trsegs = trsegs[:finetuning_amount]

    samples_per_epoch = iters_per_epoch * batch_size
    repeats = max(1, samples_per_epoch // finetuning_amount)
    trimages = trimages * repeats
    trsegs = trsegs * repeats

    vaimages = natsorted(glob(os.path.join(basedir, "imagesVal", ext)))
    vasegs = natsorted(glob(os.path.join(basedir, "labelsVal", ext)))
    return trimages, trsegs, vaimages, vasegs


class VolumeCache:
    """In-memory volume cache (the reference uses MONAI CacheDataset with
    cache_rate 1.0 — everything lives in RAM)."""

    def __init__(self):
        self._cache: dict[str, np.ndarray] = {}

    def get(self, path: str) -> np.ndarray:
        if path not in self._cache:
            from anatomix_tpu.utils.nifti import load_volume

            self._cache[path] = np.asarray(
                load_volume(path)[0], np.float32
            )
        return self._cache[path]
