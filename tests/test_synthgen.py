"""Synthetic-data pipeline tests: utils, label ensembles, paired views,
HDF5 packing, end-to-end into the pretraining dataset."""

import os
from glob import glob

import numpy as np
import pytest

from anatomix_tpu.synthgen import (
    apply_random_affine_transform,
    crop_and_pad_3d_volume,
    draw_perlin,
    generate_training_data,
    generate_voxel_sphere,
    merge_vertebrae_and_ribs,
    sample_corruption,
    sample_gmm,
    transform_uniform,
    view_corruption_chain,
)
from anatomix_tpu.utils.nifti import save_volume


def test_voxel_sphere():
    s = generate_voxel_sphere(5, (16, 16, 16))
    assert s[8, 8, 8] == 1 and s[0, 0, 0] == 0
    vol = s.sum()
    assert 0.7 * 4 / 3 * np.pi * 125 < vol < 1.3 * 4 / 3 * np.pi * 125


def test_perlin_multiscale():
    rng = np.random.default_rng(0)
    p = draw_perlin((16, 16, 16), (4, 8), 1.0, 2.0, rng)
    assert p.shape == (16, 16, 16)
    assert p.std() > 0.3  # non-degenerate


def test_sample_corruption_mask():
    rng = np.random.default_rng(1)
    m = sample_corruption((32, 32, 32), rng=rng)
    assert set(np.unique(m)).issubset({0.0, 1.0})


def test_crop_and_pad():
    vol = np.zeros((20, 20, 20))
    vol[5:9, 6:10, 7:11] = 3
    out = crop_and_pad_3d_volume(vol, (16, 16, 16))
    assert out.shape == (16, 16, 16)
    assert out.sum() == vol.sum()


def test_affine_preserves_labels():
    rng = np.random.default_rng(2)
    vol = rng.integers(0, 4, (16, 16, 16)).astype(np.uint8)
    out = apply_random_affine_transform(vol, rng=rng)
    assert set(np.unique(out)).issubset(set(np.unique(vol)))


def test_sample_gmm():
    rng = np.random.default_rng(3)
    label = np.zeros((12, 12, 12), np.uint8)
    label[4:, ...] = 1
    img = sample_gmm(
        transform_uniform(rng.random(2), 25, 255),
        transform_uniform(rng.random(2), 5, 20),
        label,
        zero_bckgnd=0.0,
        rng=rng,
    )
    assert img.min() == 0.0 and img.max() == 1.0
    assert img[5:, 2, 2].std() > 0  # GMM noise present


def test_view_corruption_chain():
    rng = np.random.default_rng(4)
    x = rng.random((16, 16, 16))
    out = view_corruption_chain(x, rng)
    assert out.shape == x.shape
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6
    assert np.isfinite(out).all()


def test_merge_vertebrae_and_ribs(tmp_path):
    sub = tmp_path / "subj"
    out = tmp_path / "out"
    os.makedirs(sub)
    eye = np.eye(4)
    save_volume(str(sub / "rib_1.nii.gz"),
                np.ones((4, 4, 4), np.uint8), eye)
    save_volume(str(sub / "rib_2.nii.gz"),
                np.ones((4, 4, 4), np.uint8) * 0, eye)  # blank, merged ok
    save_volume(str(sub / "vertebrae_C1.nii.gz"),
                np.ones((4, 4, 4), np.uint8), eye)
    save_volume(str(sub / "liver.nii.gz"),
                np.ones((4, 4, 4), np.uint8), eye)
    save_volume(str(sub / "spleen.nii.gz"),
                np.zeros((4, 4, 4), np.uint8), eye)  # blank -> dropped
    n = merge_vertebrae_and_ribs(str(sub), str(out))
    files = sorted(os.listdir(out))
    assert "all_ribs.nii.gz" in files
    assert "all_vertebrae.nii.gz" in files
    assert "liver.nii.gz" in files
    assert "spleen.nii.gz" not in files
    assert n == 3


@pytest.mark.slow
def test_end_to_end_generation_feeds_pretraining(tmp_path):
    """step1 -> step2 -> step3 at 32³, then load through H5TwoViewDataset."""
    templates = tmp_path / "templates"
    os.makedirs(templates)
    rng = np.random.default_rng(0)
    for i in range(3):
        vol = generate_voxel_sphere(
            int(rng.integers(4, 9)), (24, 24, 24),
            rng.integers(-4, 4, 3),
        )
        save_volume(str(templates / f"organ{i}.nii.gz"),
                    vol.astype(np.uint8), np.eye(4))

    h5_path = generate_training_data(
        str(templates), str(tmp_path / "work"), n_vols=2, val_count=0,
        sidelen=32, max_workers=0, seed=7,
    )
    assert os.path.exists(h5_path)

    from anatomix_tpu.pretraining.config import PretrainConfig
    from anatomix_tpu.pretraining.dataset import H5TwoViewDataset

    cfg = PretrainConfig(crop_size=32, batch_size=1)
    ds = H5TwoViewDataset(h5_path, cfg)
    assert len(ds.subjects) == 2
    a, b, seg = ds.get(0, np.random.default_rng(0))
    assert a.shape == (32, 32, 32)
    assert seg.shape == (32, 32, 32)
    assert not np.allclose(a, b)
    assert seg.max() >= 1  # ensembles produced multiple labels
    ds.close()
