"""Pretraining trainer integration: tiny H5 dataset -> a few train iters ->
checkpoints -> resume; plus paired-augmentation semantics."""

import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.pretraining.config import PretrainConfig
from anatomix_tpu.pretraining.dataset import (
    H5TwoViewDataset,
    make_pair_augment,
    normalize_img,
)
from anatomix_tpu.pretraining.schedulers import make_schedule
from anatomix_tpu.pretraining.train import train


def _make_h5(path, n_subjects=3, size=16):
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for i in range(n_subjects):
            g = f.create_group(f"{i:06d}")
            g.create_dataset(
                "img", data=rng.random((2, size, size, size), np.float32)
            )
            g.create_dataset(
                "seg",
                data=rng.integers(0, 3, (size, size, size)).astype(
                    np.uint8
                ),
            )


def _tiny_cfg(tmp_path, **kw):
    base = dict(
        name="t",
        ckpt_dir=str(tmp_path / "ckpt"),
        dataroot=str(tmp_path),
        ndims=3, input_nc=1, output_nc=4, ngf=4, num_downs=2,
        nce_layers=(11, 33), netF_nc=16, n_mlps=2, num_patches=16,
        crop_size=16, batch_size=1,
        n_epochs=1, n_epochs_decay=0,
        print_freq=2, save_latest_freq=2, evaluation_freq=2,
        n_val_during_train=1, max_iters=3,
        data_parallel_devices=1,
    )
    base.update(kw)
    return PretrainConfig(**base)


def test_normalize_img():
    arr = np.linspace(0, 100, 1000).astype(np.float32)
    out = normalize_img(arr, percentile=None, zero_centered=True)
    assert out.min() == -1.0 and out.max() == 1.0
    out01 = normalize_img(arr, percentile=99.0, zero_centered=False)
    assert out01.min() == 0.0 and out01.max() > 1.0  # percentile clips top


def test_dataset_two_distinct_views(tmp_path):
    path = str(tmp_path / "train_data.hdf5")
    _make_h5(path)
    cfg = _tiny_cfg(tmp_path)
    ds = H5TwoViewDataset(path, cfg)
    rng = np.random.default_rng(0)
    a, b, seg = ds.get(0, rng)
    assert a.shape == (16, 16, 16) and seg.shape == (16, 16, 16)
    assert not np.allclose(a, b)  # distinct timepoints
    ds.close()


def test_pair_augment_shared_spatial(tmp_path):
    """Spatial transforms are shared across views: augmenting two IDENTICAL
    views must keep them identical when per-view intensity augs are off."""
    cfg = _tiny_cfg(tmp_path, inten_augment=False)
    aug = make_pair_augment(cfg)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((16, 16, 16)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 3, (16, 16, 16)).astype(np.float32))
    for s in range(4):
        views, seg_out = aug(jax.random.PRNGKey(s), img, img, seg)
        assert views.shape == (2, 16, 16, 16, 1)
        assert seg_out.shape == (16, 16, 16, 1)
        np.testing.assert_allclose(
            np.asarray(views[0]), np.asarray(views[1]), atol=1e-5
        )


def test_pair_augment_same_intensity_flag(tmp_path):
    cfg = _tiny_cfg(tmp_path, apply_same_inten_augment=True)
    aug = make_pair_augment(cfg)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((16, 16, 16)).astype(np.float32))
    seg = jnp.zeros((16, 16, 16), jnp.float32)
    views, _ = aug(jax.random.PRNGKey(0), img, img, seg)
    np.testing.assert_allclose(
        np.asarray(views[0]), np.asarray(views[1]), atol=1e-4
    )


def test_schedule_const_linear():
    sched = make_schedule(
        1.0, "const_linear", n_epochs=2, n_epochs_decay=3, steps_per_epoch=10
    )
    assert float(sched(0)) == 1.0
    assert float(sched(19)) == 1.0  # still in constant phase
    assert float(sched(29)) == 1.0  # epoch 2: 1 - max(0, 2-2)/(3+1) = 1
    assert float(sched(39)) == 0.75  # epoch 3: 1 - 1/4
    assert float(sched(49)) == 0.5  # epoch 4: 1 - 2/4


def test_trainer_runs_and_resumes(tmp_path):
    _make_h5(str(tmp_path / "train_data.hdf5"))
    _make_h5(str(tmp_path / "val_data.hdf5"), n_subjects=1)
    cfg = _tiny_cfg(tmp_path)
    state = train(cfg)
    assert int(state.step) == 3
    run_dir = os.path.join(cfg.ckpt_dir, cfg.name)
    assert os.path.exists(os.path.join(run_dir, "latest_train_state.npz"))
    assert os.path.exists(os.path.join(run_dir, "latest_net_G.npz"))
    assert os.path.exists(os.path.join(run_dir, "train_opt.json"))
    assert os.path.exists(os.path.join(run_dir, "2_net_G.npz"))
    assert os.path.exists(os.path.join(run_dir, "best_val_net_G.npz"))

    # resume: continue to 5 iters
    cfg2 = _tiny_cfg(tmp_path, continue_train=True, max_iters=5)
    state2 = train(cfg2)
    assert int(state2.step) == 5
