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


def test_train_step_lr_scale():
    """state.lr_scale multiplies the compiled schedule: scale 0 must freeze
    the parameters without retracing the step."""
    from anatomix_tpu.models.unet import UnetConfig, build_plan
    from anatomix_tpu.pretraining.train_step import (
        build_train_step,
        init_train_state,
    )

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4)
    )
    taps = (plan.encoder_idx[-1], plan.num_layers - 1)
    state = init_train_state(
        plan, jax.random.PRNGKey(0), tap_layers=taps, num_patches=8,
        netf_nc=16, lr=1e-2,
    )
    step = build_train_step(
        plan, tap_layers=taps, num_patches=8, nce_temperature=0.33,
        lr=1e-2, donate=False,
    )
    rng = np.random.default_rng(0)
    views = jnp.asarray(
        rng.standard_normal((1, 2, 16, 16, 16, 1)).astype(np.float32)
    )
    segs = jnp.asarray(rng.integers(0, 3, (1, 16, 16, 16, 1)), jnp.int32)

    frozen = state.replace(lr_scale=jnp.zeros((), jnp.float32))
    out0, _ = step(frozen, views, segs, jax.random.PRNGKey(1))
    w_before = np.asarray(state.params_g["0"]["w"])
    np.testing.assert_allclose(
        np.asarray(out0.params_g["0"]["w"]), w_before
    )

    out1, m1 = step(state, views, segs, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out1.params_g["0"]["w"]), w_before)
    np.testing.assert_allclose(float(m1["lr"]), 1e-2, rtol=1e-6)


def test_trainer_plateau_policy(tmp_path, monkeypatch):
    """lr_policy=plateau: stagnating val loss drops the LR by `factor`
    after `patience` bad evals (reference ReduceLROnPlateau semantics)."""
    import anatomix_tpu.pretraining.train as train_mod

    _make_h5(str(tmp_path / "train_data.hdf5"))
    _make_h5(str(tmp_path / "val_data.hdf5"), n_subjects=1)
    monkeypatch.setattr(
        train_mod, "compute_val_loss",
        lambda *a, **k: 1.0,  # perfectly stagnant val loss
    )
    cfg = _tiny_cfg(
        tmp_path, lr_policy="plateau", evaluation_freq=1, max_iters=8,
        n_epochs=4, save_latest_freq=100, print_freq=100,
    )
    state = train_mod.train(cfg)
    # evals 2..8 are all bad; patience 5 -> drop at the 7th eval
    assert float(state.lr_scale) == 0.5
    import json

    run_dir = os.path.join(cfg.ckpt_dir, cfg.name)
    with open(os.path.join(run_dir, "plateau_state.json")) as f:
        saved = json.load(f)
    assert saved["lr"] == cfg.lr * 0.5


def test_trainer_visual_dumps(tmp_path):
    """save_latest cadence dumps live view/seg volumes under visuals/
    (reference `trainers/train.py:302-309`)."""
    _make_h5(str(tmp_path / "train_data.hdf5"))
    cfg = _tiny_cfg(tmp_path, save_latest_freq=2, display_freq=2)
    train(cfg)
    vis = os.path.join(cfg.ckpt_dir, cfg.name, "visuals")
    for name in ("latest_view1.nii.gz", "latest_view2.nii.gz",
                 "latest_seg.nii.gz"):
        assert os.path.exists(os.path.join(vis, name)), name
    from anatomix_tpu.utils.nifti import read_nifti

    vol, _ = read_nifti(os.path.join(vis, "latest_view1.nii.gz"))
    assert vol.shape == (16, 16, 16)


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
