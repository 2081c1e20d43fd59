"""End-to-end registration: synthetic misaligned pair -> Dice improves;
CLI runs file-to-file; native NIfTI IO round-trips."""

import os

import numpy as np
import pytest

from anatomix_tpu.registration.pipeline import macro_dice, register_pair
from anatomix_tpu.registration.warp import warp_volume
from anatomix_tpu.utils.nifti import load_volume, read_nifti, save_volume


def _sphere_volume(size, center, radius):
    g = np.stack(
        np.meshgrid(*[np.arange(size)] * 3, indexing="ij"), axis=-1
    ).astype(np.float32)
    dist = np.linalg.norm(g - np.asarray(center, np.float32), axis=-1)
    img = np.clip(1.0 - dist / radius, 0, 1) * 200.0
    seg = (dist < radius).astype(np.float32)
    return img, seg


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    from anatomix_tpu.models.unet import (
        UnetConfig,
        build_plan,
        init_params,
    )

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4)
    )
    return plan, init_params(plan, jax.random.PRNGKey(0))


def test_register_pair_improves_dice(tiny_model):
    import jax.numpy as jnp

    plan, params = tiny_model
    size = 32
    fixed, fixed_seg = _sphere_volume(size, (16, 16, 16), 8)
    moving, moving_seg = _sphere_volume(size, (19, 14, 17), 8)

    disp, case_time = register_pair(
        fixed, moving, plan, params,
        grid_sp=2, disp_hw=1, selected_niter=30, selected_smooth=0,
        grid_sp_adam=2, ic=True,
        extract_strategy="sliding",
    )
    assert disp.shape == (1, size, size, size, 3)
    assert case_time > 0

    moved_seg = np.asarray(
        warp_volume(
            jnp.asarray(moving_seg)[None, ..., None], disp, mode="nearest"
        )
    )[0, ..., 0]
    dice_before = macro_dice(fixed_seg, moving_seg)
    dice_after = macro_dice(fixed_seg, moved_seg)
    assert dice_after > dice_before + 0.1, (dice_before, dice_after)


def test_nifti_roundtrip(tmp_path, rng):
    data = rng.standard_normal((9, 11, 13)).astype(np.float32)
    affine = np.diag([2.0, 2.0, 3.0, 1.0])
    affine[:3, 3] = [-5, 4, 7]

    for name in ["vol.nii", "vol.nii.gz"]:
        p = str(tmp_path / name)
        save_volume(p, data, affine)
        back, aff = load_volume(p)
        np.testing.assert_allclose(back, data, atol=1e-6)
        np.testing.assert_allclose(aff, affine, atol=1e-6)


def test_nifti_matches_nibabel_if_available(tmp_path, rng):
    nib = pytest.importorskip("nibabel")
    if getattr(nib, "load", None) is None:
        pytest.skip("nibabel stubbed by the parity fixture")
    data = rng.standard_normal((5, 6, 7)).astype(np.float32)
    affine = np.eye(4)
    p = str(tmp_path / "x.nii.gz")
    nib.save(nib.Nifti1Image(data, affine), p)
    got, aff = read_nifti(p)
    np.testing.assert_allclose(got, data, atol=1e-6)
    np.testing.assert_allclose(aff, affine, atol=1e-6)


def test_registration_cli(tmp_path, tiny_model, monkeypatch):
    """CLI end-to-end on files, with a stub model source."""
    import anatomix_tpu.registration.pipeline as pipeline_mod
    from anatomix_tpu.registration.cli import main

    plan, params = tiny_model
    monkeypatch.setattr(
        pipeline_mod, "load_model", lambda **kw: (plan, params)
    )

    size = 32
    fixed, fixed_seg = _sphere_volume(size, (16, 16, 16), 8)
    moving, moving_seg = _sphere_volume(size, (18, 15, 16), 8)
    paths = {}
    for name, arr in [
        ("fixed", fixed), ("moving", moving),
        ("fixed_seg", fixed_seg), ("moving_seg", moving_seg),
    ]:
        p = str(tmp_path / f"{name}.nii.gz")
        save_volume(p, arr, np.eye(4))
        paths[name] = p

    outdir = str(tmp_path / "out")
    os.makedirs(outdir)
    main([
        "--fixed", paths["fixed"],
        "--moving", paths["moving"],
        "--exp_name", "test",
        "--ckpt_path", "stub.pth",
        "--selected_niter", "5",
        "--warp_seg",
        "--path_seg_fixed", paths["fixed_seg"],
        "--path_seg_moving", paths["moving_seg"],
        "--result_path", outdir,
    ])
    files = os.listdir(outdir)
    assert any(f.startswith("disp_") for f in files)
    assert any(f.startswith("moved_") for f in files)
    assert any(f.startswith("labels_moved_") for f in files)
    disp, _ = load_volume(
        os.path.join(outdir, [f for f in files if f.startswith("disp_")][0])
    )
    assert disp.shape == (size, size, size, 3)
