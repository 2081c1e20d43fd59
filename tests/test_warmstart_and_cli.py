"""Warm-start precedence/partial load, extraction CLI, visualization utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.pretraining.warmstart import (
    EarlyStopping,
    head_layer_keys,
    load_partial,
    resolve_warm_start,
)


def test_load_partial_exact_and_head_reinit():
    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4)
    )
    cur = init_params(plan, jax.random.PRNGKey(0))
    src = init_params(plan, jax.random.PRNGKey(1))
    merged = load_partial(plan, cur, src)
    np.testing.assert_array_equal(
        np.asarray(merged["0"]["w"]), np.asarray(src["0"]["w"])
    )

    # output head with different width: head keeps fresh init
    plan2 = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=7, num_downs=2, ngf=4)
    )
    cur2 = init_params(plan2, jax.random.PRNGKey(2))
    merged2 = load_partial(plan2, cur2, src)
    head = head_layer_keys(plan2)
    for key in head:
        np.testing.assert_array_equal(
            np.asarray(merged2[key]["w"]), np.asarray(cur2[key]["w"])
        )

    # non-head mismatch raises
    bad = {k: dict(v) for k, v in src.items()}
    bad["0"]["w"] = np.zeros((3, 3, 3, 2, 4), np.float32)
    with pytest.raises(ValueError, match="Shape mismatch"):
        load_partial(plan, cur, bad)


def test_resolve_warm_start_precedence(tmp_path):
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    # nothing set -> all None
    assert resolve_warm_start(run_dir) == (None, None, None)
    # pretrained_G_only
    g, f, r = resolve_warm_start(
        run_dir, pretrained_g_only_ckpt="/x/net_G.npz"
    )
    assert g == "/x/net_G.npz" and f is None and r is None
    # pretrained_name beats G-only
    g, f, r = resolve_warm_start(
        run_dir, pretrained_name="other",
        pretrained_g_only_ckpt="/x/net_G.npz",
        ckpt_root=str(tmp_path),
    )
    assert g.endswith("other/latest_net_G.npz")
    assert f.endswith("other/latest_net_F.npz")
    # continue_train beats all (when state exists)
    state = os.path.join(run_dir, "latest_train_state.npz")
    open(state, "wb").close()
    g, f, r = resolve_warm_start(
        run_dir, continue_train=True, pretrained_name="other",
        ckpt_root=str(tmp_path),
    )
    assert r == state and g is None


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert not es.step(1.0)
    assert not es.step(0.9)
    assert not es.step(0.95)
    assert es.step(0.91)  # second non-improvement -> stop
    assert es.should_stop


def test_extract_cli(tmp_path, monkeypatch):
    import anatomix_tpu.extract_cli as cli
    from anatomix_tpu.utils.nifti import save_volume

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4)
    )
    params = init_params(plan, jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "load_model", lambda **kw: (plan, params))

    vol = np.random.default_rng(0).random((20, 18, 16)).astype(np.float32)
    inp = str(tmp_path / "in.nii.gz")
    save_volume(inp, vol, np.eye(4))
    out = str(tmp_path / "out.npz")
    cli.main([
        "--input", inp, "--output", out, "--ckpt_path", "stub",
        "--strategy", "full", "--normalize", "unit",
    ])
    z = np.load(out)
    assert z["features"].shape == (20, 18, 16, 4)
    norms = np.linalg.norm(z["features"], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_extract_cli_dataset_mode(tmp_path, monkeypatch):
    """Dataset mode: loader/writer pipeline over a directory; one output
    per input, equal to the single-volume path's output."""
    import anatomix_tpu.extract_cli as cli
    from anatomix_tpu.utils.nifti import save_volume

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4)
    )
    params = init_params(plan, jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "load_model", lambda **kw: (plan, params))

    rng = np.random.default_rng(1)
    in_dir = tmp_path / "scans"
    out_dir = tmp_path / "feats"
    in_dir.mkdir()
    for name in ["a", "b", "c"]:
        vol = rng.random((20, 18, 16)).astype(np.float32)
        save_volume(str(in_dir / f"{name}.nii.gz"), vol, np.eye(4))

    cli.main([
        "--input_dir", str(in_dir), "--output_dir", str(out_dir),
        "--ckpt_path", "stub", "--strategy", "full",
    ])
    outs = sorted(os.listdir(out_dir))
    assert outs == ["a.npz", "b.npz", "c.npz"]

    # parity with the single-volume path on one of them
    single = str(tmp_path / "b_single.npz")
    cli.main([
        "--input", str(in_dir / "b.nii.gz"), "--output", single,
        "--ckpt_path", "stub", "--strategy", "full",
    ])
    np.testing.assert_array_equal(
        np.load(out_dir / "b.npz")["features"],
        np.load(single)["features"],
    )


def test_extract_cli_dataset_mode_empty_dir(tmp_path, monkeypatch):
    import pytest

    import anatomix_tpu.extract_cli as cli

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4)
    )
    params = init_params(plan, jax.random.PRNGKey(0))
    monkeypatch.setattr(cli, "load_model", lambda **kw: (plan, params))
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        cli.main([
            "--input_dir", str(tmp_path / "empty"),
            "--output_dir", str(tmp_path / "out"),
            "--ckpt_path", "stub",
        ])


def test_visualization_utils(tmp_path):
    from anatomix_tpu.utils.visualization import (
        panel_figure,
        save_tensor,
        tensor2img,
    )

    vol = np.random.default_rng(0).random((8, 8, 8)).astype(np.float32)
    img = tensor2img(vol)
    assert img.shape == (8, 8)
    assert img.min() >= 0 and img.max() <= 1
    fig = panel_figure({"a": vol, "b": vol})
    assert fig is not None  # matplotlib available in this env
    save_tensor(vol, str(tmp_path / "t.nii.gz"))
    assert os.path.exists(tmp_path / "t.nii.gz")


def test_profiling_utils():
    from anatomix_tpu.utils.profiling import EMATimer, annotate

    t = EMATimer()
    t.start()
    v = t.stop()
    assert v >= 0
    with annotate("test-region"):
        _ = jnp.ones(4) + 1
