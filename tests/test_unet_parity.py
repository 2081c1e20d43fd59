"""Golden parity: the JAX UNet vs the reference torch UNet (BASELINE cfg 1).

Builds the torch reference model (imported read-only from /root/reference),
converts its randomly initialized state dict with `convert_state_dict`, and
compares features on random volumes. The north-star bound is ≤1e-3; these
tests hold ~1e-5 in fp32.
"""

import sys

import numpy as np
import pytest

from tests.conftest import requires_reference

REF_PATH = "/root/reference"


def _torch_unet(**kwargs):
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    from anatomix.model.network import Unet as TorchUnet

    model = TorchUnet(**kwargs)
    model.eval()
    return model


def _jax_from_torch(model, **kwargs):
    from anatomix_tpu.models.convert import convert_state_dict
    from anatomix_tpu.models.unet import UnetConfig, build_plan

    plan = build_plan(UnetConfig(**kwargs))
    params = convert_state_dict(plan, model.state_dict())
    return plan, params


VARIANT_KWARGS = {
    "anatomix": dict(
        dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16,
    ),
    "anatomix-dev-small": dict(
        # anatomix-dev semantics (instance norm, Avg pool, trilinear) at a
        # test-friendly scale
        dimension=3, input_nc=1, output_nc=8, num_downs=3, ngf=8,
        norm="instance", pooling="Avg", interp="trilinear", norm_eps=1e-2,
    ),
    "nonorm-lrelu": dict(
        dimension=3, input_nc=2, output_nc=4, num_downs=2, ngf=4,
        norm="none", activation="lrelu", pad_type="zeros", pooling="Avg",
    ),
    "residual": dict(
        dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4,
        residual_connection=True,
    ),
    "noskip": dict(
        dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4,
        use_skip_connection=False,
    ),
    "singleconv": dict(
        dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4,
        doubleconv=False,
    ),
}


def _randomize_bn_stats(model, rng):
    """Give batch norms non-trivial running stats so eval mode is exercised."""
    import torch

    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm3d):
            with torch.no_grad():
                mod.running_mean.copy_(
                    torch.from_numpy(
                        rng.standard_normal(
                            mod.running_mean.shape[0]
                        ).astype(np.float32)
                        * 0.1
                    )
                )
                mod.running_var.copy_(
                    torch.from_numpy(
                        (
                            rng.random(mod.running_var.shape[0]) + 0.5
                        ).astype(np.float32)
                    )
                )


@requires_reference
@pytest.mark.parametrize("name", sorted(VARIANT_KWARGS))
def test_unet_forward_parity(rng, name):
    import torch

    from anatomix_tpu.models.unet import unet_apply

    kwargs = VARIANT_KWARGS[name]
    model = _torch_unet(**kwargs)
    _randomize_bn_stats(model, rng)
    plan, params = _jax_from_torch(model, **kwargs)

    size = 16 if kwargs["num_downs"] <= 3 else 32
    x = rng.standard_normal(
        (1, size, size, size, kwargs["input_nc"]), dtype=np.float32
    )
    with torch.no_grad():
        ref = (
            model(torch.from_numpy(np.moveaxis(x, -1, 1)))
            .numpy()
        )
    ref = np.moveaxis(ref, 1, -1)
    got = np.asarray(unet_apply(plan, params, x))
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-12)
    assert err < 1e-3, f"relative max err {err}"
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


@requires_reference
def test_unet_taps_parity(rng):
    """The pretraining tap path: layers=[27,31,38,45,52,65] on the 6M arch."""
    import torch

    from anatomix_tpu.models.unet import unet_apply

    kwargs = VARIANT_KWARGS["anatomix"]
    model = _torch_unet(**kwargs)
    _randomize_bn_stats(model, rng)
    plan, params = _jax_from_torch(model, **kwargs)

    taps = [27, 31, 38, 45, 52, 65]
    x = rng.standard_normal((1, 32, 32, 32, 1), dtype=np.float32)
    with torch.no_grad():
        ref_out, ref_feats = model(
            torch.from_numpy(np.moveaxis(x, -1, 1)), layers=taps
        )
    got_out, got_feats = unet_apply(plan, params, x, layers=taps)
    assert len(got_feats) == len(ref_feats)
    for got, ref in zip(got_feats, ref_feats):
        ref = np.moveaxis(ref.numpy(), 1, -1)
        np.testing.assert_allclose(
            np.asarray(got), ref, atol=5e-4, rtol=1e-3
        )
    np.testing.assert_allclose(
        np.asarray(got_out),
        np.moveaxis(ref_out.numpy(), 1, -1),
        atol=5e-4,
        rtol=1e-3,
    )

    # encode_only early-exits after the last tap
    feats_only = unet_apply(
        plan, params, x, layers=taps, encode_only=True
    )
    assert len(feats_only) == len(taps)
    np.testing.assert_allclose(
        np.asarray(feats_only[0]), np.asarray(got_feats[0]), atol=1e-6
    )


@requires_reference
def test_plan_matches_reference_indices():
    """Structural check: encoder/decoder skip indices match the torch model."""
    from anatomix_tpu.models.unet import UnetConfig, build_plan

    kwargs = VARIANT_KWARGS["anatomix"]
    model = _torch_unet(**kwargs)
    plan = build_plan(UnetConfig(**kwargs))
    assert list(plan.encoder_idx) == model.encoder_idx
    assert list(plan.decoder_idx) == model.decoder_idx
    assert list(plan.res_source) == model.res_source
    assert list(plan.res_dest) == model.res_dest
    assert plan.num_layers == len(model.model)


@requires_reference
def test_param_count_6m():
    import jax

    from anatomix_tpu.models.unet import (
        UnetConfig,
        build_plan,
        init_params,
        param_count,
    )

    plan = build_plan(UnetConfig(**VARIANT_KWARGS["anatomix"]))
    params = init_params(plan, jax.random.PRNGKey(0))
    model = _torch_unet(**VARIANT_KWARGS["anatomix"])
    ref_count = sum(p.numel() for p in model.parameters())
    # JAX params include BN running stats (not torch "parameters"); count
    # trainables only: exclude mean/var.
    trainable = 0
    for sub in params.values():
        for leaf_name, leaf in sub.items():
            if leaf_name not in ("mean", "var"):
                trainable += leaf.size
    assert trainable == ref_count
    assert 5.5e6 < param_count(params) < 7e6


def test_tap_channels():
    """Tap widths for the default NCE layers on the 6M arch
    (SURVEY.md: 128/256/128/64/32/16)."""
    from anatomix_tpu.models.unet import UnetConfig, build_plan

    plan = build_plan(UnetConfig(**VARIANT_KWARGS["anatomix"]))
    assert plan.tap_channels([27, 31, 38, 45, 52, 65]) == (
        128, 256, 128, 64, 32, 16,
    )


@requires_reference
@pytest.mark.slow
def test_golden_parity_full_128(rng):
    """BASELINE config 1: 6M UNet feature extraction on one 128³ volume,
    ≤1e-3 feature error vs the torch reference (CPU-runnable)."""
    import torch

    from anatomix_tpu.extract import make_feature_extractor

    kwargs = VARIANT_KWARGS["anatomix"]
    model = _torch_unet(**kwargs)
    _randomize_bn_stats(model, rng)
    plan, params = _jax_from_torch(model, **kwargs)

    x = rng.standard_normal((1, 128, 128, 128, 1), dtype=np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    ref = np.moveaxis(ref, 1, -1)

    # single 128³ window == direct forward == full strategy
    extract = make_feature_extractor(
        plan, params, strategy="sliding", roi_size=(128, 128, 128),
        sw_batch_size=1,
    )
    import jax.numpy as jnp

    got = np.asarray(extract(jnp.asarray(x)))
    err = np.max(np.abs(got - ref))
    rel = err / (np.max(np.abs(ref)) + 1e-12)
    assert rel < 1e-3, f"relative max err {rel}"


# -----------------------------------------------------------------------------
# PReLU + 1D/2D (reference ConvBlock/Unet support ndims 1-3 and prelu,
# `network.py:59,88-89,194,289`; VERDICT r2 item 7)

@requires_reference
def test_unet_prelu_parity(rng):
    """PReLU: ONE shared learnable scalar across all act slots plus a
    separate final-act instance; non-default weights so the conversion and
    application are actually exercised."""
    import torch

    from anatomix_tpu.models.unet import unet_apply

    kwargs = dict(
        dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4,
        activation="prelu", final_act="prelu",
    )
    model = _torch_unet(**kwargs)
    _randomize_bn_stats(model, rng)
    prelus = [
        m for m in model.modules() if isinstance(m, torch.nn.PReLU)
    ]
    # shared Activation instance + separate FinalActivation instance
    assert len(prelus) == 2
    with torch.no_grad():
        prelus[0].weight.fill_(0.37)
        prelus[1].weight.fill_(-0.11)
    plan, params = _jax_from_torch(model, **kwargs)
    assert float(np.asarray(params["prelu"]["w"])[0]) == pytest.approx(0.37)
    assert float(np.asarray(params["final_prelu"]["w"])[0]) == pytest.approx(
        -0.11
    )

    x = rng.standard_normal((1, 16, 16, 16, 1), dtype=np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    got = np.asarray(unet_apply(plan, params, x))
    np.testing.assert_allclose(
        got, np.moveaxis(ref, 1, -1), atol=5e-4, rtol=1e-3
    )

    # round-trip: our params -> torch state dict loads strict
    from anatomix_tpu.models.convert import params_to_state_dict

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_state_dict(plan, params).items()
    }
    model.load_state_dict(sd, strict=True)


@requires_reference
@pytest.mark.parametrize("dim", [1, 2])
def test_unet_lowdim_parity(rng, dim):
    """1D/2D UNets run as degenerate 3D; outputs match the torch reference."""
    import torch

    from anatomix_tpu.models.unet import unet_apply

    kwargs = dict(
        dimension=dim, input_nc=2, output_nc=4, num_downs=2, ngf=4,
        norm="batch", activation="lrelu",
    )
    model = _torch_unet(**kwargs)
    for mod in model.modules():
        if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
            with torch.no_grad():
                mod.running_mean.copy_(
                    torch.from_numpy(
                        rng.standard_normal(
                            mod.running_mean.shape[0]
                        ).astype(np.float32) * 0.1
                    )
                )
                mod.running_var.copy_(
                    torch.from_numpy(
                        (rng.random(mod.running_var.shape[0]) + 0.5).astype(
                            np.float32
                        )
                    )
                )
    plan, params = _jax_from_torch(model, **kwargs)

    spatial = (32,) * dim
    x = rng.standard_normal((2, *spatial, 2), dtype=np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    got = np.asarray(unet_apply(plan, params, x))
    assert got.shape == x.shape[:-1] + (4,)
    np.testing.assert_allclose(
        got, np.moveaxis(ref, 1, -1), atol=5e-4, rtol=1e-3
    )

    # taps keep the caller's rank
    _, feats = unet_apply(plan, params, x, layers=[plan.num_layers - 1])
    assert feats[0].ndim == x.ndim


@requires_reference
@pytest.mark.parametrize("ndims", [1, 2, 3])
def test_conv_block_reference_parity(rng, ndims):
    """Standalone ConvBlock (`network.py:13-124`) vs our `conv_block`:
    1-3D, instance norm, prelu with a non-default weight."""
    import sys

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import torch
    from anatomix.model.network import ConvBlock as TorchConvBlock

    from anatomix_tpu.models.unet import conv_block
    from anatomix_tpu.ops.conv import torch_conv_weight_to_jax

    blk = TorchConvBlock(
        ndims, 3, 5, kernel_size=3, stride=1, bias=True,
        padding="same", norm="instance", activation="prelu",
        pad_type="reflect",
    )
    blk.eval()
    with torch.no_grad():
        blk.activation.weight.fill_(0.42)

    spatial = (12,) * ndims
    x = rng.standard_normal((2, *spatial, 3), dtype=np.float32)
    with torch.no_grad():
        ref = blk(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    got = np.asarray(
        conv_block(
            x,
            torch_conv_weight_to_jax(blk.conv.weight.detach().numpy()),
            blk.conv.bias.detach().numpy(),
            norm="instance",
            activation="prelu",
            pad_type="reflect",
            prelu_weight=blk.activation.weight.detach().numpy(),
        )
    )
    np.testing.assert_allclose(
        got, np.moveaxis(ref, 1, -1), atol=1e-4, rtol=1e-3
    )


@requires_reference
def test_conv_block_lrelu_slope(rng):
    """ConvBlock's LeakyReLU slope is 0.2 (vs the UNet factory's 0.3)."""
    import sys

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import torch
    from anatomix.model.network import ConvBlock as TorchConvBlock

    from anatomix_tpu.models.unet import conv_block
    from anatomix_tpu.ops.conv import torch_conv_weight_to_jax

    blk = TorchConvBlock(
        2, 2, 4, kernel_size=3, stride=1, bias=False, padding="same",
        norm="none", activation="lrelu",
    )
    blk.eval()
    x = rng.standard_normal((1, 10, 10, 2), dtype=np.float32)
    with torch.no_grad():
        ref = blk(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    got = np.asarray(
        conv_block(
            x,
            torch_conv_weight_to_jax(blk.conv.weight.detach().numpy()),
            None,
            norm="none",
            activation="lrelu",
        )
    )
    np.testing.assert_allclose(
        got, np.moveaxis(ref, 1, -1), atol=1e-5, rtol=1e-4
    )
