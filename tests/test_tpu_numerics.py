"""Real-TPU numerics tier (VERDICT r1 item 10).

The default CI suite validates the Pallas kernels only in interpret mode on
CPU (which emulates bf16 dot numerics); this tier re-checks them with the
real Mosaic compiler on the bench chip so kernel regressions (tile layouts,
DMA alignment, segment-id masking) are caught by a repeatable test instead
of ad-hoc bench runs.

Run: ANATOMIX_TPU_TESTS=1 python -m pytest tests/test_tpu_numerics.py -m tpu -q
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _rel_err(got, ref32):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref32, np.float32)
    return float(np.abs(got - ref).mean() / (ref.std() + 1e-8))


@pytest.fixture(scope="module")
def vol128():
    return jax.jit(
        lambda k: jax.random.normal(k, (1, 128, 128, 128, 1), jnp.float32)
    )(jax.random.PRNGKey(0))


def test_fused_unet_matches_xla_6m(vol128):
    """Fused block-space Pallas UNet (bf16) tracks the f32 XLA ground truth
    as closely as the bf16 XLA path does (PERF.md: 1.05% vs 1.01%)."""
    from anatomix_tpu.extract import make_feature_extractor
    from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4,
                   ngf=16)
    )
    params = init_params(plan, jax.random.PRNGKey(1))

    def run(conv_impl, dtype):
        ext = make_feature_extractor(
            plan, params, strategy="full", conv_impl=conv_impl,
            compute_dtype=dtype,
        )
        return np.asarray(ext.impl(vol128, ext.arrays))

    ref32 = run("xla", jnp.float32)
    xla_bf16 = run("xla", jnp.bfloat16)
    fused = run("pallas_fused", jnp.bfloat16)

    e_xla = _rel_err(xla_bf16, ref32)
    e_fused = _rel_err(fused, ref32)
    assert e_fused < 3e-2, f"fused error {e_fused:.4f}"
    assert e_fused < 2.5 * e_xla + 1e-3, (
        f"fused {e_fused:.4f} vs xla-bf16 {e_xla:.4f}"
    )


def test_fused_unet_instance_norm_trilinear():
    """The dev-model fused path (live instance norms + trilinear decoders)
    matches the f32 XLA path on hardware."""
    from anatomix_tpu.extract import make_feature_extractor
    from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=32, num_downs=3,
                   ngf=32, norm="instance", pooling="Avg",
                   interp="trilinear", norm_eps=1e-2)
    )
    params = init_params(plan, jax.random.PRNGKey(2))
    vol = jax.jit(
        lambda k: jax.random.normal(k, (1, 64, 64, 64, 1), jnp.float32)
    )(jax.random.PRNGKey(3))

    def run(conv_impl, dtype):
        ext = make_feature_extractor(
            plan, params, strategy="full", conv_impl=conv_impl,
            compute_dtype=dtype,
        )
        return np.asarray(ext.impl(vol, ext.arrays))

    ref32 = run("xla", jnp.float32)
    fused = run("pallas_fused", jnp.bfloat16)
    assert _rel_err(fused, ref32) < 3e-2


def test_train_conv_grads_match_xla_hw():
    """Custom-VJP sparse training convs: value + dx/dw/db grads vs XLA on
    real hardware (the CI variant runs interpret-mode only)."""
    from anatomix_tpu.ops.conv import conv3d
    from anatomix_tpu.ops.pallas.conv_block_train import conv3x3_same_train

    rng = np.random.default_rng(0)
    ci, co = 16, 16
    x = jnp.asarray(
        rng.standard_normal((2, 16, 16, 16, ci)).astype(np.float32)
    )
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.1
    )
    b = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    t = jnp.asarray(
        rng.standard_normal((2, 16, 16, 16, co)).astype(np.float32)
    )

    def loss_ref(x, w, b):
        y = jnp.maximum(
            conv3d(x, w, b, padding="SAME", pad_type="reflect",
                   compute_dtype=jnp.float32), 0
        )
        return jnp.sum((y - t) ** 2)

    def loss_fused(x, w, b):
        y = conv3x3_same_train(
            x, w, b, act="relu", pad_type="reflect",
            compute_dtype=jnp.float32,
        )
        return jnp.sum((y - t) ** 2)

    ref_val, ref_g = jax.jit(
        jax.value_and_grad(loss_ref, argnums=(0, 1, 2))
    )(x, w, b)
    got_val, got_g = jax.jit(
        jax.value_and_grad(loss_fused, argnums=(0, 1, 2))
    )(x, w, b)
    assert abs(float(got_val) - float(ref_val)) / abs(float(ref_val)) < 1e-2
    for name, r, g in zip("xwb", ref_g, got_g):
        r, g = np.asarray(r), np.asarray(g)
        denom = np.abs(r).max() + 1e-8
        assert np.abs(g - r).max() / denom < 2e-2, f"d{name}"


def test_flash_attention_matches_einsum_hw():
    """The real flash kernel (used for N >= 1024 on TPU) vs the einsum
    softmax path, including the pad + segment-id masking (N=4104 is the
    128³/8³-patch + 8 registers production shape)."""
    from anatomix_tpu.models.vit3d.primus import _flash_attention

    B, H, N, hd = 1, 2, 4104, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (B, H, N, hd), jnp.float32)
    q, k, v = mk(kq), mk(kk), mk(kv)
    scale = 1.0 / math.sqrt(hd)

    @jax.jit
    def flash(q, k, v):
        return _flash_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), scale,
        )

    @jax.jit
    def ref(q, k, v):
        logits = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v,
            preferred_element_type=jnp.float32,
        )

    out = np.asarray(flash(q, k, v), np.float32)
    want = np.asarray(ref(q, k, v), np.float32)
    assert _rel_err(out, want) < 2e-2


def test_conv_down2_matches_xla_hw():
    """Stride-2 block->dense down conv kernel == XLA stride-2 conv on HW
    (interpret mode cannot catch DMA alignment / layout faults)."""
    from anatomix_tpu.ops.conv import conv3d
    from anatomix_tpu.ops.pallas.conv_down import (
        conv_down2_block,
        pack_down2_weights,
    )
    from anatomix_tpu.ops.pallas.reshuffle import space_to_depth

    rng = np.random.default_rng(0)
    for (D, Ci, Co) in [(64, 32, 64), (32, 64, 128)]:
        x = jnp.asarray(
            rng.standard_normal((1, D, D, D, Ci)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, Ci, Co)).astype(np.float32)
            * (1.0 / math.sqrt(27 * Ci))
        )
        b = jnp.asarray(rng.standard_normal((Co,)).astype(np.float32))
        ref = conv3d(
            x, w, b, stride=2, padding=[(1, 1)] * 3,
            compute_dtype=jnp.bfloat16,
        )
        xb = space_to_depth(x)
        w0, w1 = pack_down2_weights(np.asarray(w, np.float32))
        got = conv_down2_block(
            xb,
            jnp.asarray(w0).astype(jnp.bfloat16),
            jnp.asarray(w1).astype(jnp.bfloat16),
            b[None],
            act="none", out_dtype=jnp.bfloat16,
        )
        assert _rel_err(got, np.asarray(ref, np.float32)) < 2e-2


@pytest.mark.parametrize("mode", ["gaussian", "constant"])
def test_blend_scatter_kernel_matches_xla_hw(monkeypatch, mode):
    """Roll-only blend-scatter kernel (in-place aliased canvas RMW +
    dynamic lane roll) == the XLA lane-folded scan on real hardware —
    the v1 design passed interpret/CPU but crashed the Mosaic DMA
    engine, so HW coverage is the whole point of this test."""
    from anatomix_tpu.ops.sliding_window import sliding_window_inference

    rng = np.random.default_rng(0)
    vol = jnp.asarray(
        rng.standard_normal((1, 64, 64, 64, 16)).astype(np.float32)
    )

    def apply_fn(w):
        return w * 2.0 + 1.0

    kw = dict(
        out_channels=16, roi_size=(32, 32, 32), sw_batch_size=4,
        overlap=0.5, mode=mode,
    )
    monkeypatch.setenv("ANATOMIX_SCATTER_KERNEL", "0")
    ref = np.asarray(sliding_window_inference(vol, apply_fn, **kw))
    monkeypatch.setenv("ANATOMIX_SCATTER_KERNEL", "1")
    got = np.asarray(sliding_window_inference(vol, apply_fn, **kw))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_max_pool2x_vjp_matches_xla_hw():
    """XLA's select-and-scatter adjoint (the production max_pool backward
    since the wave-27 revert) == the retired argmax-routed VJP on real
    hardware, including tie routing. The custom VJP is pinned bit-exact
    to torch's first-max rule by the CPU test, so this transfers torch
    tie parity to the HW select-and-scatter lowering (VERDICT r3 #3)."""
    from anatomix_tpu.ops.pool import _max_pool2x, _reduce_max

    rng = np.random.default_rng(0)
    # quantize to a handful of levels so windows contain ties
    x = jnp.asarray(
        np.round(rng.standard_normal((2, 16, 16, 16, 8)) * 2.0) / 2.0,
        jnp.float32,
    )
    dy = jnp.asarray(
        rng.standard_normal((2, 8, 8, 8, 8)).astype(np.float32)
    )

    def loss_custom(x):
        return jnp.sum(_max_pool2x(x) * dy)

    def loss_xla(x):
        return jnp.sum(_reduce_max(x, (2, 2, 2), (2, 2, 2)) * dy)

    g_custom = np.asarray(jax.jit(jax.grad(loss_custom))(x))
    g_xla = np.asarray(jax.jit(jax.grad(loss_xla))(x))
    np.testing.assert_allclose(g_custom, g_xla, rtol=0, atol=0)


def test_batch_norm_train_bf16_fold_hw():
    """bf16 folded-affine batch_norm_train apply tracks the f32 path on
    real hardware, including the large-DC-offset regime (post-ReLU-like
    N(50, 1) inputs) that the subtract-first form exists for (ADVICE r3;
    VERDICT r3 #3 asks for HW coverage of this default train-path
    numerics change)."""
    from anatomix_tpu.ops.norms import batch_norm_train

    rng = np.random.default_rng(1)
    C = 16
    base = rng.standard_normal((2, 8, 8, 8, C)).astype(np.float32)
    rm = jnp.zeros((C,), jnp.float32)
    rv = jnp.ones((C,), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))

    @jax.jit
    def apply(x):
        y, _, _ = batch_norm_train(x, rm, rv, scale, bias)
        return y

    for offset in (0.0, 50.0):
        # quantize the INPUT first and reference it in f32: at offset 50
        # the bf16 input quantization alone is ±0.125 (ulp(50)/2), which
        # is not the fold's fault — the test isolates the bf16 APPLY path
        # the fold changes (the wave-27 HW run failed at 4e-2 against the
        # un-quantized reference for exactly this reason)
        xb = jnp.asarray(base + offset).astype(jnp.bfloat16)
        ref = np.asarray(apply(xb.astype(jnp.float32)), np.float32)
        got = np.asarray(apply(xb), np.float32)
        denom = np.abs(ref).max() + 1e-6
        assert np.abs(got - ref).max() / denom < 4e-2, f"offset={offset}"


def test_d2s_fused_sub_matches_hw():
    """depth_to_space with the fused per-lane subtract + f32 cast == plain
    d2s minus the broadcast offset (the ViT demean fusion), on HW."""
    from anatomix_tpu.ops.pallas.reshuffle import depth_to_space

    rng = np.random.default_rng(1)
    y = jnp.asarray(
        rng.standard_normal((1, 8, 8, 8, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    sub = jnp.asarray(rng.standard_normal((1, 128)).astype(np.float32))
    plain = np.asarray(depth_to_space(y), np.float32)
    fused = np.asarray(
        depth_to_space(y, sub=sub, out_dtype=jnp.float32), np.float32
    )
    # reference: d2s the lane-broadcast offset volume (lane a*C+c holds
    # channel c of sub-position a) and subtract it in full-res space
    off_vol = depth_to_space(
        jnp.broadcast_to(
            sub.astype(jnp.bfloat16)[:, None, None, None, :], y.shape
        )
    )
    ref = plain - np.asarray(off_vol, np.float32)
    assert np.abs(fused - ref).max() < 1e-2


def test_d2s_interleave_matches_plain_hw():
    """The interleave-exit d2s (in-kernel (w,2C)->(2w,C) minor-split
    reshape) == plain depth_to_space on real hardware, incl. the fused
    demean. Opt-in: the wave-28 probe showed the minor-split reshape is
    an unsupported Mosaic shape cast — run with ANATOMIX_D2S_INTERLEAVE=1
    once a legal formulation lands."""
    if os.environ.get("ANATOMIX_D2S_INTERLEAVE", "0") != "1":
        pytest.skip("interleave exit is opt-in (HW Mosaic shape cast)")
    from anatomix_tpu.ops.pallas.reshuffle import (
        depth_to_space,
        depth_to_space_interleave,
    )

    rng = np.random.default_rng(2)
    C = 32
    y = jnp.asarray(
        rng.standard_normal((1, 16, 16, 16, 8 * C)).astype(np.float32)
    )
    sub = jnp.asarray(rng.standard_normal((1, 8 * C)).astype(np.float32))
    ref = np.asarray(depth_to_space(y, sub=sub, out_dtype=jnp.float32))
    got = np.asarray(
        depth_to_space_interleave(y, sub=sub, out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_s2d_c1_matches_xla_hw():
    """The channel-less Pallas entry (opt-in via ANATOMIX_S2D_C1) == XLA
    space_to_depth_4d on real hardware. Opt-in: the wave-28 probe showed
    its minor-split reshape is an unsupported Mosaic shape cast."""
    if os.environ.get("ANATOMIX_S2D_C1", "0") != "1":
        pytest.skip("s2d_c1 entry is opt-in (HW Mosaic shape cast)")
    from anatomix_tpu.ops.pallas.conv3x3 import space_to_depth_4d
    from anatomix_tpu.ops.pallas.reshuffle import space_to_depth_c1

    rng = np.random.default_rng(5)
    x4 = jnp.asarray(
        rng.standard_normal((1, 32, 32, 32)).astype(np.float32)
    )
    ref = np.asarray(space_to_depth_4d(x4))
    got = np.asarray(space_to_depth_c1(x4))
    np.testing.assert_array_equal(got, ref)


def test_vit_stem_pallas_matches_xla_hw():
    """The prepacked Pallas ViT stem (dense block conv, inference
    default) == the differentiable XLA block conv on real hardware, at
    the production channel ladder (C=1 -> 32) in bf16."""
    from anatomix_tpu.models.vit3d.primus import (
        PrimusConfig,
        _tokenizer_v2_fused,
        init_primus_params,
        prepack_primus_tokenizer,
    )

    cfg = PrimusConfig(
        embed_dim=64, eva_depth=1, eva_numheads=2,
        patch_embed_size=(8, 8, 8), input_shape=(32, 32, 32),
        num_register_tokens=2, tokenizer_base_features=32, in_eps=1e-2,
        num_classes=8,
    )
    params = init_primus_params(cfg, jax.random.PRNGKey(0))
    pp = prepack_primus_tokenizer(cfg, params, compute_dtype=jnp.bfloat16)
    assert "pallas" in pp["tokenizer"]["stem"]
    rng = np.random.default_rng(6)
    x = jnp.asarray(
        rng.standard_normal((1, 32, 32, 32, 1)).astype(np.float32)
    )
    ref = np.asarray(
        _tokenizer_v2_fused(cfg, params["tokenizer"], x,
                            compute_dtype=jnp.bfloat16)
    ).astype(np.float32)
    got = np.asarray(
        _tokenizer_v2_fused(cfg, pp["tokenizer"], x,
                            compute_dtype=jnp.bfloat16)
    ).astype(np.float32)
    # bf16 GEMM association order differs between the Pallas kernel and
    # the XLA conv; both paths' stage convs also repack in bf16
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < 3e-2, rel


def test_d2s8_matches_composed_hw():
    """The factor-8 packed decoder exit (4 lane-slice gathers + plain
    stores, NO minor-split reshape — the block-space ViT decoder's only
    reshuffle, ANATOMIX_DECODER_BLOCK) == three chained plain
    depth_to_space calls on real hardware, with the fused subtract."""
    from anatomix_tpu.ops.pallas.reshuffle import (
        depth_to_space,
        depth_to_space8,
    )

    rng = np.random.default_rng(6)
    B, d, C = 1, 4, 32
    y = jnp.asarray(
        rng.standard_normal((B, d, d, d, 512 * C)).astype(np.float32)
    )
    sub = jnp.asarray(
        rng.standard_normal((B, 512 * C)).astype(np.float32)
    )

    @jax.jit
    def composed(v, s):
        # stage channel groups: (a1, rest) -> d2s over a1, etc. Chained
        # plain d2s consumes the (a_i)-major order stage by stage.
        z = v - s[:, None, None, None, :]
        for _ in range(3):
            z = depth_to_space(z)
        return z

    ref = np.asarray(composed(y, sub))
    packed = np.asarray(
        depth_to_space8(y, sub=sub, out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(
        packed.reshape(ref.shape), ref, rtol=1e-6, atol=1e-6
    )

@pytest.mark.parametrize("flat", ["0", "1"])
def test_trilinear_block_emit_forms_hw(flat, monkeypatch):
    """Both stencil forms of the block-layout trilinear x2 emit (the
    default-ON dev decoder upsample, round 4c `102dba6`/`576346d`) match
    the spatial reference at a production extent on real hardware —
    the r03 lesson: interpret-mode parity does not cover Mosaic/XLA-TPU
    codegen (VERDICT r4 #7)."""
    from anatomix_tpu.ops.pallas.conv3x3 import _space_to_depth
    from anatomix_tpu.ops.resize import (
        upsample2x,
        upsample2x_trilinear_block,
    )

    monkeypatch.setenv("ANATOMIX_TRILIN_FLAT", flat)
    # dev decoder level-1 production shape at 128-cube: (1, 32³, 64ch)
    x = jax.jit(
        lambda k: jax.random.normal(k, (1, 32, 32, 32, 64), jnp.float32)
    )(jax.random.PRNGKey(11))
    ref = np.asarray(
        jax.jit(lambda v: _space_to_depth(upsample2x(v, "trilinear")))(x)
    )
    got = np.asarray(jax.jit(upsample2x_trilinear_block)(x))
    if flat == "0":
        np.testing.assert_array_equal(got, ref)
    else:
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=2e-6)


def test_dev_fused_cat_flat_defaults_hw():
    """End-to-end dev-topology fused forward on HW with the round-5
    default-ON levers (two-operand cat kernel + flat trilinear stencil +
    act-into-norm fold on the live-IN path): tracks the f32 XLA ground
    truth, and flipping the gates OFF changes nothing beyond bf16
    association noise (VERDICT r4 #1/#7)."""
    from anatomix_tpu.extract import make_feature_extractor
    from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=32, num_downs=3,
                   ngf=32, norm="instance", pooling="Avg",
                   interp="trilinear", norm_eps=1e-2)
    )
    params = init_params(plan, jax.random.PRNGKey(12))
    vol = jax.jit(
        lambda k: jax.random.normal(k, (1, 64, 64, 64, 1), jnp.float32)
    )(jax.random.PRNGKey(13))

    def run(conv_impl, dtype, env):
        for k, v in env.items():
            os.environ[k] = v
        try:
            ext = make_feature_extractor(
                plan, params, strategy="full", conv_impl=conv_impl,
                compute_dtype=dtype,
            )
            return np.asarray(ext.impl(vol, ext.arrays))
        finally:
            for k in env:
                os.environ.pop(k, None)

    ref32 = run("xla", jnp.float32, {})
    on = run("pallas_fused", jnp.bfloat16,
             {"ANATOMIX_CAT_KERNEL": "1", "ANATOMIX_TRILIN_FLAT": "1"})
    off = run("pallas_fused", jnp.bfloat16,
              {"ANATOMIX_CAT_KERNEL": "0", "ANATOMIX_TRILIN_FLAT": "0"})
    e_on = _rel_err(on, ref32)
    e_off = _rel_err(off, ref32)
    assert e_on < 3e-2, f"cat+flat error {e_on:.4f}"
    assert e_on < 1.5 * e_off + 1e-3, (
        f"cat+flat {e_on:.4f} vs gates-off {e_off:.4f}"
    )


def test_trilinear_block_pallas_matches_xla_hw():
    """The one-pass Pallas trilinear block emit (default-ON dev decoder
    upsample, round 5) == the XLA flat-stencil form on real hardware at
    a production extent (clamped-DMA halo == torch boundary clamp)."""
    from anatomix_tpu.ops.pallas.upsample import (
        upsample2x_trilinear_block_pallas,
    )
    from anatomix_tpu.ops.resize import upsample2x_trilinear_block

    os.environ["ANATOMIX_TRILIN_FLAT"] = "1"
    try:
        x = jax.jit(
            lambda k: jax.random.normal(k, (1, 32, 32, 32, 64),
                                        jnp.float32)
        )(jax.random.PRNGKey(21))
        ref = np.asarray(jax.jit(upsample2x_trilinear_block)(x))
        got = np.asarray(upsample2x_trilinear_block_pallas(x))
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=2e-6)
    finally:
        os.environ.pop("ANATOMIX_TRILIN_FLAT", None)


def test_norm_apply_kernel_matches_xla_hw():
    """The Pallas (tiled) instance-norm apply kernel == the XLA affine
    at a production extent on real hardware (round 5, default ON)."""
    from anatomix_tpu.ops.pallas.norm_apply import norm_apply_block

    rng = np.random.default_rng(31)
    B, d, c8 = 1, 32, 256
    t = (2, 2, 2)
    x = jnp.asarray(
        rng.standard_normal((B, d, d, d, c8)).astype(np.float32)
    ).astype(jnp.bfloat16)
    a = jnp.asarray(
        (rng.standard_normal((B, 2, 2, 2, c8)) * 0.1 + 1.0).astype(
            np.float32
        )
    )
    s = jnp.asarray(
        rng.standard_normal((B, 2, 2, 2, c8)).astype(np.float32)
    )
    got = np.asarray(
        norm_apply_block(x, a, s, tile_counts=t, act="lrelu"), np.float32
    )
    # XLA reference: 8-D broadcast affine
    v = x.reshape(B, 2, 16, 2, 16, 2, 16, c8).astype(jnp.float32)
    bc = lambda q: q[:, :, None, :, None, :, None, :]
    y = v * bc(a) + bc(s)
    y = jnp.where(y >= 0, y, 0.2 * y)
    ref = np.asarray(y.reshape(x.shape), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)
