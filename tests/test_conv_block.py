"""Sparse block-space conv kernel + fused upsample/skip kernel + fused
UNet v2 correctness (interpret mode on CPU).

Interpret mode emulates TPU bf16 dot numerics, so tolerances are relative
~1e-2 even when inputs are f32; op structure is validated exactly by the
numpy emulation in `test_pack_sparse_weights_math`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anatomix_tpu.ops.conv import conv3d
from anatomix_tpu.ops.pallas.conv3x3 import _depth_to_space, _space_to_depth
from anatomix_tpu.ops.pallas.conv_block import (
    conv_block_sparse,
    conv_block_sparse_skip,
    pack_sparse_block_weights,
    prepack_sparse,
    prepack_sparse_skip,
)
from anatomix_tpu.ops.resize import upsample2x


def test_pack_sparse_weights_math(rng):
    """Exact (f64) numpy check: 64-view GEMM == direct conv."""
    ci, co, D = 2, 3, 8
    x = rng.standard_normal((D, D, D, ci))
    w = rng.standard_normal((3, 3, 3, ci, co)) * 0.1
    xp = np.pad(x, ((1, 1),) * 3 + ((0, 0),))
    ref = np.zeros((D, D, D, co))
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                ref += np.einsum(
                    "dhwi,io->dhwo",
                    xp[kd: kd + D, kh: kh + D, kw: kw + D],
                    w[kd, kh, kw],
                )
    d = D // 2
    xb = (
        x.reshape(d, 2, d, 2, d, 2, ci)
        .transpose(0, 2, 4, 1, 3, 5, 6)
        .reshape(d, d, d, 8 * ci)
    )
    xbp = np.pad(xb, ((1, 1),) * 3 + ((0, 0),))
    from anatomix_tpu.ops.pallas.conv_block import _OFF, _PAR

    views = []
    for vd in (-1, 0, 1, 2):
        for vh in (-1, 0, 1, 2):
            for vw in (-1, 0, 1, 2):
                g = ((_PAR[vd] * 2 + _PAR[vh]) * 2 + _PAR[vw]) * ci
                views.append(
                    xbp[
                        _OFF[vd]: _OFF[vd] + d,
                        _OFF[vh]: _OFF[vh] + d,
                        _OFF[vw]: _OFF[vw] + d,
                        g: g + ci,
                    ]
                )
    xs = np.concatenate(views, axis=-1)
    w0, w1, w2 = pack_sparse_block_weights(w)
    # regroup views by w-offset to match the kernel's three GEMMs
    idx = 0
    g0, g1, g2 = [], [], []
    for vd in (-1, 0, 1, 2):
        for vh in (-1, 0, 1, 2):
            for vw in (-1, 0, 1, 2):
                sl = xs[..., idx * ci: (idx + 1) * ci]
                (g0 if vw == -1 else g2 if vw == 2 else g1).append(sl)
                idx += 1
    z = (
        np.concatenate(g1, -1) @ w1
        + np.concatenate(g0, -1) @ w0
        + np.concatenate(g2, -1) @ w2
    )
    z = (
        z.reshape(d, d, d, 2, 2, 2, co)
        .transpose(0, 3, 1, 4, 2, 5, 6)
        .reshape(D, D, D, co)
    )
    np.testing.assert_allclose(z, ref, atol=1e-12)


@pytest.mark.parametrize(
    "ci,co,pad,act",
    [
        (3, 5, "zeros", "none"),
        (16, 16, "reflect", "lrelu"),
        (8, 4, "zeros", "relu"),
    ],
)
def test_conv_block_sparse_matches_xla(rng, ci, co, pad, act):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, ci)).astype(np.float32))
    w = rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.1
    b = rng.standard_normal(co).astype(np.float32)
    ref = np.asarray(
        conv3d(x, jnp.asarray(w), jnp.asarray(b), padding="SAME",
               pad_type=pad)
    )
    if act == "lrelu":
        ref = np.where(ref >= 0, ref, 0.2 * ref)
    elif act == "relu":
        ref = np.maximum(ref, 0)
    packed = prepack_sparse(w, b, act=act, compute_dtype=jnp.float32)
    got = np.asarray(
        _depth_to_space(
            conv_block_sparse(
                _space_to_depth(x), packed, pad_type=pad, interpret=True
            )
        )
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-2


@pytest.mark.parametrize(
    "c1,c2,co,pad", [(4, 6, 5, "reflect"), (16, 8, 16, "zeros")]
)
def test_conv_block_skip_matches_xla(rng, c1, c2, co, pad):
    """Fused upsample+concat+conv == upsample2x -> cat -> conv3d."""
    enc = jnp.asarray(
        rng.standard_normal((1, 8, 8, 8, c1)).astype(np.float32)
    )
    small = jnp.asarray(
        rng.standard_normal((1, 4, 4, 4, c2)).astype(np.float32)
    )
    w = rng.standard_normal((3, 3, 3, c1 + c2, co)).astype(np.float32) * 0.1
    b = rng.standard_normal(co).astype(np.float32)
    cat = jnp.concatenate([enc, upsample2x(small, "nearest")], axis=-1)
    ref = np.asarray(
        conv3d(cat, jnp.asarray(w), jnp.asarray(b), padding="SAME",
               pad_type=pad)
    )
    ref = np.where(ref >= 0, ref, 0.2 * ref)
    packed = prepack_sparse_skip(
        w, b, c1=c1, act="lrelu", compute_dtype=jnp.float32
    )
    got = np.asarray(
        _depth_to_space(
            conv_block_sparse_skip(
                _space_to_depth(enc), small, packed, pad_type=pad,
                interpret=True,
            )
        )
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-2


def test_unet_fused_v2_matches_xla(rng):
    """Whole fused-v2 forward vs the XLA UNet (anatomix config, small
    volume): per-layer bf16-emulated dots bound the accumulated error."""
    from anatomix_tpu.extract import fold_batchnorm
    from anatomix_tpu.models.unet import (
        UnetConfig, build_plan, init_params, unet_apply,
    )
    from anatomix_tpu.models.unet_fused import (
        prepack_fused, unet_apply_fused,
    )

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=2,
                   ngf=16)
    )
    params = init_params(plan, jax.random.PRNGKey(0))
    fplan, fparams = fold_batchnorm(plan, params)
    fparams = jax.tree_util.tree_map(jnp.asarray, fparams)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 16, 1),
                          jnp.float32)
    ref = np.asarray(
        unet_apply(fplan, fparams, x, compute_dtype=jnp.float32)
    ).astype(np.float32)
    pf = prepack_fused(
        fplan, fparams, input_spatial=(16, 16, 16),
        compute_dtype=jnp.float32, interpret=True,
    )
    impls = {
        idx: pf[str(idx)].get("fused", {}).get("impl", "xla")
        for idx, spec in enumerate(fplan.layers) if spec.kind == "conv"
    }
    assert "sparse" in impls.values()
    assert "sparse_skip" in impls.values()
    got = np.asarray(
        unet_apply_fused(
            fplan, pf, x, compute_dtype=jnp.float32, interpret=True
        )
    ).astype(np.float32)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-2


def test_unet_fused_instance_norm_matches_xla(rng):
    """Fused path with LIVE instance norms + trilinear decoder (the
    anatomix-dev config family) vs the XLA UNet."""
    from anatomix_tpu.models.unet import (
        UnetConfig, build_plan, init_params, unet_apply,
    )
    from anatomix_tpu.models.unet_fused import (
        prepack_fused, supports_fusion, unet_apply_fused,
    )

    cfg = UnetConfig(
        dimension=3, input_nc=1, output_nc=8, num_downs=2, ngf=16,
        norm="instance", pooling="Avg", interp="trilinear",
        norm_eps=1e-2,
    )
    assert supports_fusion(cfg)
    plan = build_plan(cfg)
    params = init_params(plan, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 16, 1),
                          jnp.float32)
    ref = np.asarray(
        unet_apply(plan, params, x, compute_dtype=jnp.float32)
    ).astype(np.float32)
    pf = prepack_fused(
        plan, params, input_spatial=(16, 16, 16),
        compute_dtype=jnp.float32, interpret=True,
    )
    got = np.asarray(
        unet_apply_fused(
            plan, pf, x, compute_dtype=jnp.float32, interpret=True
        )
    ).astype(np.float32)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-2


def test_unet_fused_cat_pair_taken_and_matches(rng, monkeypatch):
    """The trilinear decoder's skip concat defers to the two-operand
    sparse kernel (`conv_block_sparse_cat`) when channels are 16-aligned
    and block-w is 8-aligned — assert the path actually runs AND the
    output still matches the XLA UNet."""
    from anatomix_tpu.models import unet_fused as uf
    from anatomix_tpu.models.unet import (
        UnetConfig, build_plan, init_params, unet_apply,
    )

    cfg = UnetConfig(
        dimension=3, input_nc=1, output_nc=8, num_downs=2, ngf=16,
        norm="instance", pooling="Avg", interp="trilinear",
        norm_eps=1e-2,
    )
    plan = build_plan(cfg)
    params = init_params(plan, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 16, 1),
                          jnp.float32)
    ref = np.asarray(
        unet_apply(plan, params, x, compute_dtype=jnp.float32)
    ).astype(np.float32)
    pf = uf.prepack_fused(
        plan, params, input_spatial=(16, 16, 16),
        compute_dtype=jnp.float32, interpret=True,
    )

    calls = []
    real = uf.conv_block_sparse_cat

    def counting(*args, **kwargs):
        calls.append(args[0].shape)
        return real(*args, **kwargs)

    monkeypatch.setattr(uf, "conv_block_sparse_cat", counting)
    monkeypatch.setenv("ANATOMIX_CAT_KERNEL", "1")
    got = np.asarray(
        uf.unet_apply_fused(
            plan, pf, x, compute_dtype=jnp.float32, interpret=True
        )
    ).astype(np.float32)
    # top decoder level: enc 16ch block (8,8,8,128), w=8 — eligible
    assert calls, "cat_pair path was never taken"
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-2


def test_unet_fused_extent_guard_demotes_and_matches(rng):
    """Traces at extents outside the sparse kernels' shape domain
    (block-w % 8 != 0 — the r03 registration failure at 192³, whose
    192-chain block extent 12 broke Mosaic's M-flatten) must demote those
    convs to XLA at trace time and stay numerically correct: prepack at a
    16-chain roi, trace at a 24-chain volume (block extents 12/6/3 — all
    demoted, including the declined sparse_skip pair)."""
    from anatomix_tpu.extract import fold_batchnorm
    from anatomix_tpu.models.unet import (
        UnetConfig, build_plan, init_params, unet_apply,
    )
    from anatomix_tpu.models.unet_fused import (
        prepack_fused, unet_apply_fused,
    )

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=2,
                   ngf=16)
    )
    params = init_params(plan, jax.random.PRNGKey(0))
    fplan, fparams = fold_batchnorm(plan, params)
    fparams = jax.tree_util.tree_map(jnp.asarray, fparams)
    pf = prepack_fused(
        fplan, fparams, input_spatial=(16, 16, 16),
        compute_dtype=jnp.float32, interpret=True,
    )
    impls = {
        idx: pf[str(idx)].get("fused", {}).get("impl", "xla")
        for idx, spec in enumerate(fplan.layers) if spec.kind == "conv"
    }
    assert "sparse" in impls.values()
    assert "sparse_skip" in impls.values()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 24, 24, 24, 1),
                          jnp.float32)
    ref = np.asarray(
        unet_apply(fplan, fparams, x, compute_dtype=jnp.float32)
    ).astype(np.float32)
    got = np.asarray(
        unet_apply_fused(
            fplan, pf, x, compute_dtype=jnp.float32, interpret=True
        )
    ).astype(np.float32)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-2


def test_unet_fused_4d_entry_matches_5d(rng, monkeypatch):
    """The channel-less (B, D, H, W) entry — the sliding path's packed
    window form, which dodges the 128x lane-padding of (…, W, 1)
    slices — must produce exactly the same forward as the 5-D input,
    under both entry impls (default block_dense, and the entry4 gate's
    block-input alternative pack)."""
    import anatomix_tpu.models.unet_fused as uf
    from anatomix_tpu.extract import fold_batchnorm
    from anatomix_tpu.models.unet import (
        UnetConfig, build_plan, init_params,
    )

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=2,
                   ngf=16)
    )
    params = init_params(plan, jax.random.PRNGKey(0))
    fplan, fparams = fold_batchnorm(plan, params)
    fparams = jax.tree_util.tree_map(jnp.asarray, fparams)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 16, 1),
                          jnp.float32)

    for entry4 in (False, True):
        monkeypatch.setattr(uf, "_ENTRY4", entry4)
        pf = uf.prepack_fused(
            fplan, fparams, input_spatial=(16, 16, 16),
            compute_dtype=jnp.float32, interpret=True,
        )
        entry_impl = pf["0"]["fused"]["impl"]
        assert entry_impl == ("entry4" if entry4 else "block_dense")
        ref = np.asarray(uf.unet_apply_fused(
            fplan, pf, x, compute_dtype=jnp.float32, interpret=True
        ))
        got = np.asarray(uf.unet_apply_fused(
            fplan, pf, x[..., 0], compute_dtype=jnp.float32,
            interpret=True,
        ))
        assert got.shape == ref.shape
        # same weights; entry4's 4-D route runs the block-input pack of
        # the identical conv, so only GEMM association order differs
        assert np.abs(got - ref).max() <= 1e-4 * np.abs(ref).max(), (
            f"entry4={entry4}"
        )


@pytest.mark.parametrize("ci,co", [(16, 16), (32, 64)])
def test_conv_block_sparse_wide_matches_narrow(rng, ci, co, monkeypatch):
    """The wide-assembly halo kernel (views merged into maximal
    contiguous lane runs, `pack_sparse_block_weights_wide`) computes the
    same conv as the narrow vd-chunked form — different f32 accumulation
    order only — and `ANATOMIX_WIDE=1` routes `conv_block_sparse` to it.
    """
    from anatomix_tpu.ops.pallas.conv_block import (
        conv_block_sparse,
        prepack_sparse,
    )

    s = 8
    x = jnp.asarray(
        rng.standard_normal((1, s, s, s, 8 * ci)).astype(np.float32)
    )
    wt = jnp.asarray(
        (rng.standard_normal((3, 3, 3, ci, co)) * 0.05).astype(np.float32)
    )
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    packed = prepack_sparse(wt, b, act="lrelu", compute_dtype=jnp.float32)

    monkeypatch.setenv("ANATOMIX_WIDE", "0")
    ref = np.asarray(
        conv_block_sparse(x, packed, pad_type="reflect", interpret=True)
    )
    monkeypatch.setenv("ANATOMIX_WIDE", "1")
    wide = np.asarray(
        conv_block_sparse(x, packed, pad_type="reflect", interpret=True)
    )
    np.testing.assert_allclose(wide, ref, atol=1e-4, rtol=1e-4)


def test_conv_block_sparse_dx_matches_valid(rng):
    """The dx kernel (zero halo assembled in-kernel, round 5) == the
    padded valid-conv dx path on the extended-gradient grid."""
    from anatomix_tpu.ops.pallas.conv_block import (
        conv_block_sparse_dx,
        conv_block_sparse_valid,
        wide_weights_from_groups_jnp,
    )
    from anatomix_tpu.ops.pallas.conv_block_train import (
        pack_sparse_weights_jnp,
    )

    ci, co, s = 16, 16, 32
    d = h = wd = s
    dpre = jnp.asarray(
        rng.standard_normal((1, s, s, s, 8 * co)).astype(np.float32)
    )
    w = jnp.asarray(
        (rng.standard_normal((3, 3, 3, ci, co)) * 0.05).astype(np.float32)
    )
    wflip = w[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)
    f0, f1, f2 = pack_sparse_weights_jnp(wflip)
    zb8 = jnp.zeros((1, 8 * ci), jnp.float32)
    ext = tuple(-(-(x + 2) // 8) * 8 for x in (d, h, wd))
    dpre_p = jnp.pad(
        dpre,
        ((0, 0), (2, 2 + ext[0] - (d + 2)), (2, 2 + ext[1] - (h + 2)),
         (2, (ext[2] + 2 - (wd + 2)) + ((-(ext[2] + 2)) % 8)), (0, 0)),
    )
    ref = np.asarray(
        conv_block_sparse_valid(
            dpre_p, f0, f1, f2, zb8, act="none", out_dtype=jnp.float32,
            interpret=True, out_w=ext[2],
        )
    )[:, : d + 2, : h + 2, : wd + 2]
    fg = wide_weights_from_groups_jnp(f0, f1, f2, co)
    got = np.asarray(
        conv_block_sparse_dx(
            dpre, *fg, zb8, ext=ext, out_dtype=jnp.float32,
            interpret=True,
        )
    )[:, : d + 2, : h + 2, : wd + 2]
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
