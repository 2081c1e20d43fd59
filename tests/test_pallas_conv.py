"""Pallas conv3x3 kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anatomix_tpu.ops.conv import conv3d
from anatomix_tpu.ops.pallas.conv3x3 import (
    choose_impl,
    conv3x3_same,
    make_block_weights,
    pack_weights,
)


@pytest.mark.parametrize(
    "cin,cout,pad_type,s2d",
    [
        (4, 6, "zeros", "off"),
        (4, 6, "reflect", "off"),
        (3, 5, "zeros", "on"),
        (16, 16, "reflect", "on"),
        (1, 8, "replicate", "on"),
    ],
)
def test_conv3x3_matches_xla(rng, cin, cout, pad_type, s2d):
    x = jnp.asarray(
        rng.standard_normal((2, 8, 8, 8, cin)).astype(np.float32)
    )
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.1
    )
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    ref = np.asarray(
        conv3d(x, w, b, padding="SAME", pad_type=pad_type)
    )
    got = np.asarray(
        conv3x3_same(
            x, w, b, pad_type=pad_type, compute_dtype=jnp.float32,
            s2d=s2d, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_block_weights_equivalence(rng):
    """Dense block-space conv == original conv (checked via the XLA conv on
    the space-to-depth'd input)."""
    cin, cout = 3, 4
    w = rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32)
    wb = np.asarray(make_block_weights(w))
    assert wb.shape == (3, 3, 3, 8 * cin, 8 * cout)
    # each original tap appears exactly 8 times (once per output position)
    assert np.isclose(np.abs(wb).sum(), np.abs(w).sum() * 8)


def test_pack_weights_layout(rng):
    cin, cout = 2, 3
    w = rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32)
    packed = pack_weights(w)
    assert packed.shape == (9 * cin, 3 * cout)
    # K index (dz*3+dy)*cin + ci ; N index dx*cout + co
    assert packed[(0 * 3 + 0) * cin + 1, 2 * cout + 0] == w[0, 0, 2, 1, 0]
    assert packed[(2 * 3 + 1) * cin + 0, 1 * cout + 2] == w[2, 1, 1, 0, 2]


def test_choose_impl_policy():
    assert choose_impl(16, 16, (128, 128, 128)) == "pallas_s2d"
    assert choose_impl(1, 16, (128, 128, 128)) == "pallas_s2d"
    assert choose_impl(48, 16, (128, 128, 128)) == "pallas_s2d"
    assert choose_impl(32, 32, (64, 64, 64)) == "xla"  # 1024 > 768
    assert choose_impl(128, 128, (16, 16, 16)) == "pallas_direct"
    assert choose_impl(16, 16, (127, 128, 128)) == "xla"  # odd spatial
    assert choose_impl(96, 32, (64, 64, 64)) == "xla"


def test_unet_with_pallas_convs_interpret(rng):
    from anatomix_tpu.extract import fold_batchnorm, prepack_pallas
    from anatomix_tpu.models.unet import (
        UnetConfig,
        build_plan,
        init_params,
        unet_apply,
    )
    import anatomix_tpu.ops.pallas.conv3x3 as c3

    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4)
    )
    params = init_params(plan, jax.random.PRNGKey(0))
    fplan, fparams = fold_batchnorm(plan, params)
    fparams = jax.tree_util.tree_map(jnp.asarray, fparams)
    x = jnp.asarray(
        rng.standard_normal((1, 16, 16, 16, 1)).astype(np.float32)
    )
    ref = np.asarray(unet_apply(fplan, fparams, x))

    # interpret-mode packing (no 128-lane padding off-TPU)
    pparams = {k: dict(v) for k, v in fparams.items()}
    from anatomix_tpu.extract import layer_spatials

    spatials = layer_spatials(fplan, (16, 16, 16))
    for idx, spec in enumerate(fplan.layers):
        if spec.kind != "conv":
            continue
        if c3.choose_impl(spec.in_ch, spec.out_ch, spatials[idx]) == "xla":
            continue
        p = pparams[str(idx)]
        p["pallas"] = c3.prepack_conv(
            np.asarray(p["w"]),
            np.asarray(p["b"]) if "b" in p else None,
            spatial=spatials[idx], compute_dtype=jnp.float32,
            interpret=True,
        )

    # monkeypatch interpret=True through the apply path
    orig = c3.conv3x3_packed

    def patched(xv, packed, **kw):
        kw["interpret"] = True
        kw["compute_dtype"] = jnp.float32
        return orig(xv, packed, **kw)

    c3.conv3x3_packed = patched
    try:
        got = np.asarray(
            unet_apply(fplan, pparams, x, conv_impl="pallas")
        )
    finally:
        c3.conv3x3_packed = orig
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-2)


@pytest.mark.parametrize(
    "shape,cin,cout",
    [
        ((1, 8, 8, 8), 16, 16),     # single tile per axis (clamps both ways)
        ((2, 16, 8, 12), 16, 32),   # multi-tile d, odd w
    ],
)
def test_sparse_halo_kernel_matches_padded(rng, monkeypatch, shape, cin, cout):
    """In-kernel halo (9 clamped DMAs + edge-column fills) is bit-exact vs
    the HBM-padded sparse kernel for reflect padding."""
    from anatomix_tpu.ops.pallas.conv_block import (
        conv_block_sparse, prepack_sparse,
    )

    B, d, h, w = shape
    x = jnp.asarray(
        rng.standard_normal((B, d, h, w, 8 * cin)).astype(np.float32)
    )
    wgt = rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.1
    b = rng.standard_normal(cout).astype(np.float32)
    packed = prepack_sparse(wgt, b, act="lrelu", compute_dtype=jnp.float32)
    monkeypatch.setenv("ANATOMIX_HALO", "0")
    y_ref = np.asarray(
        conv_block_sparse(x, packed, pad_type="reflect", interpret=True)
    )
    monkeypatch.setenv("ANATOMIX_HALO", "1")
    y = np.asarray(
        conv_block_sparse(x, packed, pad_type="reflect", interpret=True)
    )
    np.testing.assert_array_equal(y, y_ref)


def test_skip_halo_kernel_matches_padded(rng, monkeypatch):
    """Hybrid skip kernel (in-kernel encoder halo, HBM-padded small) is
    bit-exact vs the fully-padded skip kernel."""
    from anatomix_tpu.ops.pallas.conv_block import (
        conv_block_sparse_skip, prepack_sparse_skip,
    )

    B, d, h, w, c1, c2, co = 1, 8, 16, 12, 16, 32, 16
    enc = jnp.asarray(
        rng.standard_normal((B, d, h, w, 8 * c1)).astype(np.float32)
    )
    small = jnp.asarray(
        rng.standard_normal((B, d, h, w, c2)).astype(np.float32)
    )
    wgt = rng.standard_normal((3, 3, 3, c1 + c2, co)).astype(np.float32) * 0.1
    b = rng.standard_normal(co).astype(np.float32)
    packed = prepack_sparse_skip(
        wgt, b, c1=c1, act="lrelu", compute_dtype=jnp.float32
    )
    monkeypatch.setenv("ANATOMIX_HALO", "0")
    y_ref = np.asarray(
        conv_block_sparse_skip(
            enc, small, packed, pad_type="reflect", interpret=True
        )
    )
    monkeypatch.setenv("ANATOMIX_HALO", "1")
    y = np.asarray(
        conv_block_sparse_skip(
            enc, small, packed, pad_type="reflect", interpret=True
        )
    )
    np.testing.assert_array_equal(y, y_ref)
