"""Feature-extraction pipeline tests: BN folding and end-to-end extraction."""

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.extract import (
    extract_features,
    fold_batchnorm,
    make_feature_extractor,
    minmax,
    unit_normalize,
)
from anatomix_tpu.models.unet import (
    UnetConfig,
    build_plan,
    init_params,
    unet_apply,
)

SMALL = UnetConfig(
    dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4, norm="batch",
)


def _model():
    plan = build_plan(SMALL)
    params = init_params(plan, jax.random.PRNGKey(0))
    # non-trivial running stats
    for key, sub in params.items():
        if "mean" in sub:
            rng = np.random.default_rng(int(key))
            sub["mean"] = jnp.asarray(
                rng.standard_normal(sub["mean"].shape[0]).astype(np.float32)
                * 0.2
            )
            sub["var"] = jnp.asarray(
                (rng.random(sub["var"].shape[0]) + 0.5).astype(np.float32)
            )
    return plan, params


def test_fold_batchnorm_preserves_output():
    plan, params = _model()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, 16, 16, 16, 1), dtype=np.float32
        )
    )
    ref = unet_apply(plan, params, x)
    fplan, fparams = fold_batchnorm(plan, params)
    got = unet_apply(fplan, fparams, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )
    # no norm params remain
    for idx, spec in enumerate(fplan.layers):
        assert spec.kind != "norm"


def test_extractor_single_window_matches_direct():
    plan, params = _model()
    x = np.random.default_rng(1).standard_normal(
        (1, 16, 16, 16, 1)
    ).astype(np.float32)
    extractor = make_feature_extractor(
        plan, params, roi_size=(16, 16, 16), sw_batch_size=1
    )
    got = np.asarray(extractor(jnp.asarray(x)))
    ref = np.asarray(unet_apply(plan, params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_extract_features_pair():
    plan, params = _model()
    rng = np.random.default_rng(2)
    fixed = rng.random((20, 16, 18)) * 1000 - 200
    moving = rng.random((20, 16, 18)) * 3
    ffix, fmov = extract_features(
        fixed, moving, plan, params, roi_size=(16, 16, 16), sw_batch_size=2,
    )
    assert ffix.shape == (1, 20, 16, 18, 4)
    assert fmov.shape == (1, 20, 16, 18, 4)
    assert np.isfinite(np.asarray(ffix)).all()


def test_minmax():
    arr = np.array([-5.0, 0.0, 10.0])
    out = minmax(arr)
    assert out.min() == 0 and out.max() == 1
    out = minmax(arr, minclip=-1, maxclip=5)
    assert out.min() == 0 and out.max() == 1


def test_unit_normalize():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 4, 4, 8))
        .astype(np.float32)
    )
    n = np.linalg.norm(np.asarray(unit_normalize(x)), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_full_strategy_self_consistency():
    """'full' on an aligned volume equals a direct forward; on an unaligned
    volume it pads to 2^num_downs and crops back."""
    plan, params = _model()
    rng = np.random.default_rng(5)
    vol = jnp.asarray(
        rng.standard_normal((1, 16, 16, 16, 1)).astype(np.float32)
    )
    full = np.asarray(
        make_feature_extractor(plan, params, strategy="full")(vol)
    )
    direct = np.asarray(unet_apply(plan, params, vol))
    np.testing.assert_allclose(full, direct, atol=1e-4, rtol=1e-4)

    odd = jnp.asarray(
        rng.standard_normal((1, 18, 13, 21, 1)).astype(np.float32)
    )
    out = make_feature_extractor(plan, params, strategy="full")(odd)
    assert out.shape == (1, 18, 13, 21, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_auto_strategy_selection():
    from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
    import jax as _jax

    plan_in = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=4, num_downs=2, ngf=4,
                   norm="instance")
    )
    params_in = init_params(plan_in, _jax.random.PRNGKey(0))
    # instance norm -> sliding (per-window normalization context)
    fn = make_feature_extractor(
        plan_in, params_in, strategy="auto", roi_size=(16, 16, 16)
    )
    vol = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    assert fn(vol).shape == (1, 16, 16, 16, 4)
