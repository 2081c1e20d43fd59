"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric: wall-clock seconds to extract features of a full 256³ CT
with the 6M anatomix UNet on one chip, using the best semantically-valid
strategy for the model (a single full-volume forward — the tiling-free limit
of MONAI-style Gaussian stitching for the batch-norm eval model; see
`anatomix_tpu/extract.py`). Target from BASELINE.json: < 1 s/chip on v5e;
`vs_baseline` = 1.0 / seconds (>1 = target beaten).

Also reported in `extra`: the reference-exact sliding-window mode (128³
windows, overlap 0.8, Gaussian blend => 343 windows) and raw 128³ patch
throughput of the UNet forward.

Timing uses `anatomix_tpu.utils.benchtools` (work chained inside one jit
with a scalar fetch) because through the axon tunnel `block_until_ready`
does not reliably block and every dispatch costs a ~28 ms round trip.
"""

import json
import os

import jax

# persistent compile cache: the axon tunnel recompiles everything per
# process (~20 min cold for the full bench); the cache cuts warm runs to
# a few minutes and survives across driver invocations
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from anatomix_tpu.extract import make_feature_extractor
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.extract import fold_batchnorm
from anatomix_tpu.utils.benchtools import amortized_time, pipeline_time


def main():
    compute_dtype = jnp.bfloat16
    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16)
    )
    params = init_params(plan, jax.random.PRNGKey(0))

    vol256 = jax.jit(
        lambda k: jax.random.normal(k, (1, 256, 256, 256, 1), jnp.float32)
    )(jax.random.PRNGKey(1))

    # --- primary: full-volume 256³ extraction --------------------------------
    extract_full = make_feature_extractor(
        plan, params, strategy="full", compute_dtype=compute_dtype
    )
    t_full = pipeline_time(extract_full, vol256, n=4, reps=3)

    # --- reference-exact sliding-window mode ----------------------------------
    extract_sw = make_feature_extractor(
        plan, params, strategy="sliding", roi_size=(128, 128, 128),
        sw_batch_size=4, overlap=0.8, compute_dtype=compute_dtype,
    )
    t_sw = pipeline_time(extract_sw, vol256, n=1, reps=2)

    # --- 128³ patch throughput (fused block-space Pallas path) ---------------
    from anatomix_tpu.models.unet_fused import prepack_fused, unet_apply_fused

    fplan, fparams = fold_batchnorm(plan, params)
    pf = prepack_fused(fplan, fparams, input_spatial=(128, 128, 128),
                       compute_dtype=compute_dtype)
    x128 = jax.jit(
        lambda k: jax.random.normal(k, (1, 128, 128, 128, 1), compute_dtype)
    )(jax.random.PRNGKey(2))

    def fwd(v):
        return unet_apply_fused(fplan, pf, v, compute_dtype=compute_dtype)[
            ..., :1
        ]

    t_patch = amortized_time(fwd, x128, n=8, reps=3)

    # --- registration pair latency (post-feature solver, the reference's
    # 'case time' bracket) on a 192³ pair, reference defaults ------------------
    import numpy as np
    import time as _time

    from anatomix_tpu.registration.pipeline import register_pair

    rng = np.random.default_rng(3)
    size = 192
    fixed = rng.random((size,) * 3).astype(np.float32) * 500
    moving = rng.random((size,) * 3).astype(np.float32) * 500
    _, t_reg = register_pair(
        fixed, moving, plan, params,
        grid_sp=2, disp_hw=1, selected_niter=80, grid_sp_adam=2, ic=True,
        extract_strategy="full", compute_dtype=compute_dtype,
    )

    # --- pretraining step (reference config: 128³ crop, bs 1, 512 patches,
    # 6 NCE taps; differentiable Pallas sparse convs) ----------------------
    import time as _t

    from anatomix_tpu.pretraining.train_step import (
        build_train_step,
        init_train_state,
    )
    from anatomix_tpu.utils.benchtools import dispatch_floor

    taps = (27, 31, 38, 45, 52, 65)
    tstate = init_train_state(
        plan, jax.random.PRNGKey(0), tap_layers=taps, num_patches=512,
        netf_nc=256, lr=2e-4,
    )
    train_step = build_train_step(
        plan, tap_layers=taps, num_patches=512, nce_temperature=0.33,
        lr=2e-4, compute_dtype=compute_dtype, donate=False,
    )
    tviews = jax.jit(
        lambda k: jax.random.normal(
            k, (1, 2, 128, 128, 128, 1), jnp.float32
        )
    )(jax.random.PRNGKey(4))
    tsegs = jnp.asarray(
        rng.integers(0, 10, (1, 128, 128, 128, 1)).astype(np.int32)
    )
    tstate, m = train_step(tstate, tviews, tsegs, jax.random.PRNGKey(5))
    float(m["loss"])  # compile + sync
    steps = []
    for _ in range(2):
        t0 = _t.perf_counter()
        for _ in range(3):
            tstate, m = train_step(
                tstate, tviews, tsegs, jax.random.PRNGKey(5)
            )
        float(m["loss"])
        steps.append((_t.perf_counter() - t0) / 3)
    t_step = max(min(steps) - dispatch_floor(), 1e-9)

    result = {
        "metric": "feature_extraction_256ct_seconds_per_chip",
        "value": round(t_full, 4),
        "unit": "s",
        "vs_baseline": round(1.0 / t_full, 3),
        "extra": {
            "sliding_window_mode_seconds": round(t_sw, 3),
            "patches_128_per_sec_per_chip": round(1.0 / t_patch, 2),
            "registration_solver_seconds_192": round(t_reg, 2),
            "pretrain_step_seconds_128crop": round(t_step, 3),
            "compute_dtype": "bfloat16",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
