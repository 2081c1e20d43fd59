"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric: wall-clock seconds for sliding-window feature extraction of
a full 256³ CT with the 6M anatomix UNet (128³ windows, overlap 0.8,
Gaussian blending — the reference's registration-time configuration,
`/root/reference/anatomix/registration/convex_adam_utils.py:202-219`).
Target from BASELINE.json: < 1 s/chip on TPU v5e; `vs_baseline` is
`1.0 / seconds` (>1 = target beaten).

Also measured (reported in `extra`): 128³ patch throughput of the 6M UNet
forward (patches/sec/chip).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _measure(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    from anatomix_tpu.extract import fold_batchnorm, make_feature_extractor
    from anatomix_tpu.models.unet import (
        UnetConfig,
        build_plan,
        init_params,
        unet_apply,
    )

    compute_dtype = jnp.bfloat16
    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16)
    )
    params = init_params(plan, jax.random.PRNGKey(0))
    fplan, fparams = fold_batchnorm(plan, params)
    fparams = jax.tree_util.tree_map(jnp.asarray, fparams)

    # --- 128³ patch throughput ------------------------------------------------
    best_throughput = 0.0
    best_bs = 1
    for bs in (1, 2, 4, 8):
        x = jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((bs, 128, 128, 128, 1))
            .astype(np.float32)
        )
        fwd = jax.jit(
            lambda v: unet_apply(fplan, fparams, v, compute_dtype=compute_dtype)
        )
        try:
            t = _measure(fwd, x)
        except Exception:
            break
        throughput = bs / t
        if throughput > best_throughput:
            best_throughput, best_bs = throughput, bs

    # --- 256³ sliding-window extraction ---------------------------------------
    vol = jnp.asarray(
        np.random.default_rng(1)
        .standard_normal((1, 256, 256, 256, 1))
        .astype(np.float32)
    )
    best_sw = float("inf")
    best_sw_bs = 2
    for sw_bs in (2, 4, 8):
        extractor = make_feature_extractor(
            plan,
            params,
            roi_size=(128, 128, 128),
            sw_batch_size=sw_bs,
            overlap=0.8,
            compute_dtype=compute_dtype,
        )
        try:
            t = _measure(extractor, vol, warmup=1, iters=3)
        except Exception:
            break
        if t < best_sw:
            best_sw, best_sw_bs = t, sw_bs

    result = {
        "metric": "sliding_window_256ct_seconds_per_chip",
        "value": round(best_sw, 4),
        "unit": "s",
        "vs_baseline": round(1.0 / best_sw, 3),
        "extra": {
            "patches_128_per_sec_per_chip": round(best_throughput, 2),
            "patch_batch_size": best_bs,
            "sw_batch_size": best_sw_bs,
            "compute_dtype": "bfloat16",
            "device": str(jax.devices()[0]),
            "num_windows_256": 343,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
