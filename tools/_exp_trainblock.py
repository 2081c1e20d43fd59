"""HW A/B: round-3 per-conv train path vs the round-5 block-space walk
(ANATOMIX_TRAIN_BLOCK) at the reference 128-crop pretraining config."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.models.unet import UnetConfig, build_plan
from anatomix_tpu.pretraining.train_step import (
    build_train_step,
    init_train_state,
)
from anatomix_tpu.utils.benchtools import dispatch_floor

plan = build_plan(
    UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16)
)
taps = (27, 31, 38, 45, 52, 65)
state0 = init_train_state(
    plan, jax.random.PRNGKey(0), tap_layers=taps, num_patches=512,
    netf_nc=256, lr=2e-4,
)
rng = np.random.default_rng(0)
views = jax.jit(
    lambda k: jax.random.normal(k, (1, 2, 128, 128, 128, 1), jnp.float32)
)(jax.random.PRNGKey(1))
segs = jnp.asarray(
    rng.integers(0, 10, (1, 128, 128, 128, 1)).astype(np.int32)
)

for mode in ("0", "1"):
    os.environ["ANATOMIX_TRAIN_BLOCK"] = mode
    step = build_train_step(
        plan, tap_layers=taps, num_patches=512, nce_temperature=0.33,
        lr=2e-4, compute_dtype=jnp.bfloat16, donate=False,
        conv_impl="pallas_train",
    )
    st = state0
    t0 = time.perf_counter()
    st, m = step(st, views, segs, jax.random.PRNGKey(2))
    loss = float(m["loss"])
    print(f"[block={mode}] compile+first {time.perf_counter() - t0:.1f} s "
          f"loss={loss:.5f}", flush=True)
    floor = dispatch_floor()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            st, m = step(st, views, segs, jax.random.PRNGKey(2))
        _ = float(m["loss"])  # sync
        ts.append((time.perf_counter() - t0 - floor) / 3)
    print(f"[block={mode}] step: {min(ts) * 1e3:.1f} ms "
          f"(floor {floor * 1e3:.1f})", flush=True)
