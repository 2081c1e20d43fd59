"""Dev-94M reference-exact sliding 256³ at the production config
(sw_batch=2, overlap 0.8): one timed run — the A/B for the block-layout
trilinear decoder (wave-32 baseline: 20.925 s)."""

import time

import jax
import jax.numpy as jnp

from anatomix_tpu.extract import make_feature_extractor
from anatomix_tpu.models.registry import ANATOMIX_VARIANTS
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params

plan = build_plan(
    UnetConfig(**ANATOMIX_VARIANTS["anatomix-dev"]["unet_kwargs"])
)
params = init_params(plan, jax.random.PRNGKey(6))
vol256 = jax.jit(
    lambda k: jax.random.normal(k, (1, 256, 256, 256, 1), jnp.float32)
)(jax.random.PRNGKey(1))

ext = make_feature_extractor(
    plan, params, strategy="sliding", roi_size=(128, 128, 128),
    overlap=0.8, sw_batch_size=2, compute_dtype=jnp.bfloat16,
)
y = ext.impl(vol256, ext.arrays)
float(jnp.sum(y[0, 0, 0, :2]))  # compile+warm, scalar-fetch sync
y.delete()
for rep in range(2):
    t0 = time.perf_counter()
    y = ext.impl(vol256, ext.arrays)
    s = float(jnp.sum(y[0, 0, 0, :2]))
    t = time.perf_counter() - t0
    y.delete()
    print(f"dev sliding 256 sw_batch=2 rep{rep}: {t:.3f} s "
          f"(probe {s:.3e})", flush=True)
