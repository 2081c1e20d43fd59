"""Dev 94M: reference-exact sliding 256^3 seconds + full_tiled fidelity
(mean voxelwise cosine) at real scale — VERDICT r2 item 4. Run with
ANATOMIX_SCATTER_KERNEL to pick the stitcher."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.extract import make_feature_extractor
from anatomix_tpu.models.registry import ANATOMIX_VARIANTS
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.utils.benchtools import pipeline_time

print("scatter kernel:", os.environ.get("ANATOMIX_SCATTER_KERNEL", "0"),
      flush=True)
vol = jax.jit(
    lambda k: jax.random.normal(k, (1, 256, 256, 256, 1), jnp.float32)
)(jax.random.PRNGKey(1))

plan = build_plan(UnetConfig(**ANATOMIX_VARIANTS["anatomix-dev"]["unet_kwargs"]))
params = init_params(plan, jax.random.PRNGKey(6))

t0 = time.time()
ext_sw = make_feature_extractor(
    plan, params, strategy="sliding", roi_size=(128, 128, 128),
    overlap=0.8, compute_dtype=jnp.bfloat16,
)
t_sw = pipeline_time(ext_sw.impl, vol, n=1, reps=2, args=(ext_sw.arrays,))
print(f"dev sliding 256^3: {t_sw:.3f} s (setup {time.time()-t0:.0f}s)",
      flush=True)

ext_t = make_feature_extractor(
    plan, params, strategy="full_tiled", roi_size=(128, 128, 128),
    compute_dtype=jnp.bfloat16,
)
t_tl = pipeline_time(ext_t.impl, vol, n=2, reps=2, args=(ext_t.arrays,))
print(f"dev full_tiled 256^3: {t_tl:.3f} s", flush=True)


@jax.jit
def _cos(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8
    return jnp.mean(num / den)


y_sw = ext_sw.impl(vol, ext_sw.arrays)
y_tl = ext_t.impl(vol, ext_t.arrays)
print(f"full_tiled vs sliding cosine: {float(_cos(y_tl, y_sw)):.4f}",
      flush=True)
