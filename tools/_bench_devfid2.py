"""Dev 94M extraction Pareto: reference-exact sliding at overlap 0.8
(default) vs 0.5 vs full_tiled — seconds + mean voxelwise cosine against
the overlap-0.8 reference. Quantifies what the cheaper strategies trade
(VERDICT r2 item 4 follow-up; wave-20 measured full_tiled cos 0.7987).

PYTHONPATH=/root/repo:/root/.axon_site python tools/_bench_devfid2.py
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.extract import make_feature_extractor
from anatomix_tpu.models.registry import ANATOMIX_VARIANTS
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.utils.benchtools import pipeline_time

vol = jax.jit(
    lambda k: jax.random.normal(k, (1, 256, 256, 256, 1), jnp.float32)
)(jax.random.PRNGKey(1))

plan = build_plan(
    UnetConfig(**ANATOMIX_VARIANTS["anatomix-dev"]["unet_kwargs"])
)
params = init_params(plan, jax.random.PRNGKey(6))


@jax.jit
def _cos(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8
    return jnp.mean(num / den)


t0 = time.time()
ext_ref = make_feature_extractor(
    plan, params, strategy="sliding", roi_size=(128, 128, 128),
    overlap=0.8, compute_dtype=jnp.bfloat16,
)
# bf16 reference halves resident HBM (2.1 GB -> 1.05 GB at 256^3 x 32ch);
# the cosine is computed in f32 either way.
y_ref = jax.jit(lambda a: a.astype(jnp.bfloat16))(
    ext_ref.impl(vol, ext_ref.arrays)
)
float(jnp.sum(y_ref.astype(jnp.float32)))
# NOTE: never .delete() extractor `arrays` leaves — they share buffers
# with the source params pytree (other extractors would crash). Dropping
# the Python reference frees the non-shared packed arrays via GC.
del ext_ref
print(f"reference (sliding 0.8) computed ({time.time()-t0:.0f}s)",
      flush=True)

for name, kw in (
    ("sliding_0.5", dict(strategy="sliding", overlap=0.5)),
    ("full_tiled", dict(strategy="full_tiled")),
    ("sliding_0.25", dict(strategy="sliding", overlap=0.25)),
):
    ext = make_feature_extractor(
        plan, params, roi_size=(128, 128, 128),
        compute_dtype=jnp.bfloat16, **kw,
    )
    t = pipeline_time(ext.impl, vol, n=1, reps=2, args=(ext.arrays,))
    y = ext.impl(vol, ext.arrays)
    c = float(_cos(y, y_ref))
    y.delete()
    del ext, y
    print(f"{name}: {t:.3f} s, cosine vs sliding0.8 {c:.4f}", flush=True)
