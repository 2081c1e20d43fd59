import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.extract import make_feature_extractor
from anatomix_tpu.utils.benchtools import pipeline_time

plan = build_plan(UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16))
params = init_params(plan, jax.random.PRNGKey(0))
vol = jax.jit(lambda k: jax.random.normal(k, (1,256,256,256,1), jnp.float32))(jax.random.PRNGKey(1))
fx = make_feature_extractor(plan, params, strategy="sliding", roi_size=(128,128,128),
                            sw_batch_size=8, overlap=0.8, compute_dtype=jnp.bfloat16)
t = pipeline_time(fx, vol, n=1, reps=2)
print(f"sliding 256^3 (343 win): {t:.2f} s")
