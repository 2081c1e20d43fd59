import jax, jax.numpy as jnp
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.extract import fold_batchnorm
from anatomix_tpu.models.unet_fused import prepack_fused, unet_apply_fused
from anatomix_tpu.utils.benchtools import amortized_time

plan = build_plan(UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16))
params = init_params(plan, jax.random.PRNGKey(0))
fplan, fparams = fold_batchnorm(plan, params)
pf = prepack_fused(fplan, fparams, input_spatial=(128,128,128), compute_dtype=jnp.bfloat16)
x = jax.jit(lambda k: jax.random.normal(k, (1,128,128,128,1), jnp.bfloat16))(jax.random.PRNGKey(2))
fwd = lambda v: unet_apply_fused(fplan, pf, v, compute_dtype=jnp.bfloat16)[..., :1]
t = amortized_time(fwd, x, n=8, reps=3)
print(f"6M UNet fwd @128^3 fused: {t*1e3:.2f} ms")
