import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params, unet_apply
from anatomix_tpu.models.unet_fused import prepack_fused, unet_apply_fused
from anatomix_tpu.extract import partition_params
from anatomix_tpu.utils.benchtools import amortized_time

cfg = UnetConfig(dimension=3, input_nc=1, output_nc=32, num_downs=5, ngf=32,
                 norm="instance", pooling="Avg", interp="trilinear", norm_eps=1e-2)
plan = build_plan(cfg)
params = init_params(plan, jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(jnp.asarray, params)
x = jax.jit(lambda k: jax.random.normal(k, (1,128,128,128,1), jnp.bfloat16))(jax.random.PRNGKey(2))

pf = prepack_fused(plan, params, input_spatial=(128,128,128), compute_dtype=jnp.bfloat16)
arrs, combine = partition_params(pf)
@jax.jit
def fwd_f_impl(v, a):
    return unet_apply_fused(plan, combine(a), v, compute_dtype=jnp.bfloat16)[..., :1]
def fwd_f(v, *a):
    return unet_apply_fused(plan, combine(a), v, compute_dtype=jnp.bfloat16)[..., :1]
tf = amortized_time(fwd_f, x, n=4, reps=2, args=tuple(arrs))
print(f"94M dev UNet fwd @128^3 fused: {tf*1e3:.1f} ms", flush=True)

xarrs, xcombine = partition_params(params)
@jax.jit
def fwd_x_impl(v, a):
    return unet_apply(plan, xcombine(a), v, compute_dtype=jnp.bfloat16)[..., :1]
def fwd_x(v, *a):
    return unet_apply(plan, xcombine(a), v, compute_dtype=jnp.bfloat16)[..., :1]
tx = amortized_time(fwd_x, x, n=2, reps=1, args=tuple(xarrs))
print(f"94M dev UNet fwd @128^3 XLA:   {tx*1e3:.1f} ms", flush=True)
