"""Patch-throughput vs window batch for the 6M fold forward: B is a
grid dimension in every fused kernel, so batching amortizes per-kernel
fixed costs (DMA ramp, grid setup). patches/s = B / t_fwd(B)."""

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.extract import fold_batchnorm, partition_params
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.models.unet_fused import prepack_fused, unet_apply_fused
from anatomix_tpu.utils.benchtools import amortized_time

plan = build_plan(
    UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16)
)
fplan, fparams = fold_batchnorm(plan, init_params(plan, jax.random.PRNGKey(0)))
pf = prepack_fused(fplan, fparams, input_spatial=(128, 128, 128),
                   compute_dtype=jnp.bfloat16)
arrs, combine = partition_params(pf)
v0 = jnp.zeros((1,), jnp.float32)

for B in (1, 2, 4):
    x = jax.jit(
        lambda k, B=B: jax.random.normal(
            k, (B, 128, 128, 128, 1), jnp.bfloat16
        )
    )(jax.random.PRNGKey(2))

    def fwd_fold(v, xx, *a, _c=combine):
        out = unet_apply_fused(
            fplan, _c(a), xx + (v[0] * 1e-6).astype(xx.dtype),
            compute_dtype=jnp.bfloat16, emit="fold",
        )
        return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

    n = max(4, 8 // B)
    t = amortized_time(fwd_fold, v0, n=n, reps=3, args=(x,) + tuple(arrs))
    print(f"B={B}: {t * 1e3:.2f} ms -> {B / t:.1f} patches/s", flush=True)
