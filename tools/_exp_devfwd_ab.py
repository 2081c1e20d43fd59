"""A/B the 94M dev fused forward @128³ over the round-4 decoder levers:
baseline (block-trilinear tree) vs cat kernel vs flat stencil vs both.
Env gates are read at trace time; a fresh closure per combo forces a
retrace."""

import os

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.extract import partition_params
from anatomix_tpu.models.registry import ANATOMIX_VARIANTS
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.models.unet_fused import prepack_fused, unet_apply_fused
from anatomix_tpu.utils.benchtools import amortized_time

plan = build_plan(
    UnetConfig(**ANATOMIX_VARIANTS["anatomix-dev"]["unet_kwargs"])
)
pf = prepack_fused(
    plan, init_params(plan, jax.random.PRNGKey(0)),
    input_spatial=(128, 128, 128), compute_dtype=jnp.bfloat16,
)
arrs, combine = partition_params(pf)
x = jax.jit(
    lambda k: jax.random.normal(k, (1, 128, 128, 128, 1), jnp.bfloat16)
)(jax.random.PRNGKey(2))

COMBOS = [
    ("base", {"ANATOMIX_CAT_KERNEL": "0", "ANATOMIX_TRILIN_FLAT": "0"}),
    ("cat", {"ANATOMIX_CAT_KERNEL": "1", "ANATOMIX_TRILIN_FLAT": "0"}),
    ("flat", {"ANATOMIX_CAT_KERNEL": "0", "ANATOMIX_TRILIN_FLAT": "1"}),
    ("cat+flat",
     {"ANATOMIX_CAT_KERNEL": "1", "ANATOMIX_TRILIN_FLAT": "1"}),
]

for name, env in COMBOS:
    os.environ.update(env)

    def fwd(v, *a, _c=combine):
        return unet_apply_fused(
            plan, _c(a), v, compute_dtype=jnp.bfloat16
        )[..., :1]

    t = amortized_time(fwd, x, n=4, reps=2, args=tuple(arrs))
    print(f"dev fwd 128 [{name}]: {t * 1e3:.1f} ms", flush=True)
