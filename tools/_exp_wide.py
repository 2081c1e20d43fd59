"""HW A/B for the round-5 6M-forward levers:

1. standalone sparse conv: wide-assembly vs narrow at the 6M shapes
   (parity + chained timing);
2. full 6M fused fwd over {WIDE} x {D2S_EXIT} combos.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.ops.pallas.conv_block import (
    conv_block_sparse_halo,
    conv_block_sparse_halo_wide,
    prepack_sparse,
)
from anatomix_tpu.utils.benchtools import amortized_time

# (ci, co, block extent) — the 6M fused conv ladder at 128-cube
SHAPES = [
    (16, 16, 64),
    (32, 32, 32),
    (64, 64, 16),
    (128, 128, 8),
]

rng = np.random.default_rng(0)
for ci, co, s in SHAPES:
    x = jax.jit(
        lambda k, s=s, ci=ci: jax.random.normal(
            k, (1, s, s, s, 8 * ci), jnp.bfloat16
        )
    )(jax.random.PRNGKey(ci))
    wt = (rng.standard_normal((3, 3, 3, ci, co)) * 0.05).astype(np.float32)
    b = rng.standard_normal((co,)).astype(np.float32)
    p = prepack_sparse(wt, b, act="lrelu")

    narrow = np.asarray(
        conv_block_sparse_halo(
            x, p["w0"], p["w1"], p["w2"], p["b8"], act="lrelu"
        ),
        np.float32,
    )
    wide = np.asarray(
        conv_block_sparse_halo_wide(
            x, p["g1"], p["g2"], p["g3"], p["g4"], p["g5"], p["b8"],
            act="lrelu",
        ),
        np.float32,
    )
    md = np.abs(narrow - wide).max()
    rel = md / (np.abs(narrow).max() + 1e-8)

    def t_narrow(v, xx):
        out = conv_block_sparse_halo(
            xx + (v[0] * 1e-6).astype(xx.dtype), p["w0"], p["w1"],
            p["w2"], p["b8"], act="lrelu",
        )
        return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

    def t_wide(v, xx):
        out = conv_block_sparse_halo_wide(
            xx + (v[0] * 1e-6).astype(xx.dtype), p["g1"], p["g2"],
            p["g3"], p["g4"], p["g5"], p["b8"], act="lrelu",
        )
        return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

    v0 = jnp.zeros((1,), jnp.float32)
    n = 64 if s >= 32 else 128
    tn = amortized_time(t_narrow, v0, n=n, args=(x,))
    tw = amortized_time(t_wide, v0, n=n, args=(x,))
    gf = 2 * s ** 3 * 64 * ci * 8 * co / 1e9
    print(
        f"[{ci}->{co} @blk {s}] rel={rel:.2e}  narrow={tn * 1e3:.3f} ms "
        f"({gf / tn / 1e3:.0f} TF/s)  wide={tw * 1e3:.3f} ms "
        f"({gf / tw / 1e3:.0f} TF/s)",
        flush=True,
    )

# ---- full 6M fwd combos ----------------------------------------------------
from anatomix_tpu.extract import partition_params
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.extract import fold_batchnorm
from anatomix_tpu.models.unet_fused import prepack_fused, unet_apply_fused

plan = build_plan(
    UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16)
)
fplan, fparams = fold_batchnorm(plan, init_params(plan, jax.random.PRNGKey(0)))
pf = prepack_fused(fplan, fparams, input_spatial=(128, 128, 128),
                   compute_dtype=jnp.bfloat16)
arrs, combine = partition_params(pf)
x = jax.jit(
    lambda k: jax.random.normal(k, (1, 128, 128, 128, 1), jnp.bfloat16)
)(jax.random.PRNGKey(2))

COMBOS = [
    ("narrow", {"ANATOMIX_WIDE": "0"}),
    ("wide", {"ANATOMIX_WIDE": "1"}),
]

v0 = jnp.zeros((1,), jnp.float32)
for name, env in COMBOS:
    os.environ.update(env)

    def fwd(v, *a, _c=combine):
        return unet_apply_fused(
            fplan, _c(a), v, compute_dtype=jnp.bfloat16
        )[..., :1]

    def fwd_fold(v, xx, *a, _c=combine):
        out = unet_apply_fused(
            fplan, _c(a), xx + (v[0] * 1e-6).astype(xx.dtype),
            compute_dtype=jnp.bfloat16, emit="fold",
        )
        return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

    t_sp = amortized_time(fwd, x, n=8, reps=3, args=tuple(arrs))
    t_fo = amortized_time(fwd_fold, v0, n=8, reps=3,
                          args=(x,) + tuple(arrs))
    print(f"6M fwd 128 [{name}]: spatial {t_sp * 1e3:.2f} ms  "
          f"fold {t_fo * 1e3:.2f} ms", flush=True)
