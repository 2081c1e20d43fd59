"""ViT glue probes at production shapes (target: fwd <= 18 ms):

1. entry s2d: reshape/transpose form (~1.1 ms in-graph) vs a one-hot
   stride-2 conv that lets the MXU do the repack;
2. decoder per-sub-voxel GEMM: the (…, K*ci) -> (…, K, ci) split-view
   einsum (relayout) vs K lane-sliced GEMMs + lane concat.
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.ops.pallas.conv3x3 import space_to_depth_4d
from anatomix_tpu.utils.benchtools import amortized_time

rng = np.random.default_rng(0)
v0 = jnp.zeros((1,), jnp.float32)

# ---- 1. entry s2d -----------------------------------------------------------
x4 = jax.jit(
    lambda k: jax.random.normal(k, (1, 128, 128, 128), jnp.bfloat16)
)(jax.random.PRNGKey(0))

# one-hot (2,2,2,1,8) kernel, (ad, ah, aw)-major output channels
k = np.zeros((2, 2, 2, 1, 8), np.float32)
for ad in range(2):
    for ah in range(2):
        for aw in range(2):
            k[ad, ah, aw, 0, (ad * 2 + ah) * 2 + aw] = 1.0
kb = jnp.asarray(k, jnp.bfloat16)


def s2d_conv(x):
    return jax.lax.conv_general_dilated(
        x[..., None], kb, window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


ref = np.asarray(space_to_depth_4d(x4))
got = np.asarray(jax.jit(s2d_conv)(x4))
print("s2d one-hot conv exact:", np.array_equal(ref, got), flush=True)


def t_re(v, x):
    out = space_to_depth_4d(x + (v[0] * 1e-6).astype(x.dtype))
    return jnp.sum(out.astype(jnp.float32))[None] * 1e-6


def t_conv(v, x):
    out = s2d_conv(x + (v[0] * 1e-6).astype(x.dtype))
    return jnp.sum(out.astype(jnp.float32))[None] * 1e-6


t1 = amortized_time(t_re, v0, n=32, args=(x4,))
t2 = amortized_time(t_conv, v0, n=32, args=(x4,))
print(f"s2d_4d reshape {t1 * 1e3:.3f} ms | one-hot conv {t2 * 1e3:.3f} ms",
      flush=True)

# ---- 2. decoder grouped GEMM ------------------------------------------------
# level-2 production shape: grid 16³, K=8 sub-voxels, ci=co=32-ish
for K, ci, co in ((8, 198, 99), (64, 99, 32)):
    M = 16 ** 3
    y = jax.jit(
        lambda kk, K=K, ci=ci: jax.random.normal(
            kk, (1, 16, 16, 16, K * ci), jnp.bfloat16
        )
    )(jax.random.PRNGKey(K))
    w2 = jax.jit(
        lambda kk, ci=ci, co=co: jax.random.normal(
            kk, (ci, 8 * co), jnp.bfloat16
        )
    )(jax.random.PRNGKey(K + 1))

    def dec_view(v, yy):
        z = (yy + (v[0] * 1e-6).astype(yy.dtype)).reshape(
            yy.shape[:4] + (K, ci)
        )
        out = jnp.einsum(
            "bdhwkc,ce->bdhwke", z, w2,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

    def dec_slice(v, yy):
        z = yy + (v[0] * 1e-6).astype(yy.dtype)
        parts = [
            jnp.einsum(
                "bdhwc,ce->bdhwe", z[..., kk * ci: (kk + 1) * ci], w2,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            for kk in range(K)
        ]
        out = jnp.concatenate(parts, axis=-1)
        return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

    ta = amortized_time(dec_view, v0, n=16, args=(y,))
    tb = amortized_time(dec_slice, v0, n=16, args=(y,))
    print(f"decoder K={K} ci={ci}: view-einsum {ta * 1e3:.3f} ms | "
          f"lane-slice {tb * 1e3:.3f} ms", flush=True)
