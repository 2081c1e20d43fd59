"""Experiment: entry stage (1-ch s2d + 1->16 conv + bias + act) as ONE
XLA stride-2 4^3 conv that emits the 128-lane block tensor directly.

out[i,j,k,(ad,ah,aw)*co+c] = sum_t W4[t,u,v,0,...] * x[2i+t-1, ...]
with W4[t,u,v,0,(a)*co+c] = w[t-ad,u-ah,v-aw,0,c] where in range.

Run on CPU for parity (PARITY=1), on TPU for timing.
"""
import os
import sys

import numpy as np

PARITY = os.environ.get("PARITY") == "1"
if PARITY:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if PARITY:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def entry_block_weights(w: np.ndarray) -> np.ndarray:
    """DHWIO (3,3,3,1,co) -> (4,4,4,1,8co) stride-2 block-conv weights."""
    w = np.asarray(w, np.float32)
    co = w.shape[-1]
    W4 = np.zeros((4, 4, 4, 1, 8 * co), np.float32)
    for ad in range(2):
        for ah in range(2):
            for aw in range(2):
                g = ((ad * 2 + ah) * 2 + aw) * co
                W4[ad:ad + 3, ah:ah + 3, aw:aw + 3, :, g:g + co] += w
    return W4


def entry_conv4(x, W4, b8, act="relu", pad_mode="reflect",
                compute_dtype=jnp.bfloat16):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode=pad_mode)
    out = jax.lax.conv_general_dilated(
        xp.astype(compute_dtype), W4.astype(compute_dtype),
        window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    out = out + b8
    if act == "relu":
        out = jnp.maximum(out, 0)
    return out.astype(compute_dtype)


def main():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 3, 3, 1, 16)).astype(np.float32) * 0.2
    b = rng.standard_normal((16,)).astype(np.float32) * 0.1
    W4 = jnp.asarray(entry_block_weights(w))
    b8 = jnp.asarray(np.tile(b, 8))

    if PARITY:
        from anatomix_tpu.ops.conv import conv3d
        from anatomix_tpu.ops.pallas.conv3x3 import _space_to_depth

        x = jnp.asarray(
            rng.standard_normal((1, 32, 32, 32, 1)).astype(np.float32)
        )
        ref = conv3d(x, jnp.asarray(w), jnp.asarray(b), padding="SAME",
                     pad_type="reflect", compute_dtype=jnp.float32)
        ref = jnp.maximum(ref, 0)
        ref_block = _space_to_depth(ref)
        got = entry_conv4(x, W4, b8, compute_dtype=jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref_block)))
        rel = err / float(jnp.max(jnp.abs(ref_block)))
        print(f"parity max abs err {err:.3e} rel {rel:.3e}")
        assert rel < 1e-5, "parity FAILED"
        print("parity OK")
        return

    from anatomix_tpu.ops.pallas.conv3x3 import prepack_conv
    from anatomix_tpu.models.unet_fused import _s2d, _conv_block_dense
    from anatomix_tpu.utils.benchtools import pipeline_time

    x = jax.jit(
        lambda k: jax.random.normal(k, (1, 128, 128, 128, 1), jnp.bfloat16)
    )(jax.random.PRNGKey(1))

    # current path: XLA s2d + dense block pallas conv
    packed = prepack_conv(w, b, spatial=(128, 128, 128), s2d="on",
                          act="relu", compute_dtype=jnp.bfloat16)

    def current(v):
        xb = _s2d(v, False)
        return _conv_block_dense(xb, packed, "reflect", jnp.bfloat16, False)

    def conv4(v):
        return entry_conv4(v, W4, b8)

    t_cur = pipeline_time(current, x, n=16, reps=3)
    t_new = pipeline_time(conv4, x, n=16, reps=3)
    print(f"current s2d+dense: {t_cur*1e3:.3f} ms")
    print(f"xla conv4 stride2: {t_new*1e3:.3f} ms")


if __name__ == "__main__":
    main()
