"""Isolated A/B of two train-step glue suspects (wave-26 D attribution,
tools/logs/w26_trtrain.log — step 274 ms, conv kernels only 80 ms):

1. max-pool 2x2x2 backward: custom argmax/one-hot VJP (`ops/pool._max_pool2x`)
   vs XLA's reduce_window select-and-scatter adjoint. The custom path was
   built because select-and-scatter read 8.3 ms in the round-3 trace, but
   the wave-26 trace attributes ~13-17 ms to pool.py:85 one-hot broadcasts
   (s32 iota-eq at (2,64,2,64,2,64,2,16)) plus a ~19 ms unattributed
   reshape that smells like its layout shuffles — the "optimization" may
   have lost.

2. batch_norm_train fwd+bwd (f32 stats + bf16 folded apply) vs a
   hand-derived 3-pass backward (reduce(dy), reduce(dy*xhat), elementwise)
   — XLA's autodiff through the mean/var graph shows ~36 ms across the
   step's norms.

Run via the TPU queue only.
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.ops.pool import _max_pool2x, _reduce_max  # noqa: E402
from anatomix_tpu.ops.norms import batch_norm_train  # noqa: E402
from anatomix_tpu.utils.benchtools import pipeline_time  # noqa: E402

B, D, C = 2, 128, 16


def main():
    key = jax.random.PRNGKey(0)
    x = jax.jit(
        lambda k: jax.random.normal(k, (B, D, D, D, C), jnp.bfloat16)
    )(key)

    # --- pool backward A/B (chained fwd+bwd to clear the dispatch floor)
    def chain(pool):
        def run(x):
            for _ in range(8):
                def loss(v):
                    return jnp.sum(pool(v).astype(jnp.float32) ** 2)
                g = jax.grad(loss)(x)
                x = x + g.astype(x.dtype) * 1e-3
            return x
        return run

    t_custom = pipeline_time(chain(_max_pool2x), x, n=2, reps=3)
    t_xla = pipeline_time(
        chain(lambda v: _reduce_max(v, (2, 2, 2), (2, 2, 2))), x, n=2,
        reps=3,
    )
    print(f"pool fwd+bwd custom VJP: {t_custom / 8 * 1e3:.3f} ms",
          flush=True)
    print(f"pool fwd+bwd XLA s&s   : {t_xla / 8 * 1e3:.3f} ms", flush=True)

    # --- batch-norm train fwd+bwd: current autodiff vs hand 3-pass bwd
    rm = jnp.zeros((C,), jnp.float32)
    rv = jnp.ones((C,), jnp.float32)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    import os

    def bn_auto(x, scale, bias):
        # the production default now IS the custom VJP (ANATOMIX_BN_VJP=1,
        # read at trace time) — force the autodiff arm off explicitly
        os.environ["ANATOMIX_BN_VJP"] = "0"
        y, _, _ = batch_norm_train(x, rm, rv, scale, bias)
        os.environ["ANATOMIX_BN_VJP"] = "1"
        return y

    @jax.custom_vjp
    def bn_hand(x, scale, bias):
        return _bn_fwd(x, scale, bias)[0]

    def _bn_fwd(x, scale, bias):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2, 3))
        var = jnp.mean(jnp.square(x32), axis=(0, 1, 2, 3)) - mean ** 2
        inv = jax.lax.rsqrt(var + 1e-5)
        a = inv * scale
        m_b = mean.astype(x.dtype)
        bshift = bias + (m_b.astype(jnp.float32) - mean) * a
        y = (x - m_b) * a.astype(x.dtype) + bshift.astype(x.dtype)
        return y, (x, mean, inv, scale)

    def _bn_bwd(res, dy):
        x, mean, inv, scale = res
        n = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
        dy32 = dy.astype(jnp.float32)
        xhat = (x.astype(jnp.float32) - mean) * inv
        s_dy = jnp.sum(dy32, axis=(0, 1, 2, 3))
        s_dyx = jnp.sum(dy32 * xhat, axis=(0, 1, 2, 3))
        dx = (scale * inv) * (dy32 - s_dy / n - xhat * (s_dyx / n))
        return dx.astype(x.dtype), s_dyx, s_dy

    bn_hand.defvjp(_bn_fwd, _bn_bwd)

    # random target: sum((y - t)^2) — a plain sum(y^2) is degenerate for
    # BN (the analytic dx cancels to ~0, so both paths just measure their
    # own rounding noise)
    t = jax.jit(
        lambda k: jax.random.normal(k, (B, D, D, D, C), jnp.float32)
    )(jax.random.PRNGKey(7))

    def bn_chain(bn):
        # t rides as a jit ARGUMENT: a 268 MB closure constant exceeded
        # the tunnel remote-compile payload (HTTP 413, first wave-27 run)
        def run(x, scale, bias, t):
            for _ in range(8):
                def loss(v, s, b):
                    return jnp.sum(
                        (bn(v, s, b).astype(jnp.float32) - t) ** 2
                    )
                gx, gs, gb = jax.grad(loss, argnums=(0, 1, 2))(
                    x, scale, bias
                )
                x = x + gx.astype(x.dtype) * 1e-3
                scale = scale + gs * 1e-3
                bias = bias + gb * 1e-3
            # pipeline_time sums a single array output; fold scale/bias in
            return x + (jnp.sum(scale) + jnp.sum(bias)).astype(x.dtype)
        return run

    # numeric sanity first
    ga = jax.jit(jax.grad(
        lambda v, tt: jnp.sum(
            (bn_auto(v, scale, bias).astype(jnp.float32) - tt) ** 2
        )
    ))(x, t)
    gh = jax.jit(jax.grad(
        lambda v, tt: jnp.sum(
            (bn_hand(v, scale, bias).astype(jnp.float32) - tt) ** 2
        )
    ))(x, t)
    err = float(jnp.abs(ga.astype(jnp.float32)
                        - gh.astype(jnp.float32)).max())
    print(f"bn dx |auto - hand| max = {err:.3e}", flush=True)

    t_auto = pipeline_time(bn_chain(bn_auto), x, n=2, reps=3,
                           args=(scale, bias, t))
    t_hand = pipeline_time(bn_chain(bn_hand), x, n=2, reps=3,
                           args=(scale, bias, t))
    print(f"bn fwd+bwd autodiff : {t_auto / 8 * 1e3:.3f} ms", flush=True)
    print(f"bn fwd+bwd hand VJP : {t_hand / 8 * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
