"""Isolated fwd/bwd costs of the differentiable sparse conv at the
reference 128-crop training shapes (B=2 views, block 64^3, 16ch):
attributes the 73.5 ms of dx + 26.6 ms of wgrad in the round-3 trace."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.ops.pallas.conv_block_train import (  # noqa: E402
    conv_block_sparse_train,
)
from anatomix_tpu.utils.benchtools import dispatch_floor  # noqa: E402


def measure(fn, args, n=8):
    f = jax.jit(fn)
    v = f(*args)
    _ = float(v)
    floor = dispatch_floor()
    ts = []
    for _rep in range(3):
        t0 = time.perf_counter()
        for _i in range(n):
            v = f(*args)
        _ = float(v)
        ts.append((time.perf_counter() - t0 - floor) / n)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    for (B, d, ci, co) in ((2, 64, 16, 16), (2, 32, 32, 32)):
        x = jnp.asarray(
            rng.standard_normal((B, d, d, d, 8 * ci)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.1
        )
        b = jnp.asarray(rng.standard_normal(co).astype(np.float32))

        def fwd(x, w, b):
            y = conv_block_sparse_train(
                x, w, b, "lrelu", "reflect", jnp.bfloat16
            )
            return jnp.sum(y.astype(jnp.float32))

        t_f = measure(fwd, (x, w, b))

        def loss_all(x, w, b):
            return fwd(x, w, b)

        gx = jax.grad(loss_all, argnums=0)
        gw = jax.grad(loss_all, argnums=1)
        gall = jax.grad(loss_all, argnums=(0, 1, 2))

        def run_gx(x, w, b):
            return jnp.sum(gx(x, w, b).astype(jnp.float32))

        def run_gw(x, w, b):
            return jnp.sum(gw(x, w, b).astype(jnp.float32))

        def run_gall(x, w, b):
            g = gall(x, w, b)
            return sum(jnp.sum(t.astype(jnp.float32)) for t in g)

        t_gx = measure(run_gx, (x, w, b))
        t_gw = measure(run_gw, (x, w, b))
        t_ga = measure(run_gall, (x, w, b))
        print(
            f"B={B} d={d} ci={ci}: fwd {t_f*1e3:.2f} ms, "
            f"fwd+dx {t_gx*1e3:.2f}, fwd+dw {t_gw*1e3:.2f}, "
            f"fwd+all {t_ga*1e3:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
