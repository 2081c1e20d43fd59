"""Diagnose the sliding scatter's 3.17 ms/window: is the scan copying the
full canvas every step?

If per-window cost scales with CANVAS size at fixed window count/size, the
carry is being copied (1.1 GB f32 canvas ~ 2.7 ms/copy at HBM BW) and the
fix is structural; if it scales with window size only, the RMW itself is
the cost.

Variants: v0 = shipped lane-folded scan step; v1 = fori_loop with stacked
products (no scan xs); v2 = v0 with the canvas donated through jit.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.utils.benchtools import dispatch_floor  # noqa: E402

C = 16
R = 128
FOLD = 128 // C
NWIN = 32


def make_step(fold, lanes):
    def scatter_one(a, s, o, m):
        ow = o.astype(jnp.float32) * m
        r = s[2] % fold
        Lw = R + fold
        can = jax.lax.dynamic_slice(
            jnp.pad(ow, ((0, 0), (0, 0), (fold, fold), (0, 0))),
            (0, 0, fold - r, 0),
            (R, R, Lw, C),
        ).reshape(R, R, Lw // fold, lanes)
        off = (s[2] - r) // fold
        cur = jax.lax.dynamic_slice(
            a, (s[0], s[1], off, 0), (R, R, Lw // fold, lanes)
        )
        return jax.lax.dynamic_update_slice(
            a, cur + can, (s[0], s[1], off, 0)
        )

    return scatter_one


def main():
    rng = np.random.default_rng(0)
    floor = dispatch_floor()
    lanes = C * FOLD
    step = make_step(FOLD, lanes)

    starts = jnp.asarray(
        np.stack(
            [
                rng.integers(0, 64, NWIN),
                rng.integers(0, 64, NWIN),
                rng.integers(0, 96, NWIN),
            ],
            axis=1,
        ).astype(np.int32)
    )
    outs = jnp.asarray(
        rng.standard_normal((NWIN, R, R, R, C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    import time

    for D in (192, 256, 320):
        Wf = D // FOLD + 1
        acc0 = jnp.zeros((D, D, Wf, lanes), jnp.float32)

        @jax.jit
        def v0(acc, starts, outs):
            def body(a, xs):
                s, o = xs
                return step(a, s, o, jnp.float32(1.0)), None
            acc, _ = jax.lax.scan(body, acc, (starts, outs))
            return acc

        @jax.jit
        def v1(acc, starts, outs):
            def body(i, a):
                return step(a, starts[i], outs[i], jnp.float32(1.0))
            return jax.lax.fori_loop(0, NWIN, body, acc)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def v2(acc, starts, outs):
            def body(a, xs):
                s, o = xs
                return step(a, s, o, jnp.float32(1.0)), None
            acc, _ = jax.lax.scan(body, acc, (starts, outs))
            return acc

        for name, fn in (("v0 scan", v0), ("v1 fori", v1),
                         ("v2 scan+donate", v2)):
            acc = jnp.zeros((D, D, Wf, lanes), jnp.float32)
            r = fn(acc, starts, outs)
            _ = float(jnp.sum(r[:1, :1]))
            ts = []
            for _rep in range(3):
                acc = jnp.zeros((D, D, Wf, lanes), jnp.float32)
                t0 = time.perf_counter()
                r = fn(acc, starts, outs)
                _ = float(jnp.sum(r[:1, :1]))
                ts.append(time.perf_counter() - t0)
            t = (min(ts) - floor) / NWIN
            print(f"D={D} {name}: {t*1e3:.3f} ms/window", flush=True)


if __name__ == "__main__":
    main()
