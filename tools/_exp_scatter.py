"""Scatter-add strategies for sliding-window stitching.

The ViT 256^3 sliding trace shows 6.3 s (of 19.6) in the scatter:
dynamic_update_slice at w-starts {0,25,50,...} is sublane-unaligned and
the (..., 32)-channel f32 accumulator is 4x lane-padded. Strategies:

  S0: current — acc (D,H,W,C), RMW at (s0,s1,s2,0)
  S1: fold (W,C)->128 lanes, canvas-align w to 8f (lane+sublane aligned)
  S2: fold, align w to f only (lane-aligned, sublane-unaligned)
  S4: no fold, canvas-align w to 8 (sublane-aligned, lanes still padded)

All shift the window product into a static canvas with one dynamic_slice,
then do an aligned (or partially aligned) RMW.

PYTHONPATH=/root/repo:/root/.axon_site python tools/_exp_scatter.py
"""
import functools
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.ops.sliding_window import (
    compute_window_starts,
    gaussian_importance_map,
)
from anatomix_tpu.utils.benchtools import dispatch_floor

C = 32
ROI = 128
D = H = W = 256
starts_np = compute_window_starts((D, H, W), (ROI,) * 3, 0.8)
N = len(starts_np)
print(f"{N} windows")

imp = jnp.asarray(gaussian_importance_map((ROI,) * 3))[..., None]
starts = jnp.asarray(starts_np)


def scan_scatter(o, strategy):
    """o: (roi,roi,roi,C) bf16 fake window output (reused per window)."""
    ow0 = o.astype(jnp.float32) * imp  # (roi,roi,roi,C) f32

    if strategy == "s0":
        acc0 = jnp.zeros((D, H, W, C), jnp.float32)

        def body(acc, s):
            cur = jax.lax.dynamic_slice(
                acc, (s[0], s[1], s[2], 0), (ROI, ROI, ROI, C)
            )
            return jax.lax.dynamic_update_slice(
                acc, cur + ow0, (s[0], s[1], s[2], 0)
            ), None

        acc, _ = jax.lax.scan(body, acc0, starts)
        return jnp.sum(acc[::16, ::16, ::16])

    if strategy in ("s1", "s2"):
        f = 128 // C
        A = 8 * f if strategy == "s1" else f  # w alignment granularity
        Lw = ROI + A            # canvas width, multiple of f
        acc0 = jnp.zeros((D, H, (W + A) // f, 128), jnp.float32)
        owp = jnp.pad(ow0, ((0, 0), (0, 0), (A, A), (0, 0)))

        def body(acc, s):
            r = s[2] % A
            can = jax.lax.dynamic_slice(
                owp, (0, 0, A - r, 0), (ROI, ROI, Lw, C)
            ).reshape(ROI, ROI, Lw // f, 128)
            off = (s[2] - r) // f
            cur = jax.lax.dynamic_slice(
                acc, (s[0], s[1], off, 0), (ROI, ROI, Lw // f, 128)
            )
            return jax.lax.dynamic_update_slice(
                acc, cur + can, (s[0], s[1], off, 0)
            ), None

        acc, _ = jax.lax.scan(body, acc0, starts)
        full = acc.reshape(D, H, W + A, C)[:, :, :W]
        return jnp.sum(full[::16, ::16, ::16])

    if strategy == "s4":
        A = 8
        Lw = ROI + A
        acc0 = jnp.zeros((D, H, W + A, C), jnp.float32)
        owp = jnp.pad(ow0, ((0, 0), (0, 0), (A, A), (0, 0)))

        def body(acc, s):
            r = s[2] % A
            can = jax.lax.dynamic_slice(
                owp, (0, 0, A - r, 0), (ROI, ROI, Lw, C)
            )
            off = s[2] - r
            cur = jax.lax.dynamic_slice(
                acc, (s[0], s[1], off, 0), (ROI, ROI, Lw, C)
            )
            return jax.lax.dynamic_update_slice(
                acc, cur + can, (s[0], s[1], off, 0)
            ), None

        acc, _ = jax.lax.scan(body, acc0, starts)
        return jnp.sum(acc[:, :, :W][::16, ::16, ::16])

    if strategy == "s6":
        # s2 with the canvas shifted in bf16 (product rounded to bf16
        # before the shift; the accumulate stays f32)
        f = 128 // C
        Lw = ROI + f
        acc0 = jnp.zeros((D, H, (W + f) // f, 128), jnp.float32)
        owb = jnp.pad(
            ow0.astype(jnp.bfloat16), ((0, 0), (0, 0), (f, f), (0, 0))
        )

        def body(acc, s):
            r = s[2] % f
            can = jax.lax.dynamic_slice(
                owb, (0, 0, f - r, 0), (ROI, ROI, Lw, C)
            ).reshape(ROI, ROI, Lw // f, 128)
            off = (s[2] - r) // f
            cur = jax.lax.dynamic_slice(
                acc, (s[0], s[1], off, 0), (ROI, ROI, Lw // f, 128)
            )
            return jax.lax.dynamic_update_slice(
                acc, cur + can.astype(jnp.float32), (s[0], s[1], off, 0)
            ), None

        acc, _ = jax.lax.scan(body, acc0, starts)
        full = acc.reshape(D, H, W + f, C)[:, :, :W]
        return jnp.sum(full[::16, ::16, ::16])

    if strategy == "s5":
        # folded acc + lax.switch over the f static w-shifts: the product,
        # pad, and fold-reshape become static ops fusable into the update
        f = 128 // C
        Lw = ROI + f
        acc0 = jnp.zeros((D, H, (W + f) // f, 128), jnp.float32)

        def body(acc, s):
            r = s[2] % f
            off = (s[2] - r) // f

            def mk(rr):
                def branch(a):
                    can = jnp.pad(
                        ow0, ((0, 0), (0, 0), (rr, f - rr), (0, 0))
                    ).reshape(ROI, ROI, Lw // f, 128)
                    cur = jax.lax.dynamic_slice(
                        a, (s[0], s[1], off, 0), (ROI, ROI, Lw // f, 128)
                    )
                    return jax.lax.dynamic_update_slice(
                        a, cur + can, (s[0], s[1], off, 0)
                    )
                return branch

            return jax.lax.switch(r, [mk(rr) for rr in range(f)], acc), None

        acc, _ = jax.lax.scan(body, acc0, starts)
        full = acc.reshape(D, H, W + f, C)[:, :, :W]
        return jnp.sum(full[::16, ::16, ::16])

    raise ValueError(strategy)


def main():
    o = jax.jit(
        lambda k: jax.random.normal(k, (ROI, ROI, ROI, C), jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    floor = dispatch_floor()
    vals = {}
    for strat in ("s6",):
        m = jax.jit(functools.partial(scan_scatter, strategy=strat))
        v = float(m(o))
        times = []
        for _ in range(3):
            t0 = _time.perf_counter()
            float(m(o))
            times.append(_time.perf_counter() - t0)
        times.sort()
        t = times[1] - floor
        vals[strat] = v
        print(f"{strat}: {t*1e3:8.1f} ms total  {t/N*1e3:6.3f} ms/window  "
              f"probe={v:.1f}", flush=True)
    # all strategies must accumulate the same values
    print("done")


if __name__ == "__main__":
    main()
