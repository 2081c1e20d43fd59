"""Probe: can the d2s exit emit the spatial (…, 2w, C) minor layout
directly from block space, killing the 4.5 ms XLA relayout
(reshape 2.65 + copy 1.89 in the wave-27 ViT trace)?

Row-major identity: a (td, th, w, 2C) plane reshaped to
(td, th, 2w, C) IS the w-interleaved spatial form (element (k, p*C+c)
-> (2k+p, c)). The kernel then writes out blocks whose final XLA
reshape (d,2,h,2,2w,C) -> (2d,2h,2w,C) merges only major dims (free).
Candidates, most-direct first:

  v1: value reshape (w, 2C) -> (2w, C) in-kernel (minor-dim split —
      the fold kernel's comments say minor MERGES are unsupported;
      split direction untested).
  v2: pltpu.repeat along sublanes + iota parity select (depends on
      np.repeat-like semantics — also probed here).

Run CPU-interpret first (semantics), then via the TPU queue (Mosaic).
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

INTERP = jax.default_backend() == "cpu"
C = 32


def _kernel_v1(y_ref, out_ref, *, C, w):
    td, th = y_ref.shape[0], y_ref.shape[1]
    for a in range(2):
        for b in range(2):
            g = (a * 2 + b) * 2 * C
            plane = y_ref[..., g: g + 2 * C]
            out_ref[:, a, :, b] = plane.reshape(td, th, 2 * w, C)


def d2s_interleave_v1(y, interpret):
    B, d, h, w, c8 = y.shape
    td, th = (8, 8) if d % 8 == 0 else (1, 1)

    def one(v):
        out6 = pl.pallas_call(
            functools.partial(_kernel_v1, C=C, w=w),
            grid=(d // td, h // th),
            in_specs=[pl.BlockSpec((td, th, w, c8), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (td, 2, th, 2, 2 * w, C), lambda i, j: (i, 0, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((d, 2, h, 2, 2 * w, C), y.dtype),
            interpret=interpret,
        )(v)
        return out6.reshape(2 * d, 2 * h, 2 * w, C)

    return jax.vmap(one)(y)


def main():
    rng = np.random.default_rng(0)
    d = h = w = 8 if INTERP else 64
    y = jnp.asarray(
        rng.standard_normal((1, d, h, w, 8 * C)).astype(np.float32)
    )

    from anatomix_tpu.ops.pallas.reshuffle import depth_to_space
    ref = np.asarray(depth_to_space(y, interpret=INTERP))

    # --- v1: in-kernel minor-split reshape
    try:
        got = np.asarray(d2s_interleave_v1(y, INTERP))
        err = np.abs(got - ref).max()
        print(f"v1 interleave reshape: OK, max err {err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001 — probe
        print(f"v1 interleave reshape: FAIL {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # --- production kernels built on the same minor-split move
    try:
        from anatomix_tpu.ops.pallas.reshuffle import (
            depth_to_space_interleave,
        )

        sub = jnp.asarray(
            rng.standard_normal((1, 8 * C)).astype(np.float32)
        )
        got = np.asarray(depth_to_space_interleave(
            y, sub=sub, out_dtype=jnp.float32, interpret=INTERP
        ))
        ref2 = np.asarray(depth_to_space(
            y, sub=sub, out_dtype=jnp.float32, interpret=INTERP
        ))
        err = np.abs(got - ref2).max()
        print(f"depth_to_space_interleave: OK, max err {err:.2e}",
              flush=True)
    except Exception as e:  # noqa: BLE001 — probe
        print(f"depth_to_space_interleave: FAIL {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    try:
        from anatomix_tpu.ops.pallas.conv3x3 import space_to_depth_4d
        from anatomix_tpu.ops.pallas.reshuffle import space_to_depth_c1

        x4 = jnp.asarray(
            rng.standard_normal((1, 2 * d, 2 * h, 2 * w))
            .astype(np.float32)
        )
        got = np.asarray(space_to_depth_c1(x4, interpret=INTERP))
        ref3 = np.asarray(space_to_depth_4d(x4))
        err = np.abs(got - ref3).max()
        print(f"space_to_depth_c1: OK, max err {err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001 — probe
        print(f"space_to_depth_c1: FAIL {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # --- pltpu.repeat semantics (np.repeat-like [e0,e0,e1,e1] vs
    # tile-like [e0,e1,e0,e1]) on the sublane axis
    def _kernel_rep(x_ref, out_ref):
        out_ref[...] = pltpu.repeat(x_ref[...], 2, axis=0)

    try:
        x = jnp.asarray(np.arange(8 * 128, dtype=np.float32)
                        .reshape(8, 128))
        out = pl.pallas_call(
            _kernel_rep,
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
            interpret=INTERP,
        )(x)
        out = np.asarray(out)
        if np.array_equal(out[:2, 0], [0.0, 0.0]):
            print("pltpu.repeat: np.repeat-like (element dup)", flush=True)
        elif np.array_equal(out[:2, 0], [0.0, 128.0]) and np.array_equal(
            out[8:9, 0], [0.0]
        ):
            print("pltpu.repeat: tile-like (array concat)", flush=True)
        else:
            print(f"pltpu.repeat: other ({out[:3, 0]}, {out[8:11, 0]})",
                  flush=True)
    except Exception as e:  # noqa: BLE001 — probe
        print(f"pltpu.repeat: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def probe_d2s8():
    """Factor-8 PACKED decoder exit (block-space ViT decoder,
    ANATOMIX_DECODER_BLOCK): 4-slice lane gather + plain (w,8C) stores,
    no minor-split reshape -- expected legal; fused subtract included.
    Also times it at the production shape."""
    import time

    from anatomix_tpu.ops.pallas.reshuffle import (
        depth_to_space,
        depth_to_space8,
    )

    rng = np.random.default_rng(1)
    d = 2 if INTERP else 16
    y = jnp.asarray(
        rng.standard_normal((1, d, d, d, 512 * C)).astype(np.float32)
    )
    sub = jnp.asarray(rng.standard_normal((1, 512 * C)).astype(np.float32))

    @jax.jit
    def composed(v, s):
        z = v - s[:, None, None, None, :]
        for _ in range(3):
            z = depth_to_space(z, interpret=INTERP)
        return z

    ref = np.asarray(composed(y, sub))
    try:
        got = np.asarray(depth_to_space8(
            y, sub=sub, out_dtype=jnp.float32, interpret=INTERP
        ))
        err = np.abs(got.reshape(ref.shape) - ref).max()
        print(f"depth_to_space8 packed: OK, max err {err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001 -- probe
        print(f"depth_to_space8 packed: FAIL {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return
    if INTERP:
        return

    @jax.jit
    def chain(v, s):
        def body(_, carry):
            vv, acc = carry
            out = depth_to_space8(vv, sub=s, out_dtype=jnp.float32)
            return (vv * 0.9999, acc + jnp.sum(out))
        _, acc = jax.lax.fori_loop(0, 8, body, (v, jnp.zeros(())))
        return acc

    float(chain(y, sub))
    t0 = time.perf_counter()
    float(chain(y, sub))
    dt = (time.perf_counter() - t0) / 8 * 1e3
    print(f"d2s8 packed chain x8: {dt:.3f} ms/op", flush=True)


if __name__ == "__main__":
    main()
    probe_d2s8()
