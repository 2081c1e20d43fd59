"""Block-exit -> flat-lane repack shootout.

The sliding path needs the UNet/ViT window output as flat-lane rows
(r0, r1, r2*C) for the blend-scatter kernel; today it goes block
(d,h,w,8C) -> pallas d2s -> 6-D -> XLA reshape 4-D spatial -> XLA
reshape flat, paying two tiled-layout relayouts (1.46 + ~0.9 ms/window
in the 6M trace; 3.25 ms in the ViT fwd). Logically the 6-D form
flattened per (i,a,j,b) row IS the flat row — the only real work is the
minor-dim merge (w, 2C) -> (w*2C). Strategies:

  S0  current chain: d2s kernel -> reshape(2d,2h,2w,C) -> reshape flat
  S1  d2s kernel emitting (d,2,h,2,w*2C) via in-kernel value reshape
  S2  d2s kernel emitting flat rows via 4 one-hot MXU GEMMs
      (strided sublane slice x placement matrix, no reshape primitive)

Each consumed fully (sum) and timed with chained pipeline_time.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.ops.pallas.reshuffle import depth_to_space  # noqa: E402
from anatomix_tpu.utils.benchtools import pipeline_time  # noqa: E402

INTERPRET = "--cpu" in sys.argv
if INTERPRET:
    import os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------- S1
def _d2s_flat_reshape_kernel(y_ref, out_ref, *, C):
    for a in range(2):
        for b in range(2):
            g = (a * 2 + b) * 2 * C
            v = y_ref[..., g: g + 2 * C]          # (td, th, w, 2C)
            out_ref[:, a, :, b] = v.reshape(
                v.shape[0], v.shape[1], v.shape[2] * 2 * C
            )


# ---------------------------------------------------------------- S2
def _d2s_flat_gemm_kernel(y_ref, p_ref, out_ref, *, C, w):
    # p_ref: (4, 2C, 8C) one-hot f32: for sub-k t, place lanes
    # [g:g+2C] of input row 4m+t at output lanes [t*2C:(t+1)*2C] of the
    # packed (w/4, 8C) view; out lane dim = w*2C = (w/4) * 8C.
    td, th = y_ref.shape[0], y_ref.shape[1]
    for a in range(2):
        for b in range(2):
            g = (a * 2 + b) * 2 * C
            acc = jnp.zeros((td, th, w // 4, 8 * C), jnp.float32)
            for t in range(4):
                rows = y_ref[:, :, t::4, g: g + 2 * C]  # (td, th, w/4, 2C)
                acc += jax.lax.dot_general(
                    rows.astype(jnp.bfloat16),
                    p_ref[t].astype(jnp.bfloat16),
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out_ref[:, a, :, b] = acc.reshape(
                td, th, w * 2 * C
            ).astype(out_ref.dtype)


def _placement(C):
    p = np.zeros((4, 2 * C, 8 * C), np.float32)
    for t in range(4):
        for q in range(2 * C):
            p[t, q, t * 2 * C + q] = 1.0
    return p


def _run_flat(y, C, kernel_kind):
    B, d, h, w, c8 = y.shape
    td, th = 8, 8
    while d % td:
        td //= 2
    while h % th:
        th //= 2
    if kernel_kind == "reshape":
        kern = functools.partial(_d2s_flat_reshape_kernel, C=C)
        extra = ()
        in_specs = [
            pl.BlockSpec((td, th, w, c8), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        kern = functools.partial(_d2s_flat_gemm_kernel, C=C, w=w)
        extra = (jnp.asarray(_placement(C)),)
        in_specs = [
            pl.BlockSpec((td, th, w, c8), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2 * C, 8 * C), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    def one(v, *rest):
        out6 = pl.pallas_call(
            kern,
            grid=(d // td, h // th),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (td, 2, th, 2, w * 2 * C),
                lambda i, j: (i, 0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (d, 2, h, 2, w * 2 * C), v.dtype
            ),
            cost_estimate=pl.CostEstimate(
                flops=0, bytes_accessed=2 * v.nbytes, transcendentals=0
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2 ** 20
            ),
            interpret=INTERPRET,
        )(v, *rest)
        return out6.reshape(2 * d, 2 * h, w * 2 * C)

    return jax.vmap(lambda v: one(v, *extra))(y)


def main():
    for (D, C) in [(128, 16), (128, 32)]:
        d = D // 2
        key = jax.random.PRNGKey(0)
        y = jax.jit(lambda k: jax.random.normal(
            k, (1, d, d, d, 8 * C), jnp.bfloat16
        ))(key)

        # numpy ground truth: F[0,2i+a,2j+b,k*2C+q] = y[0,i,j,k,(2a+b)*2C+q]
        ynp = np.asarray(y, np.float32)
        ref = (
            ynp.reshape(1, d, d, d, 2, 2, 2 * C)
            .transpose(0, 1, 4, 2, 5, 3, 6)
            .reshape(1, D, D, d * 2 * C)
        )

        @jax.jit
        def s0(y):
            full = depth_to_space(y)  # (1, D, D, D, C)
            return full.reshape(1, D, D, D * C)

        @jax.jit
        def s1(y):
            return _run_flat(y, C, "reshape")

        @jax.jit
        def s2(y):
            return _run_flat(y, C, "gemm")

        for name, fn in [("S0_chain", s0), ("S1_kreshape", s1),
                         ("S2_gemm", s2)]:
            try:
                out = np.asarray(fn(y), np.float32)
            except Exception as e:  # noqa: BLE001
                print(f"D={D} C={C} {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            ok = bool(np.abs(out - ref).max() < 1e-6)
            if INTERPRET:
                print(f"D={D} C={C} {name}: ok={ok}", flush=True)
            else:
                t = pipeline_time(fn, y, n=8, reps=3)
                print(f"D={D} C={C} {name}: ok={ok} {t * 1e3:.3f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
