"""Probe: in-kernel sublane->lane pack (w, 2C) -> (w/g, 128), g = 64/C.

The exit-repack shootout (tools/_exp_repack.py) showed Mosaic rejects
both in-kernel minor-merge value reshapes and 4-D dot_generals. This
probes the remaining candidate: strided sublane slices + lane
concatenate — if it compiles and runs near bandwidth, the d2s kernel
can emit the folded (…, Mr, 128) form the v4 scatter kernel consumes,
killing the XLA relayout between model exit and stitching.

  P1  strided value slice v[:, t::g, :] alone
  P2  pack = jnp.concatenate([v[:, t::g, g0:g0+2C] for t], axis=-1)
  P3  full d2s_fold kernel: block (B,d,h,w,8C) -> (B,2d,2h,w*2C/128*? )
      with per-(a,b) pack, vs the XLA chain (S0)

Run CPU sanity: PYTHONPATH=/root/repo python tools/_exp_pack2.py --cpu
"""

import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

INTERPRET = "--cpu" in sys.argv
if INTERPRET:
    import os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    jax.config.update("jax_platforms", "cpu")

from anatomix_tpu.utils.benchtools import pipeline_time  # noqa: E402


def _report(name, fn):
    try:
        return fn()
    except Exception as e:  # noqa: BLE001
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:1500]}",
              flush=True)
        traceback.print_exc(limit=2)
        return None


# ------------------------------------------------------------------ P1
def probe_strided_slice():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[:, 1::4, :]

    x = jnp.arange(8 * 32 * 128, dtype=jnp.float32).reshape(8, 32, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.float32),
        interpret=INTERPRET,
    )(x)
    ref = np.asarray(x)[:, 1::4, :]
    print("P1 strided slice:", "OK" if np.array_equal(out, ref)
          else "WRONG", flush=True)


# ------------------------------------------------------------------ P2
def probe_pack(C=16):
    g = 128 // (2 * C)

    def kernel(x_ref, o_ref):
        # (th, w, 2C) -> (th, w/g, 128) — REF-level strided loads
        # (value-level strided slices lower to unsupported >2D gathers)
        o_ref[...] = jnp.concatenate(
            [x_ref[:, t::g, :] for t in range(g)], axis=-1
        )

    th, w = 8, 64
    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((th, w, 2 * C))
        .astype(np.float32)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((th, w // g, 128), jnp.float32),
        interpret=INTERPRET,
    )(x)
    ref = np.asarray(x).reshape(th, w // g, 128)
    ok = np.allclose(np.asarray(out), ref)
    print(f"P2 pack C={C}:", "OK" if ok else "WRONG", flush=True)


# ------------------------------------------------------------------ P3
def probe_d2s_fold(D=128, C=16):
    from anatomix_tpu.ops.pallas.reshuffle import depth_to_space_fold

    d = D // 2
    y = jax.jit(lambda k: jax.random.normal(
        k, (1, d, d, d, 8 * C), jnp.bfloat16
    ))(jax.random.PRNGKey(0))

    f = jax.jit(functools.partial(
        depth_to_space_fold, interpret=INTERPRET
    ))
    out = np.asarray(f(y), np.float32)
    ynp = np.asarray(y, np.float32)
    ref = (
        ynp.reshape(1, d, d, d, 2, 2, 2 * C)
        .transpose(0, 1, 4, 2, 5, 3, 6)
        .reshape(1, D, D, D * C // 128, 128)
    )
    ok = bool(np.abs(out - ref).max() < 1e-6)
    if INTERPRET:
        print(f"P3 d2s_fold D={D} C={C}: ok={ok}", flush=True)
    else:
        t = pipeline_time(f, y, n=8, reps=3)
        print(f"P3 d2s_fold D={D} C={C}: ok={ok} {t * 1e3:.3f} ms",
              flush=True)


def main():
    _report("P1", probe_strided_slice)
    _report("P2_C16", lambda: probe_pack(16))
    _report("P2_C32", lambda: probe_pack(32))
    _report("P3_C16", lambda: probe_d2s_fold(128, 16))
    _report("P3_C32", lambda: probe_d2s_fold(128, 32))


if __name__ == "__main__":
    main()
