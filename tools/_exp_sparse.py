"""Experiments on the sparse block-space conv kernel's view assembly.

The kernel is assembly-bound (PERF.md: contiguous-LHS GEMM ~106 TF/s vs
~55 TF/s with sliced assembly). Variants probe where the assembly cost
sits and whether Mosaic can overlap VPU assembly with MXU GEMMs:

  v0: current kernel (vd-chunked lazy concats)
  v1: materialize ALL chunks first, then GEMM loop (scheduling freedom)
  v2: one concat per w-group (3 GEMMs, K = 16/32/16 * ci)
  v4: interior 8 views GEMM'd in place from the raw tile (no copy),
      remaining 56 views assembled as in v0

Run on TPU: PYTHONPATH=/root/repo python tools/_exp_sparse.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anatomix_tpu.ops.pallas.conv_block import (
    _OFF, _PAR, _apply_act, _pick_tile, _VMEM_LIMIT,
    conv_block_sparse, prepack_sparse, pack_sparse_block_weights,
)
from anatomix_tpu.utils.benchtools import dispatch_floor
import time as _time


def chained_time(f, xp, n=64, reps=3):
    """True-dependency chain: f's output is padded back to input shape
    and fed to the next call (unchained probes under-read through the
    tunnel; see PERF.md timing traps)."""
    def many(v):
        def body(_, acc):
            out = f(acc)
            return jnp.pad(out, ((0, 0), (1, 1), (1, 1), (1, 7), (0, 0)),
                           mode="edge")
        out = jax.lax.fori_loop(0, n, body, v)
        return jnp.sum(out.astype(jnp.float32))

    floor = dispatch_floor()
    m = jax.jit(many)
    float(m(xp))
    times = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        float(m(xp))
        times.append(_time.perf_counter() - t0)
    times.sort()
    return max(times[len(times) // 2] - floor, 1e-9) / n


def _kernel_var(x_hbm, w0_ref, w1_ref, w2_ref, b_ref, wi_ref, out_ref,
                x_vmem, sem, *, td, th, W, ci, act, variant):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * td, td + 2), pl.ds(j * th, th + 2)],
        x_vmem, sem,
    )
    dma.start()
    dma.wait()

    def chunk(vd, vhs, vws):
        views = []
        for vh in vhs:
            for vw in vws:
                g = ((_PAR[vd] * 2 + _PAR[vh]) * 2 + _PAR[vw]) * ci
                views.append(
                    x_vmem[_OFF[vd]: _OFF[vd] + td,
                           _OFF[vh]: _OFF[vh] + th,
                           _OFF[vw]: _OFF[vw] + W,
                           g: g + ci]
                )
        return jnp.concatenate(views, axis=-1)

    ALL = (-1, 0, 1, 2)
    dn = (((3,), (0,)), ((), ()))
    acc = None

    def add(a, z):
        return z if a is None else a + z

    if variant == "v1":
        gemms = []
        for w_ref, vws in ((w1_ref, (0, 1)), (w0_ref, (-1,)),
                           (w2_ref, (2,))):
            rows = 4 * len(vws) * ci
            for n, vd in enumerate(ALL):
                gemms.append(
                    (chunk(vd, ALL, vws), w_ref[n * rows: (n + 1) * rows])
                )
        for lhs, rhs in gemms:
            acc = add(acc, jax.lax.dot_general(
                lhs, rhs, dn, preferred_element_type=jnp.float32))
    elif variant == "v2":
        for w_ref, vws in ((w1_ref, (0, 1)), (w0_ref, (-1,)),
                           (w2_ref, (2,))):
            lhs = jnp.concatenate(
                [chunk(vd, ALL, vws) for vd in ALL], axis=-1
            )
            acc = add(acc, jax.lax.dot_general(
                lhs, w_ref[...], dn, preferred_element_type=jnp.float32))
    elif variant == "v4":
        acc = jax.lax.dot_general(
            x_vmem[1: 1 + td, 1: 1 + th, 1: 1 + W, :], wi_ref[...], dn,
            preferred_element_type=jnp.float32,
        )
        for w_ref, vws in ((w0_ref, (-1,)), (w2_ref, (2,))):
            rows = 4 * ci
            for n, vd in enumerate(ALL):
                acc = acc + jax.lax.dot_general(
                    chunk(vd, ALL, vws), w_ref[n * rows: (n + 1) * rows],
                    dn, preferred_element_type=jnp.float32)
        # w1 group minus the interior views: edge-vd chunks keep all vh,
        # interior-vd chunks keep only edge vh
        off = 0
        for vd in ALL:
            vhs = ALL if vd in (-1, 2) else (-1, 2)
            rows = 2 * len(vhs) * ci
            acc = acc + jax.lax.dot_general(
                chunk(vd, vhs, (0, 1)), w1_ref[off: off + rows], dn,
                preferred_element_type=jnp.float32)
            off += rows
    else:  # v0
        for w_ref, vws in ((w1_ref, (0, 1)), (w0_ref, (-1,)),
                           (w2_ref, (2,))):
            rows = 4 * len(vws) * ci
            for n, vd in enumerate(ALL):
                acc = add(acc, jax.lax.dot_general(
                    chunk(vd, ALL, vws), w_ref[n * rows: (n + 1) * rows],
                    dn, preferred_element_type=jnp.float32))
    acc = acc + b_ref[0].astype(jnp.float32)
    acc = _apply_act(acc, act)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "variant", "out_w"))
def conv_sparse_var(xp, w0, w1, w2, bias8, wi, *, act="relu",
                    variant="v0", out_w=64):
    B, dp, hp, wp0, c8 = xp.shape
    ci = c8 // 8
    co8 = bias8.shape[-1]
    d, h = dp - 2, hp - 2
    w = out_w
    if wp0 % 8:
        xp = jnp.pad(xp, ((0, 0),) * 3 + ((0, (-wp0) % 8), (0, 0)))
    Wp = xp.shape[3]
    td, th = _pick_tile(d, h, Wp, ci, co8 // 8, itemsize=xp.dtype.itemsize)
    kernel = functools.partial(_kernel_var, td=td, th=th, W=w, ci=ci,
                               act=act, variant=variant)
    return pl.pallas_call(
        kernel,
        grid=(B, d // td, h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(
            (1, td, th, w, co8), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, d, h, w, co8), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((td + 2, th + 2, Wp, c8), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d * h * w * 64 * ci * co8,
            bytes_accessed=xp.nbytes, transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, w0, w1, w2, bias8, wi)


def main():
    rng = np.random.default_rng(0)
    ci = co = 16
    w = rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.1
    bias = rng.standard_normal((co,)).astype(np.float32) * 0.1
    packed = prepack_sparse(w, bias, act="relu")

    x = jax.jit(
        lambda k: jax.random.normal(k, (1, 64, 64, 64, 8 * ci),
                                    jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 7), (0, 0)), mode="edge")

    w0n, w1n, w2n = pack_sparse_block_weights(w)

    # v4 weights: interior views in raw-tile lane order; w1 remainder in
    # the kernel's v4 assembly order
    def w1_row(vd, vh, vw):
        return (((vd + 1) * 4) + (vh + 1)) * 2 * ci + vw * ci

    wi = np.zeros((8 * ci, 8 * co), np.float32)
    for pd in range(2):
        for ph in range(2):
            for pw in range(2):
                lane = ((pd * 2 + ph) * 2 + pw) * ci
                r = w1_row(pd, ph, pw)
                wi[lane: lane + ci] = w1n[r: r + ci]
    w1e_rows = []
    for vd in (-1, 0, 1, 2):
        vhs = (-1, 0, 1, 2) if vd in (-1, 2) else (-1, 2)
        for vh in vhs:
            for vw in (0, 1):
                r = w1_row(vd, vh, vw)
                w1e_rows.append(w1n[r: r + ci])
    w1e = np.concatenate(w1e_rows, axis=0)

    to_dev = lambda a: jnp.asarray(np.asarray(a)).astype(jnp.bfloat16)
    ref = conv_block_sparse(x, packed, pad_type="reflect")

    # pad-only chain baseline (the chain bridge adds one pad per iter)
    t_pad = chained_time(lambda v: v[:, 1:-1, 1:-1, 1:65, :], xp, n=64,
                         reps=3)
    print(f"pad-only chain: {t_pad*1e3:.3f} ms/iter", flush=True)

    flops = 2 * 64 ** 3 * 64 * ci * 8 * co
    for variant in ("v0", "v1", "v2", "v4"):
        w1_use = to_dev(w1e if variant == "v4" else w1n)
        f = functools.partial(
            conv_sparse_var, w0=to_dev(w0n), w1=w1_use, w2=to_dev(w2n),
            bias8=packed["b8"], wi=to_dev(wi), act="relu", variant=variant,
        )
        g = lambda v, ff=f: ff(v)
        y = g(xp)
        err = float(jnp.max(jnp.abs(
            y.astype(jnp.float32) - ref.astype(jnp.float32)
        )))
        t = chained_time(g, xp, n=64, reps=3)
        tc = max(t - t_pad, 1e-9)
        print(f"{variant}: {tc*1e3:.3f} ms  {flops/tc/1e12:5.1f} TF/s nom  "
              f"maxerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
