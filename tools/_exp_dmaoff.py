"""Mosaic feasibility probes for the in-kernel halo plan, round 2.

Round-1 result: DMA into a VMEM destination at an UNALIGNED sublane offset
(1) crashes the Mosaic compiler (INTERNAL). Retry with TILE-ALIGNED
sublane offsets (8) — the halo design then places the interior at column 8
and fills columns 7 / 8+w as edge copies.

1. 2-D: DMA into dst rows [8, 16) of a (24, 128) VMEM; fill rows 7, 16.
2. scalar-clamped source row index (edge halo row selection).
3. 4-D conv-tile shape: DMA into w-columns [8, 8+16) and fill 7 / 24.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def probe1():
    def kernel(x_hbm, out_ref, vmem, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[:, :], vmem.at[pl.ds(8, 8), :], sem
        )
        dma.start()
        dma.wait()
        vmem[7] = vmem[8]
        vmem[16] = vmem[15]
        out_ref[...] = vmem[pl.ds(7, 10)]

    x = jnp.arange(8 * 128, dtype=jnp.bfloat16).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((24, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    ref = np.concatenate(
        [np.asarray(x)[:1], np.asarray(x), np.asarray(x)[-1:]], 0
    )
    ok = np.array_equal(np.asarray(out), ref)
    print("probe1 tile-aligned sublane-offset DMA dst:",
          "OK" if ok else "MISMATCH")


def probe2():
    # scalar-clamped src row per grid step; output block (8, 128)
    def kernel(x_hbm, out_ref, vmem, sem):
        i = pl.program_id(0)
        row = jnp.maximum(i * 4 - 1, 0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(row, 8)], vmem.at[:], sem
        )
        dma.start()
        dma.wait()
        out_ref[...] = vmem[...]

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    xa = np.asarray(x)
    ref = np.concatenate([xa[0:8], xa[3:11], xa[7:15], xa[8:16]], 0)
    ok = np.array_equal(np.asarray(out), ref)
    print("probe2 scalar-clamped src row DMA:", "OK" if ok else "MISMATCH")


def probe3():
    def kernel(x_hbm, out_ref, vmem, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[:, :, :, :], vmem.at[:, :, pl.ds(8, 16), :], sem
        )
        dma.start()
        dma.wait()
        vmem[:, :, 7] = vmem[:, :, 8]
        vmem[:, :, 24] = vmem[:, :, 23]
        out_ref[...] = vmem[:, :, pl.ds(7, 18)]

    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((2, 3, 16, 128))
        .astype(np.float32)
    ).astype(jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 3, 18, 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, 3, 32, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    xa = np.asarray(x)
    ref = np.concatenate([xa[:, :, :1], xa, xa[:, :, -1:]], 2)
    ok = np.array_equal(np.asarray(out), ref)
    print("probe3 4-D tile-aligned w-offset DMA + column fills:",
          "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    for p in (probe1, probe2, probe3):
        try:
            p()
        except Exception as e:
            print(f"{p.__name__} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
