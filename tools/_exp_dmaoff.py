"""Mosaic feasibility probes for the in-kernel halo plan:

1. make_async_copy into a VMEM destination sliced at a sublane (w-axis)
   offset of 1 — needed to DMA the interior while leaving halo columns.
2. make_async_copy with a SCALAR-clamped source row index (edge halo).
3. single-sublane-column VMEM write (x_vmem[:, 0] = x_vmem[:, 1]).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def probe1():
    def kernel(x_hbm, out_ref, vmem, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[:, :], vmem.at[pl.ds(1, 8), :], sem
        )
        dma.start()
        dma.wait()
        vmem[0] = vmem[1]
        vmem[9] = vmem[8]
        out_ref[...] = vmem[...]

    x = jnp.arange(8 * 128, dtype=jnp.bfloat16).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((10, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    ref = np.concatenate(
        [np.asarray(x)[:1], np.asarray(x), np.asarray(x)[-1:]], 0
    )
    ok = np.array_equal(np.asarray(out), ref)
    print("probe1 sublane-offset DMA dst:", "OK" if ok else "MISMATCH")


def probe2():
    def kernel(x_hbm, out_ref, vmem, sem):
        i = pl.program_id(0)
        row = jnp.maximum(i * 4 - 1, 0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(row, 1)], vmem.at[pl.ds(0, 1)], sem
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
            (1, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    ref = np.asarray(x)[[0, 3, 7, 11]]
    ok = np.array_equal(np.asarray(out), ref)
    print("probe2 scalar-clamped src row DMA:", "OK" if ok else "MISMATCH")


def probe3():
    # 4-D tile like the conv kernel's x_vmem: (td, th, W, c) with a
    # sublane-offset DMA on the W axis and column edge fills
    def kernel(x_hbm, out_ref, vmem, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[:, :, :, :], vmem.at[:, :, pl.ds(1, 16), :], sem
        )
        dma.start()
        dma.wait()
        vmem[:, :, 0] = vmem[:, :, 1]
        vmem[:, :, 17] = vmem[:, :, 16]
        out_ref[...] = vmem[...]

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
            pltpu.VMEM((2, 3, 18, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    xa = np.asarray(x)
    ref = np.concatenate([xa[:, :, :1], xa, xa[:, :, -1:]], 2)
    ok = np.array_equal(np.asarray(out), ref)
    print("probe3 4-D sublane-offset DMA + column fills:",
          "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    for p in (probe1, probe2, probe3):
        try:
            p()
        except Exception as e:
            print(f"{p.__name__} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
