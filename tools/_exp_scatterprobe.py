"""Bisect the blend-scatter kernel's HW crash: which feature kills the
TPU worker — dynamic-shift pltpu.roll, the aliased in-place RMW DMA, or
scalar // and % on prefetch values. Each probe is minimal and printed
before running so the crash point is recorded."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def probe_roll_static():
    def kernel(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 32, axis=1)

    x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )(x)
    ok = np.array_equal(np.asarray(out), np.roll(np.asarray(x), 32, 1))
    print("probe roll static:", "OK" if ok else "MISMATCH", flush=True)


def probe_roll_dynamic():
    def kernel(s_ref, x_ref, o_ref):
        k = s_ref[0]
        o_ref[...] = pltpu.roll(x_ref[...], k * 16, axis=1)

    x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
    s = jnp.asarray([2], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )(s, x)
    ok = np.array_equal(np.asarray(out), np.roll(np.asarray(x), 32, 1))
    print("probe roll dynamic:", "OK" if ok else "MISMATCH", flush=True)


def probe_roll_dynamic_3d():
    def kernel(s_ref, x_ref, o_ref):
        k = s_ref[0]
        o_ref[...] = pltpu.roll(x_ref[...], k * 16, axis=2)

    x = jnp.arange(4 * 8 * 512, dtype=jnp.float32).reshape(4, 8, 512)
    s = jnp.asarray([2], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, 8, 512), jnp.float32),
    )(s, x)
    ok = np.array_equal(np.asarray(out), np.roll(np.asarray(x), 32, 2))
    print("probe roll dynamic 3d:", "OK" if ok else "MISMATCH", flush=True)


def probe_scalar_mod():
    def kernel(s_ref, x_ref, o_ref):
        v = s_ref[0]
        off = v // 8
        k = v % 8
        o_ref[...] = x_ref[...] + (off + k).astype(jnp.float32)

    x = jnp.zeros((8, 128), jnp.float32)
    s = jnp.asarray([21], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(s, x)
    ok = float(np.asarray(out)[0, 0]) == 7.0  # 21//8 + 21%8 = 2 + 5
    print("probe scalar mod:", "OK" if ok else "MISMATCH", flush=True)


def probe_alias_rmw():
    """In-place canvas RMW: read slab from the aliased output via DMA,
    add, write back — dynamic offsets from prefetch scalars."""
    def kernel(s_ref, x_in, prod_ref, out_ref, slab, sems):
        s0 = s_ref[0]
        read = pltpu.make_async_copy(
            out_ref.at[pl.ds(s0, 8), pl.ds(0, 8), :], slab, sems.at[0]
        )
        read.start()
        read.wait()
        slab[...] += prod_ref[...]
        write = pltpu.make_async_copy(
            slab, out_ref.at[pl.ds(s0, 8), pl.ds(0, 8), :], sems.at[1]
        )
        write.start()
        write.wait()

    canvas = jnp.ones((32, 8, 128), jnp.float32)
    prod = jnp.full((8, 8, 128), 2.0, jnp.float32)
    s = jnp.asarray([4], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 8, 128), jnp.float32),
        input_output_aliases={1: 0},
    )(s, canvas, prod)
    o = np.asarray(out)
    ok = (
        np.allclose(o[4:12], 3.0)
        and np.allclose(o[:4], 1.0)
        and np.allclose(o[12:], 1.0)
    )
    print("probe alias rmw:", "OK" if ok else f"MISMATCH {o[:,0,0]}",
          flush=True)




def probe_hbm_sublane_slice():
    """DMA read/write of an HBM canvas sliced at a DYNAMIC, unaligned
    offset on its second-to-last (sublane) dim — the one feature of the
    blend-scatter kernel no probe covered."""
    def kernel(s_ref, x_in, prod_ref, out_ref, slab, sems):
        s0 = s_ref[0]
        off = s_ref[1]
        read = pltpu.make_async_copy(
            out_ref.at[pl.ds(s0, 8), pl.ds(0, 8), pl.ds(off, 5), :],
            slab, sems.at[0],
        )
        read.start()
        read.wait()
        slab[...] += prod_ref[...]
        write = pltpu.make_async_copy(
            slab,
            out_ref.at[pl.ds(s0, 8), pl.ds(0, 8), pl.ds(off, 5), :],
            sems.at[1],
        )
        write.start()
        write.wait()

    canvas = jnp.ones((32, 8, 9, 128), jnp.float32)
    prod = jnp.full((8, 8, 5, 128), 2.0, jnp.float32)
    s = jnp.asarray([4, 3], jnp.int32)  # off=3: unaligned sublane offset
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, 8, 5, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 8, 9, 128), jnp.float32),
        input_output_aliases={1: 0},
    )(s, canvas, prod)
    o = np.asarray(out)
    ok = (
        np.allclose(o[4:12, :, 3:8], 3.0)
        and np.allclose(o[4:12, :, :3], 1.0)
        and np.allclose(o[4:12, :, 8:], 1.0)
        and np.allclose(o[:4], 1.0)
    )
    print("probe hbm sublane slice:", "OK" if ok else "MISMATCH",
          flush=True)


def probe_hbm_sublane_aligned():
    """Like probe_hbm_sublane_slice but with an 8-ALIGNED dynamic sublane
    offset and 8-col slab — the fixed kernel's exact DMA shape on dim 2."""
    def kernel(s_ref, x_in, prod_ref, out_ref, slab, sems):
        s0 = s_ref[0]
        off = s_ref[1]
        read = pltpu.make_async_copy(
            out_ref.at[pl.ds(s0, 8), pl.ds(0, 8), pl.ds(off, 8), :],
            slab, sems.at[0],
        )
        read.start()
        read.wait()
        slab[...] += prod_ref[...]
        write = pltpu.make_async_copy(
            slab,
            out_ref.at[pl.ds(s0, 8), pl.ds(0, 8), pl.ds(off, 8), :],
            sems.at[1],
        )
        write.start()
        write.wait()

    canvas = jnp.ones((32, 8, 24, 128), jnp.float32)
    prod = jnp.full((8, 8, 8, 128), 2.0, jnp.float32)
    s = jnp.asarray([4, 8], jnp.int32)  # off=8: tile-aligned
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, 8, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 8, 24, 128), jnp.float32),
        input_output_aliases={1: 0},
    )(s, canvas, prod)
    o = np.asarray(out)
    ok = (
        np.allclose(o[4:12, :, 8:16], 3.0)
        and np.allclose(o[4:12, :, :8], 1.0)
        and np.allclose(o[4:12, :, 16:], 1.0)
        and np.allclose(o[:4], 1.0)
    )
    print("probe hbm sublane ALIGNED slice:", "OK" if ok else "MISMATCH",
          flush=True)


def probe_hbm_4d_untiled_dyn():
    """4D canvas, dynamic offsets on the two UNTILED dims only (static
    full sublane/lane extent) — the fallback full-w slab design."""
    def kernel(s_ref, x_in, prod_ref, out_ref, slab, sems):
        s0 = s_ref[0]
        s1 = s_ref[1]
        read = pltpu.make_async_copy(
            out_ref.at[pl.ds(s0, 8), pl.ds(s1, 8), :, :],
            slab, sems.at[0],
        )
        read.start()
        read.wait()
        slab[...] += prod_ref[...]
        write = pltpu.make_async_copy(
            slab,
            out_ref.at[pl.ds(s0, 8), pl.ds(s1, 8), :, :],
            sems.at[1],
        )
        write.start()
        write.wait()

    canvas = jnp.ones((32, 16, 24, 128), jnp.float32)
    prod = jnp.full((8, 8, 24, 128), 2.0, jnp.float32)
    s = jnp.asarray([4, 3], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, 8, 24, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 16, 24, 128), jnp.float32),
        input_output_aliases={1: 0},
    )(s, canvas, prod)
    o = np.asarray(out)
    ok = (
        np.allclose(o[4:12, 3:11], 3.0)
        and np.allclose(o[:4], 1.0)
        and np.allclose(o[4:12, :3], 1.0)
        and np.allclose(o[4:12, 11:], 1.0)
        and np.allclose(o[12:], 1.0)
    )
    print("probe hbm 4d untiled dyn:", "OK" if ok else "MISMATCH",
          flush=True)


def probe_hbm_3dyn():
    """One DMA with THREE dynamic offsets (two untiled dims + aligned
    sublane dim) — the blend-scatter kernel's exact slab addressing."""
    def kernel(s_ref, x_in, prod_ref, out_ref, slab, sems):
        s0, s1, off = s_ref[0], s_ref[1], s_ref[2]
        read = pltpu.make_async_copy(
            out_ref.at[pl.ds(s0, 8), pl.ds(s1, 8), pl.ds(off, 8), :],
            slab, sems.at[0],
        )
        read.start()
        read.wait()
        slab[...] += prod_ref[...]
        write = pltpu.make_async_copy(
            slab,
            out_ref.at[pl.ds(s0, 8), pl.ds(s1, 8), pl.ds(off, 8), :],
            sems.at[1],
        )
        write.start()
        write.wait()

    canvas = jnp.ones((32, 16, 24, 128), jnp.float32)
    prod = jnp.full((8, 8, 8, 128), 2.0, jnp.float32)
    s = jnp.asarray([4, 3, 8], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, 8, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 16, 24, 128), jnp.float32),
        input_output_aliases={1: 0},
    )(s, canvas, prod)
    o = np.asarray(out)
    ok = (
        np.allclose(o[4:12, 3:11, 8:16], 3.0)
        and np.allclose(o[4:12, 3:11, :8], 1.0)
        and np.allclose(o[:4], 1.0)
    )
    print("probe hbm 3-dyn-offset DMA:", "OK" if ok else "MISMATCH",
          flush=True)


def probe_alias_grid_overlap():
    """Aliased in-place RMW across MULTIPLE grid steps whose slabs
    overlap — the scan-of-windows structure of the real kernel."""
    def kernel(s_ref, x_in, prod_ref, out_ref, slab, sems):
        b = pl.program_id(0)
        s0 = s_ref[b]
        read = pltpu.make_async_copy(
            out_ref.at[pl.ds(s0, 8), :, :], slab, sems.at[0]
        )
        read.start()
        read.wait()
        slab[...] += prod_ref[0]
        write = pltpu.make_async_copy(
            slab, out_ref.at[pl.ds(s0, 8), :, :], sems.at[1]
        )
        write.start()
        write.wait()

    canvas = jnp.zeros((32, 8, 128), jnp.float32)
    prod = jnp.full((3, 1, 8, 8, 128), 1.0, jnp.float32)
    s = jnp.asarray([0, 4, 8], jnp.int32)  # overlapping slabs
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(3,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1, 8, 8, 128), lambda b, *_: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 8, 128), jnp.float32),
        input_output_aliases={1: 0},
    )(s, canvas, prod)
    o = np.asarray(out)[:, 0, 0]
    ref = np.zeros(32)
    for st in (0, 4, 8):
        ref[st: st + 8] += 1.0
    ok = np.allclose(o, ref)
    print("probe alias grid overlap:", "OK" if ok else f"MISMATCH {o}",
          flush=True)


def probe_roll_plus_dma():
    """Dynamic roll AND aliased RMW DMA in the same kernel body."""
    def kernel(s_ref, x_in, prod_ref, out_ref, slab, sems):
        s0, k = s_ref[0], s_ref[1]
        read = pltpu.make_async_copy(
            out_ref.at[pl.ds(s0, 8), :, :], slab, sems.at[0]
        )
        read.start()
        read.wait()
        rolled = pltpu.roll(prod_ref[...], k * 16, axis=2)
        slab[...] += rolled
        write = pltpu.make_async_copy(
            slab, out_ref.at[pl.ds(s0, 8), :, :], sems.at[1]
        )
        write.start()
        write.wait()

    canvas = jnp.zeros((32, 8, 128), jnp.float32)
    base = np.zeros((8, 8, 128), np.float32)
    base[..., 0] = 7.0
    prod = jnp.asarray(base)
    s = jnp.asarray([4, 2], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((32, 8, 128), jnp.float32),
        input_output_aliases={1: 0},
    )(s, canvas, prod)
    o = np.asarray(out)
    ok = np.allclose(o[4:12, :, 32], 7.0) and np.allclose(o[4:12, :, 0], 0.0)
    print("probe roll+dma:", "OK" if ok else "MISMATCH", flush=True)


def probe_full_kernel_bigroll():
    """Full-scale roll shape (td=4, r1=128, 2048 lanes) inside a kernel."""
    def kernel(s_ref, x_ref, o_ref):
        k = s_ref[0]
        o_ref[...] = pltpu.roll(
            x_ref[...].astype(jnp.float32), k * 16, axis=2
        ).astype(jnp.bfloat16)

    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((4, 128, 2048))
        .astype(np.float32)
    ).astype(jnp.bfloat16)
    s = jnp.asarray([5], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, 128, 2048), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20
        ),
    )(s, x)
    ref = np.roll(np.asarray(x.astype(jnp.float32)), 80, 2)
    got = np.asarray(out.astype(jnp.float32))
    ok = np.allclose(got, ref, atol=1e-2)
    print("probe full-scale dynamic roll:", "OK" if ok else "MISMATCH",
          flush=True)


if __name__ == "__main__":
    import sys

    probes = (probe_roll_static, probe_roll_dynamic, probe_roll_dynamic_3d,
              probe_scalar_mod, probe_alias_rmw, probe_hbm_sublane_slice,
              probe_hbm_sublane_aligned, probe_hbm_4d_untiled_dyn,
              probe_hbm_3dyn, probe_alias_grid_overlap,
              probe_roll_plus_dma,
              probe_full_kernel_bigroll)
    if len(sys.argv) > 1:
        probes = tuple(q for q in probes if sys.argv[1] in q.__name__)
    for q in probes:
        print("running", q.__name__, flush=True)
        try:
            q()
        except Exception as e:
            print(f"{q.__name__} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
