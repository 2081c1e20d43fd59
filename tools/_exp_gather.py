"""Row-gather strategies for the instance-opt warp sampler.

The registration solver is gather-bound: the packed sampler's one
row-gather per Adam iter runs ~40M rows/s = ~15 GB/s effective on a
~800 GB/s chip (PERF.md). Strategy shootout at the real 192^3/grid_sp=2
scale (table (97^3, 96) rows, 96^3 = 884736 points/iter):

  G0: current — jnp.take rows (N, 96) f32
  G1: lane-pad the table to 128 — jnp.take (N, 128) f32
  G2: bf16 table, 96 lanes (half the bytes; same rows)
  G3: bf16 table, 128 lanes
  G4: Pallas scalar-prefetch gather — per-row HBM->VMEM DMAs, NBUF in
      flight, idx as PrefetchScalarGridSpec scalars (f32, 128 lanes)
  G5: G4 with 8 rows per DMA descriptor (gathers 8 sublane-consecutive
      rows; only valid if we restructure — measured for DMA-rate reference:
      copies CONSECUTIVE rows, upper bound for any grouped scheme)

If G0~G1~G2~G3, the bound is row-rate (per-descriptor), and the Pallas
DMA pipeline is the lever; if bytes matter, bf16+slim rows win first.

PYTHONPATH=/root/repo:/root/.axon_site python tools/_exp_gather.py
"""
import functools
import time as _time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anatomix_tpu.utils.benchtools import dispatch_floor

Hg = Wg = Dg = 96
Tp = Hg + 1  # 97
NROWS = Tp ** 3
NPTS = Hg ** 3  # 884736
CH = 96

print(f"table {NROWS} x {CH} rows, {NPTS} points")

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (NROWS, CH), jnp.float32)
# indices: spatially-coherent-ish (identity + noise), like a smooth warp
base = jnp.arange(NPTS, dtype=jnp.int32)
noise = jax.random.randint(jax.random.PRNGKey(1), (NPTS,), -500, 500)
idx0 = jnp.clip(base + noise, 0, NROWS - 1)


def timeit(fn, *args, n=24, reps=3):
    m = jax.jit(
        lambda i, *a: jax.lax.fori_loop(
            0,
            n,
            lambda k, acc: acc
            + jnp.sum(fn(jnp.clip(i + k, 0, NROWS - 1), *a)),
            jnp.zeros((), jnp.float32),
        )
    )
    float(m(idx0, *args))
    floor = dispatch_floor()
    ts = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        float(m(idx0, *args))
        ts.append(_time.perf_counter() - t0)
    ts.sort()
    per = max(ts[len(ts) // 2] - floor, 1e-9) / n
    return per


def report(name, per, nbytes):
    print(
        f"{name}: {per * 1e3:7.2f} ms/iter  "
        f"{NPTS / per / 1e6:7.1f} M rows/s  "
        f"{nbytes / per / 1e9:6.1f} GB/s"
    )


# ---- G0-G3: XLA take variants
variants = [
    ("G0 f32x96 ", table, CH * 4),
    ("G1 f32x128", jnp.pad(table, ((0, 0), (0, 32))), 128 * 4),
    ("G2 bf16x96", table.astype(jnp.bfloat16), CH * 2),
    (
        "G3 bf16x128",
        jnp.pad(table, ((0, 0), (0, 32))).astype(jnp.bfloat16),
        128 * 2,
    ),
]
for name, tab, rb in variants:
    per = timeit(lambda i, t: jnp.take(t, i, axis=0), tab, n=24)
    report(name, per, NPTS * rb)


# ---- G4: Pallas per-row DMA gather (f32, 128 lanes)
R = 1024  # rows per grid step
NBUF = 16


def _gather_kernel(idx_ref, table_ref, out_ref, sem):
    step = pl.program_id(0)

    def copy(k):
        row = idx_ref[step * R + k]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1), :],
            out_ref.at[pl.ds(k, 1), :],
            sem.at[k % NBUF],
        )

    for k0 in range(NBUF):
        copy(k0).start()

    def body(k, carry):
        copy(k).wait()

        @pl.when(k + NBUF < R)
        def _():
            copy(k + NBUF).start()

        return carry

    jax.lax.fori_loop(0, R, body, 0)


def pallas_gather(idx, tab128):
    grid = (NPTS // R,)
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=pl.BlockSpec(
                (R, 128), lambda i, idx_ref: (i, 0)
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        ),
        out_shape=jax.ShapeDtypeStruct((NPTS, 128), tab128.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(idx, tab128)


tab128 = jnp.pad(table, ((0, 0), (0, 32)))
try:
    out = pallas_gather(idx0, tab128)
    ref = jnp.take(tab128, idx0, axis=0)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"G4 parity: {err:.2e}")
    per = timeit(pallas_gather, tab128, n=24)
    report("G4 pallas/row", per, NPTS * 128 * 4)
except Exception as e:
    print(f"G4 FAILED: {type(e).__name__}: {e}")


# ---- G5: grouped DMA upper bound — 8 consecutive rows per descriptor
def _gather8_kernel(idx_ref, table_ref, out_ref, sem):
    step = pl.program_id(0)
    G = R // 8

    def copy(k):
        row = idx_ref[step * G + k]  # gathers rows [row, row+8)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 8), :],
            out_ref.at[pl.ds(k * 8, 8), :],
            sem.at[k % NBUF],
        )

    for k0 in range(NBUF):
        copy(k0).start()

    def body(k, carry):
        copy(k).wait()

        @pl.when(k + NBUF < R // 8)
        def _():
            copy(k + NBUF).start()

        return carry

    jax.lax.fori_loop(0, R // 8, body, 0)


def pallas_gather8(idx, tab128):
    grid = (NPTS // R,)
    return pl.pallas_call(
        _gather8_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=pl.BlockSpec((R, 128), lambda i, idx_ref: (i, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        ),
        out_shape=jax.ShapeDtypeStruct((NPTS, 128), tab128.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(idx, tab128)


idx8 = jnp.clip(idx0[: NPTS // 8], 0, NROWS - 9)
try:
    per = timeit(
        lambda i, t: pallas_gather8(
            jnp.clip(i[: NPTS // 8], 0, NROWS - 9), t
        ),
        tab128,
        n=24,
    )
    report("G5 pallas/8row", per, NPTS * 128 * 4)
except Exception as e:
    print(f"G5 FAILED: {type(e).__name__}: {e}")
