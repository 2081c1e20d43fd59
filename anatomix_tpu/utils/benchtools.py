"""Benchmark timing utilities that survive the axon TPU tunnel.

Through the tunnel, `block_until_ready` can return before device work
finishes, scalar fetches cost a ~28 ms round trip, and EVERY dispatched
call pays that fixed latency. So:

* work is chained `n` times inside ONE jit with a scalar output (one
  round trip amortizes over n device-side executions), and
* the tunnel's fixed per-call cost is measured once (`dispatch_floor`)
  and subtracted — without this, a 6-chain measurement of a 2 ms op
  reads ~6.7 ms/op (28/6 ms of pure tunnel latency per unit).

`jax.profiler.trace` DOES work through the tunnel and gives exact
device-side op times; prefer it for per-op attribution (PERF.md).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

_DISPATCH_FLOOR: float | None = None


def dispatch_floor(refresh: bool = False) -> float:
    """Median wall seconds of a trivial jitted scalar fetch — the fixed
    per-call cost of the tunnel (dispatch + scalar readback)."""
    global _DISPATCH_FLOOR
    if _DISPATCH_FLOOR is not None and not refresh:
        return _DISPATCH_FLOOR
    f = jax.jit(lambda v: jnp.sum(v) * 1.0000001)
    x = jnp.ones((8,), jnp.float32)
    float(f(x))  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    _DISPATCH_FLOOR = ts[len(ts) // 2]
    return _DISPATCH_FLOOR


def amortized_time(f, x, *, n: int = 10, reps: int = 3, args=()) -> float:
    """Median per-application seconds of `x -> f(x)` chained n times,
    with the tunnel's fixed dispatch cost subtracted.

    Large model params must go through `args` (passed as `f(acc, *args)`)
    rather than f's closure: closure constants ship inside the tunnel's
    remote-compile payload, which has a hard size limit (HTTP 413 for the
    94M dev model)."""

    def many(v, *a):
        def body(_, acc):
            return f(acc, *a) * 0.999  # perturbation prevents CSE/hoisting
        out = jax.lax.fori_loop(0, n, body, v)
        return jnp.sum(out.astype(jnp.float32))

    floor = dispatch_floor()
    m = jax.jit(many)
    float(m(x, *args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(m(x, *args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return max(times[len(times) // 2] - floor, 1e-9) / n


def movement_time(f, x, *, n: int = 8, reps: int = 3, args=()) -> float:
    """Per-call seconds for a DATA-MOVEMENT op (transpose/reshape/copy).

    `pipeline_time`'s `jnp.sum(f(x))` probe is wrong for these: XLA fuses
    a transpose into the consuming reduction and never materializes it
    (trap #4 — an XLA d2s read 0.09 ms where its true materialized cost is
    ~14 ms). `lax.optimization_barrier` around the output forces
    materialization inside the chained loop."""

    def many(v, *a):
        def body(_, carry):
            v, acc = carry
            out = jax.lax.optimization_barrier(f(v, *a))
            probe = jnp.asarray(out)
            idx = (0,) * probe.ndim
            return (v * 0.9999, acc + probe[idx].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, n, body, (v, jnp.zeros(())))
        return acc

    floor = dispatch_floor()
    m = jax.jit(many)
    float(m(x, *args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(m(x, *args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return max(times[len(times) // 2] - floor, 1e-9) / n


def pipeline_time(f, x, *, n: int = 5, reps: int = 3, args=()) -> float:
    """Per-call seconds for a function whose output shape differs from its
    input (e.g. sliding-window extraction): run it n times on perturbed
    inputs inside one jit. Consumes the FULL output (a [:1] probe lets XLA
    shrink the computation — PERF.md trap #1); subtracts the tunnel floor."""

    def many(v, *a):
        def body(_, carry):
            v, acc = carry
            out = f(v, *a)
            return (v * 0.9999, acc + jnp.sum(out.astype(jnp.float32)))
        _, acc = jax.lax.fori_loop(0, n, body, (v, jnp.zeros(())))
        return acc

    floor = dispatch_floor()
    m = jax.jit(many)
    float(m(x, *args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(m(x, *args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return max(times[len(times) // 2] - floor, 1e-9) / n
