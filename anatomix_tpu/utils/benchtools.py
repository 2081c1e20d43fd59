"""Benchmark timing utilities that survive the axon TPU tunnel.

Through the tunnel, `block_until_ready` can return before device work
finishes and scalar fetches cost a ~28 ms round trip, so single-dispatch
timing is useless. `amortized_time` chains `n` applications of the function
inside one jit with a scalar output, so one round trip amortizes over n
device-side executions.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def amortized_time(f, x, *, n: int = 10, reps: int = 3) -> float:
    """Median per-application seconds of `x -> f(x)` chained n times."""

    def many(v):
        def body(_, acc):
            return f(acc) * 0.999  # tiny perturbation prevents CSE/hoisting
        out = jax.lax.fori_loop(0, n, body, v)
        return jnp.sum(out.astype(jnp.float32).ravel()[:1])

    m = jax.jit(many)
    float(m(x))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(m(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / n


def pipeline_time(f, x, *, n: int = 5, reps: int = 3) -> float:
    """Per-call seconds for a function whose output shape differs from its
    input (e.g. sliding-window extraction): run it n times on perturbed
    inputs inside one jit."""

    def many(v):
        def body(_, carry):
            v, acc = carry
            out = f(v)
            return (v * 0.9999, acc + jnp.sum(out.astype(jnp.float32).ravel()[:1]))
        _, acc = jax.lax.fori_loop(0, n, body, (v, jnp.zeros(())))
        return acc

    m = jax.jit(many)
    float(m(x))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(m(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / n
