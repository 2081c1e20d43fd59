"""Cheap HW compile+numerics probe for the d2s fold-exit kernels.

Runs depth_to_space_fold (plain + fused-sub) at the real exit shapes —
6M UNet (C=16, g=4) and ViT decoder (C=32, g=2) — and checks them
against a host-side repack oracle. Small d/h so the probe compiles in
seconds; the point is Mosaic acceptance of the scratch-bounced strided
loads (wave-20 rejected non-zero last-dim offsets), not throughput.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/_probe_fold.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if "--cpu" in sys.argv:
    import os

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    jax.config.update("jax_platforms", "cpu")

from anatomix_tpu.ops.pallas.reshuffle import (  # noqa: E402
    depth_to_space_fold,
)

INTERPRET = "--cpu" in sys.argv
rng = np.random.default_rng(0)


def oracle(blk, sub_np, C, g):
    """Numpy replica of the fold kernels' output layout."""
    B, d, h, w, _ = blk.shape
    out = np.empty((B, 2 * d, 2 * h, w // g, 128), np.float32)
    for a in range(2):
        for b in range(2):
            s = (a * 2 + b) * 2 * C
            plane = blk[0, :, :, :, s: s + 2 * C] - sub_np[s: s + 2 * C]
            packed = np.concatenate(
                [plane[:, :, t::g, :] for t in range(g)], axis=-1
            )  # (d, h, w/g, 128)
            out[0, a::2][:, b::2] = packed
    return out


def check(C, w, in_dtype, out_dtype, with_sub):
    d = h = 16
    g = 128 // (2 * C)
    y = jnp.asarray(
        rng.standard_normal((1, d, h, w, 8 * C)).astype(np.float32)
    ).astype(in_dtype)
    sub = (
        jnp.asarray(rng.standard_normal((1, 8 * C)).astype(np.float32))
        if with_sub
        else None
    )
    got = np.asarray(
        depth_to_space_fold(
            y, sub=sub, out_dtype=out_dtype, interpret=INTERPRET
        )
    ).astype(np.float32)
    sub_np = np.asarray(sub)[0] if with_sub else np.zeros(
        8 * C, np.float32
    )
    ref = oracle(np.asarray(y.astype(jnp.float32)), sub_np, C, g)
    if (out_dtype or in_dtype) == jnp.bfloat16:
        ref = np.asarray(jnp.asarray(ref).astype(jnp.bfloat16)).astype(
            np.float32
        )
        tol = 1e-1
    else:
        tol = 1e-5 if in_dtype == jnp.float32 else 1e-2
    err = np.abs(got - ref).max()
    status = "OK" if err <= tol else "FAIL"
    print(
        f"fold C={C} w={w} in={jnp.dtype(in_dtype).name} "
        f"out={jnp.dtype(out_dtype).name if out_dtype else 'same'} "
        f"sub={with_sub}: max err {err:.2e} {status}",
        flush=True,
    )
    return err <= tol


ok = True
for C, w in ((16, 64), (32, 64)):
    ok &= check(C, w, jnp.float32, None, False)
    ok &= check(C, w, jnp.bfloat16, jnp.float32, False)
    ok &= check(C, w, jnp.float32, jnp.float32, True)
print("probe_fold:", "ALL OK" if ok else "FAILURES", flush=True)
sys.exit(0 if ok else 1)
