"""Winograd F(2, 3^3) spike (VERDICT r4 #4): can a transform-domain conv
beat the sparse block GEMM's 64/27 = 2.37x FLOP inflation on the dev
model's wide encoder levels?

XLA composition prototype: input transform (3 axis contractions with
B^T), 64 pointwise GEMMs (batched einsum), inverse transform (A^T).
Arithmetic: 8/27 = 0.296x the direct MACs — but the transformed tensor
is 64/8 = 8x the input bytes, so the XLA form is bandwidth-bound; the
honest in-kernel projection divides the HBM cost by keeping tiles in
VMEM. Zeros padding (prototype; reflect needs a halo'd gather).

Run CPU (correctness): ANATOMIX_WG_SMOKE=1 python tools/_exp_winograd.py
Run HW  (timing):      python tools/_exp_winograd.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SMOKE = os.environ.get("ANATOMIX_WG_SMOKE", "0") == "1"

BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]],
    np.float32,
)
G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def wg_weights_np(w):
    w = np.asarray(w, np.float32)
    u = np.einsum("pa,abcxo->pbcxo", G, w)
    u = np.einsum("qb,pbcxo->pqcxo", G, u)
    u = np.einsum("rc,pqcxo->pqrxo", G, u)
    return u  # (4, 4, 4, Ci, Co)


def wg_conv(x, u, dtype):
    """x (B, D, H, W, Ci) spatial; u (4,4,4,Ci,Co) transformed weights.
    'SAME' 3^3 conv with zeros padding via F(2,3^3)."""
    B, D, H, W, Ci = x.shape
    Co = u.shape[-1]
    d = D // 2
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (1, 2), (0, 0)))

    # 4^3 overlapping tiles, stride 2: r-shifted stride-2 slices per axis
    def tiles(ax_len, r):
        return slice(r, r + 2 * ax_len - 1, 2)

    # gather (B, d, h, w, 4, 4, 4, Ci) as 64 strided views
    vs = []
    for rd in range(4):
        for rh in range(4):
            for rw in range(4):
                vs.append(
                    jax.lax.slice(
                        xp,
                        (0, rd, rh, rw, 0),
                        (B, rd + 2 * d - 1, rh + 2 * d - 1,
                         rw + 2 * d - 1, Ci),
                        (1, 2, 2, 2, 1),
                    )
                )
    v = jnp.stack(vs, axis=-2)  # (B, d, h, w, 64, Ci)
    tdt = jnp.float32 if x.dtype == jnp.float32 else dtype
    v = v.reshape(B, d, d, d, 4, 4, 4, Ci).astype(tdt)

    # input transform per axis
    bt = jnp.asarray(BT, tdt)
    v = jnp.einsum("ia,nxyzajkc->nxyzijkc", bt, v)
    v = jnp.einsum("jb,nxyzibkc->nxyzijkc", bt, v)
    v = jnp.einsum("kd,nxyzijdc->nxyzijkc", bt, v).astype(dtype)

    # 64 pointwise GEMMs
    up = u.reshape(64, Ci, Co).astype(dtype)
    vp = v.reshape(B, d * d * d, 64, Ci)
    m = jnp.einsum(
        "nmpc,pco->nmpo", vp, up, preferred_element_type=jnp.float32
    )
    m = m.reshape(B, d, d, d, 4, 4, 4, Co)

    # inverse transform
    at = jnp.asarray(AT)
    m = jnp.einsum("ia,nxyzajko->nxyzijko", at, m)
    m = jnp.einsum("jb,nxyzibko->nxyzijko", at, m)
    m = jnp.einsum("kd,nxyzijdo->nxyzijko", at, m)
    # (B, d, d, d, 2, 2, 2, Co) -> spatial interleave
    m = m.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return m.reshape(B, D, H, W, Co).astype(dtype)


def main():
    from anatomix_tpu.ops.conv import conv3d
    from anatomix_tpu.utils.benchtools import amortized_time

    rng = np.random.default_rng(0)
    if SMOKE:
        shapes = [(16, 8, 8)]
        dtype = jnp.float32
    else:
        # dev encoder levels 1/2 shapes at QUARTER volume (the XLA
        # prototype materializes the 8x transform tensor; 128-cube blew
        # HBM in wave 38) — per-GF rates scale to the full level
        shapes = [(64, 32, 32), (32, 64, 64)]
        dtype = jnp.bfloat16

    for S, Ci, Co in shapes:
        x = jnp.asarray(
            rng.standard_normal((1, S, S, S, Ci)).astype(np.float32)
        ).astype(dtype)
        w = (rng.standard_normal((3, 3, 3, Ci, Co)) * 0.05).astype(
            np.float32
        )
        u = jnp.asarray(wg_weights_np(w))

        ref = conv3d(
            x.astype(jnp.float32), jnp.asarray(w), None, padding="SAME",
            pad_type="zeros", compute_dtype=jnp.float32,
        )
        got = wg_conv(x.astype(jnp.float32), u, jnp.float32)
        err = float(
            jnp.max(jnp.abs(got - ref)) / (jnp.std(ref) + 1e-8)
        )
        print(f"[wg {Ci}->{Co} @{S}] rel_err={err:.2e}", flush=True)

        if SMOKE:
            continue

        v0 = jnp.zeros((1,), jnp.float32)

        def t_wg(v, xx):
            out = wg_conv(
                xx + (v[0] * 1e-6).astype(xx.dtype), u, dtype
            )
            return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

        def t_xla(v, xx):
            out = conv3d(
                xx + (v[0] * 1e-6).astype(xx.dtype), jnp.asarray(w),
                None, padding="SAME", pad_type="zeros",
                compute_dtype=dtype,
            )
            return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

        n = 16
        t1 = amortized_time(t_wg, v0, n=n, args=(x,))
        t2 = amortized_time(t_xla, v0, n=n, args=(x,))

        # sparse block kernel at the same conv (block layout input)
        from anatomix_tpu.ops.pallas.conv_block import (
            conv_block_sparse_halo,
            prepack_sparse,
        )
        from anatomix_tpu.ops.pallas.conv3x3 import _space_to_depth

        xb = _space_to_depth(x)
        p = prepack_sparse(w, None, act="none")

        def t_sparse(v, bb):
            out = conv_block_sparse_halo(
                bb + (v[0] * 1e-6).astype(bb.dtype), p["w0"], p["w1"],
                p["w2"], p["b8"], act="none",
            )
            return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

        t3 = amortized_time(t_sparse, v0, n=n, args=(xb,))
        gf = 2 * S ** 3 * 27 * Ci * Co / 1e9
        print(
            f"  winograd-XLA {t1 * 1e3:.2f} ms | XLA direct "
            f"{t2 * 1e3:.2f} ms | sparse kernel {t3 * 1e3:.2f} ms "
            f"(true {gf:.1f} GF)",
            flush=True,
        )


if __name__ == "__main__":
    main()
