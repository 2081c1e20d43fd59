"""HW validation of the in-kernel-halo sparse conv kernels: Mosaic
compile, bit-parity vs the HBM-padded path, and chained timing at the 6M
model's L0 shape. Then the full fused 6M forward with/without halo."""

import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.ops.pallas.conv_block import (  # noqa: E402
    conv_block_sparse_halo, conv_block_sparse_valid, conv_block_skip_halo,
    conv_block_skip_valid, prepack_sparse, prepack_sparse_skip,
)
from anatomix_tpu.utils.benchtools import amortized_time  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    # --- parity at the L0 shape (16ch, block 64^3) --------------------
    for ci, co, d in ((16, 16, 32), (32, 32, 16)):
        x = jnp.asarray(
            rng.standard_normal((1, d, d, d, 8 * ci)).astype(np.float32)
        ).astype(jnp.bfloat16)
        wgt = rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.1
        b = rng.standard_normal(co).astype(np.float32)
        packed = prepack_sparse(wgt, b, act="lrelu")
        xp = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (1, 1 + ((-(d + 2)) % 8)), (0, 0)),
            mode="edge",
        )
        y_pad = conv_block_sparse_valid(
            xp, packed["w0"], packed["w1"], packed["w2"], packed["b8"],
            act="lrelu", out_dtype=jnp.bfloat16, out_w=d,
        )
        y_halo = conv_block_sparse_halo(
            x, packed["w0"], packed["w1"], packed["w2"], packed["b8"],
            act="lrelu", out_dtype=jnp.bfloat16,
        )
        err = float(jnp.max(jnp.abs(
            y_halo.astype(jnp.float32) - y_pad.astype(jnp.float32)
        )))
        print(f"halo parity ci={ci} d={d}: max abs err {err}", flush=True)

    # --- skip kernel parity -------------------------------------------
    c1, c2, co, d = 16, 32, 16, 32
    enc = jnp.asarray(
        rng.standard_normal((1, d, d, d, 8 * c1)).astype(np.float32)
    ).astype(jnp.bfloat16)
    small = jnp.asarray(
        rng.standard_normal((1, d, d, d, c2)).astype(np.float32)
    ).astype(jnp.bfloat16)
    packed = prepack_sparse_skip(wgt_skip := (
        rng.standard_normal((3, 3, 3, c1 + c2, co)).astype(np.float32) * 0.1
    ), None, c1=c1, act="lrelu")
    pads = ((0, 0), (1, 1), (1, 1), (1, 1 + ((-(d + 2)) % 8)), (0, 0))
    smp = jnp.pad(
        jnp.pad(small, ((0, 0),) * 4 + ((0, packed["c2_pad"]),)), pads,
        mode="edge",
    )
    encp = jnp.pad(enc, pads, mode="edge")
    y_pad = conv_block_skip_valid(
        encp, smp, packed["w0"], packed["w1"], packed["w2"], packed["b8"],
        act="lrelu", out_dtype=jnp.bfloat16, out_w=d,
    )
    y_halo = conv_block_skip_halo(
        enc, smp, packed["w0"], packed["w1"], packed["w2"], packed["b8"],
        act="lrelu", out_dtype=jnp.bfloat16, out_w=d,
    )
    err = float(jnp.max(jnp.abs(
        y_halo.astype(jnp.float32) - y_pad.astype(jnp.float32)
    )))
    print(f"skip halo parity: max abs err {err}", flush=True)

    # --- chained timing: pad+valid vs halo at L0 (64^3 block, 16ch) ----
    ci = co = 16
    d = 64
    wgt = rng.standard_normal((3, 3, 3, ci, co)).astype(np.float32) * 0.05
    packed = prepack_sparse(wgt, None, act="lrelu")
    x0 = jnp.asarray(
        rng.standard_normal((1, d, d, d, 8 * ci)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def step_pad(x, *a):
        xp = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (1, 1 + ((-(d + 2)) % 8)), (0, 0)),
            mode="edge",
        )
        return conv_block_sparse_valid(
            xp, a[0], a[1], a[2], a[3], act="lrelu",
            out_dtype=jnp.bfloat16, out_w=d,
        )

    def step_halo(x, *a):
        return conv_block_sparse_halo(
            x, a[0], a[1], a[2], a[3], act="lrelu", out_dtype=jnp.bfloat16,
        )

    args = (packed["w0"], packed["w1"], packed["w2"], packed["b8"])
    t_pad = amortized_time(step_pad, x0, n=64, reps=2, args=args)
    t_halo = amortized_time(step_halo, x0, n=64, reps=2, args=args)
    print(f"L0 conv 16ch @64^3 block: pad+valid {t_pad*1e3:.3f} ms, "
          f"halo {t_halo*1e3:.3f} ms", flush=True)

    # --- full fused 6M forward @128^3, halo on vs off ------------------
    from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
    from anatomix_tpu.extract import fold_batchnorm
    from anatomix_tpu.models.unet_fused import (
        prepack_fused, unet_apply_fused,
    )

    plan = build_plan(UnetConfig(dimension=3, input_nc=1, output_nc=16,
                                 num_downs=4, ngf=16))
    params = init_params(plan, jax.random.PRNGKey(0))
    fplan, fparams = fold_batchnorm(plan, params)
    pf = prepack_fused(fplan, fparams, input_spatial=(128, 128, 128),
                       compute_dtype=jnp.bfloat16)
    xin = jax.jit(
        lambda k: jax.random.normal(k, (1, 128, 128, 128, 1), jnp.bfloat16)
    )(jax.random.PRNGKey(1))

    def fwd(v):
        return unet_apply_fused(
            fplan, pf, v, compute_dtype=jnp.bfloat16
        )[..., :1]

    for flag in ("0", "1"):
        os.environ["ANATOMIX_HALO"] = flag
        t = amortized_time(fwd, xin, n=8, reps=2)
        print(f"6M fused fwd @128^3 ANATOMIX_HALO={flag}: {t*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
