"""HW validation + timing of the Pallas blend-scatter kernel: parity vs
the XLA lane-folded path on a small sliding case, then ms/window on the
isolated 343-window-class RMW, then the 6M 256^3 sliding bench."""

import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.ops.sliding_window import (  # noqa: E402
    sliding_window_inference,
)
from anatomix_tpu.utils.benchtools import pipeline_time  # noqa: E402


def main():
    rng = np.random.default_rng(0)

    # --- parity on HW: kernel vs XLA scatter, gaussian + masked windows
    vol = jnp.asarray(
        rng.standard_normal((1, 64, 64, 64, 16)).astype(np.float32)
    )

    def apply_fn(w):
        return w * 2.0 + 1.0

    kw = dict(out_channels=16, roi_size=(32, 32, 32), sw_batch_size=4,
              overlap=0.5, mode="gaussian")
    os.environ["ANATOMIX_SCATTER_KERNEL"] = "0"
    ref = np.asarray(sliding_window_inference(vol, apply_fn, **kw))
    os.environ["ANATOMIX_SCATTER_KERNEL"] = "1"
    got = np.asarray(sliding_window_inference(vol, apply_fn, **kw))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
    print(f"scatter kernel parity (HW): max rel {rel:.2e}", flush=True)

    # --- isolated RMW timing at the 128-window scale ------------------
    from anatomix_tpu.ops.pallas.scatter import (
        blend_scatter_fold, lane_tables,
    )
    from anatomix_tpu.ops.sliding_window import gaussian_importance_axes
    from anatomix_tpu.utils.benchtools import dispatch_floor
    import time

    C, R = 16, 128
    axes, minv = gaussian_importance_axes((R, R, R))
    gdh_np, gw_np = lane_tables(axes, C)
    gdh = jnp.asarray(gdh_np)
    Mr = R * C // 128
    gw = jnp.asarray(gw_np).reshape(Mr, 128)
    NW = 32
    D = 256
    M = D * C // 128
    starts = jnp.asarray(
        np.stack([rng.integers(0, D - R, NW) for _ in range(3)], 1)
        .astype(np.int32)
    )
    prod = jnp.asarray(
        rng.standard_normal((NW, R, R, Mr, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    mask = jnp.ones((NW,), jnp.int32)

    @jax.jit
    def run(canvas, prod, starts, mask):
        def body(acc, xs):
            s, o, m = xs
            return blend_scatter_fold(
                acc, o[None], s[None], m[None], gdh, gw,
                C=C, minv=float(minv),
            ), None
        acc, _ = jax.lax.scan(body, canvas, (starts, prod, mask))
        return acc

    canvas = jnp.zeros((D, D, M, 128), jnp.float32)
    r = run(canvas, prod, starts, mask)
    _ = float(jnp.sum(r[:1, :1]))
    floor = dispatch_floor()
    ts = []
    for _rep in range(3):
        canvas = jnp.zeros((D, D, M, 128), jnp.float32)
        t0 = time.perf_counter()
        r = run(canvas, prod, starts, mask)
        _ = float(jnp.sum(r[:1, :1]))
        ts.append(time.perf_counter() - t0)
    print(f"kernel RMW: {(min(ts) - floor) / NW * 1e3:.3f} ms/window",
          flush=True)

    # --- 6M sliding 256^3 ----------------------------------------------
    from anatomix_tpu.extract import make_feature_extractor
    from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params

    volb = jax.jit(
        lambda k: jax.random.normal(k, (1, 256, 256, 256, 1), jnp.float32)
    )(jax.random.PRNGKey(1))
    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4,
                   ngf=16)
    )
    params = init_params(plan, jax.random.PRNGKey(0))
    ext = make_feature_extractor(
        plan, params, strategy="sliding", roi_size=(128, 128, 128),
        sw_batch_size=4, overlap=0.8, compute_dtype=jnp.bfloat16,
    )
    t = pipeline_time(ext.impl, volb, n=1, reps=2, args=(ext.arrays,))
    print(f"6M sliding 256^3 (scatter kernel): {t:.3f} s", flush=True)


if __name__ == "__main__":
    main()
