"""Flash-attention block-size sweep at the ViT shape (B=1, H=6, N=4104,
hd=66->128) — VERDICT r2 weak #7 wants a recorded decision, not a
constant. The stock kernel requires kv blocks to be multiples of 128
(first sweep attempt with 456/1368 failed on that), so candidates are
%128 sizes. Wave-25 sweep: 384=0.426, 128=1.354, 256=0.466,
512=0.232, 1408=0.170 ms/attn — bigger is better at this tiny N; this
follow-up confirms 1408 and adds 2176 (Np=4352) and 4224 (single block,
Np=4224 — the wave-25 attempt died on an overtight env validation).

PYTHONPATH=/root/repo:/root/.axon_site python tools/_exp_flashblk.py
"""
import os
import traceback

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.models.vit3d import primus  # noqa: E402
from anatomix_tpu.utils.benchtools import pipeline_time  # noqa: E402

rng = np.random.default_rng(0)
B, H, N, hd = 1, 6, 4104, 66
q, k, v = (
    jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    .astype(jnp.bfloat16)
    for _ in range(3)
)
scale = 1.0 / np.sqrt(hd)

ref = None
for blk in ("1408", "4224,128", "4224,256", "4224,512",
            "4224,1408", "1408,512", "1408,4224", "512,4224"):
    os.environ["ANATOMIX_FLASH_BLK"] = blk
    try:
        def fa(q, k, v):
            # fresh closure per blk: env is read at trace time
            return primus._flash_attention(q, k, v, scale)

        # chain q <- out to defeat probe shrinking; 48 calls per step so
        # device time (~37 ms) clears the ~28 ms dispatch floor (trap #6 —
        # the first sweep's 12-call chain read 0.087/0.000 ms fictions)
        CHAIN = 48

        def chain(q, k, v):
            for _ in range(CHAIN):
                q = primus._flash_attention(q, k, v, scale)
            return q

        out = jax.jit(fa)(q, k, v)
        if ref is None:
            ref = np.asarray(out.astype(jnp.float32))
            err = 0.0  # first config is the reference
        else:
            err = float(
                np.abs(np.asarray(out.astype(jnp.float32)) - ref).max()
            )
        t = pipeline_time(chain, q, n=2, reps=3, args=(k, v))
        print(
            f"blk={blk}: {t / CHAIN * 1e3:.3f} ms/attn (x{CHAIN} chain), "
            f"max dev vs first {err:.2e}",
            flush=True,
        )
    except Exception:
        print(f"blk={blk}: FAILED", flush=True)
        traceback.print_exc()


# --- splash attention (the newer TPU kernel): same shape, FullMask +
# segment-id padding; q pre-scaled (splash has no sm_scale) -----------------
from anatomix_tpu.utils.benchtools import pipeline_time as _pt  # noqa: E402

try:
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    N_, hd_ = 4104, 66
    Np, hdp = 4224, 128
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Np - N_), (0, hdp - hd_)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Np - N_), (0, hdp - hd_)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Np - N_), (0, hdp - hd_)))
    seg1 = (jnp.arange(Np) < N_).astype(jnp.int32)

    for bq, bkv in ((512, 1024), (1024, 1024), (2048, 512), (4224, 512)):
        try:
            mask = sm.MultiHeadMask(
                [sm.FullMask((Np, Np)) for _ in range(H)]
            )
            kernel = sk.make_splash_mha(
                mask,
                block_sizes=sk.BlockSizes(block_q=bq, block_kv=bkv),
                head_shards=1, q_seq_shards=1,
            )

            def one(qi, ki, vi):
                # (B=1, H, Np, hdp) -> per-batch call
                return kernel(
                    (qi[0] * scale).astype(qi.dtype), ki[0], vi[0],
                    segment_ids=sk.SegmentIds(seg1, seg1),
                )[None]

            out = jax.jit(one)(qp, kp, vp)
            err = float(np.abs(
                np.asarray(out[:, :, :N_, :hd_].astype(jnp.float32)) - ref
            ).max())

            CH = 48

            def chain(qi, ki, vi):
                for _ in range(CH):
                    qi = one(qi, ki, vi)
                return qi

            t = _pt(chain, qp, n=2, reps=3, args=(kp, vp))
            print(f"splash bq={bq} bkv={bkv}: {t / CH * 1e3:.3f} ms/attn, "
                  f"max dev vs first {err:.2e}", flush=True)
        except Exception:
            print(f"splash bq={bq} bkv={bkv}: FAILED", flush=True)
            traceback.print_exc()
except ImportError:
    print("splash attention unavailable in this jax", flush=True)
