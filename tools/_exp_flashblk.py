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
for blk in (384, 1408, 2176, 4224):
    os.environ["ANATOMIX_FLASH_BLK"] = str(blk)
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
            err = 0.0
        else:
            err = float(
                np.abs(np.asarray(out.astype(jnp.float32)) - ref).max()
            )
        t = pipeline_time(chain, q, n=2, reps=3, args=(k, v))
        print(
            f"blk={blk}: {t / CHAIN * 1e3:.3f} ms/attn (x{CHAIN} chain), "
            f"max dev vs blk384 {err:.2e}",
            flush=True,
        )
    except Exception:
        print(f"blk={blk}: FAILED", flush=True)
        traceback.print_exc()
