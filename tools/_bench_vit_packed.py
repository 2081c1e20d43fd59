"""A/B the block-space ViT decoder (ANATOMIX_DECODER_BLOCK) on HW.

Measures the production packed-exit forward (emit='packed') and the
spatial forward with the gate OFF (stage decoder) vs ON (block-space
GEMM tower + factor-8 packed exit). Full-output consumption via
pipeline_time (no XLA shrinking).

Usage: python tools/_bench_vit_packed.py  (run via tools/_tpu_queue.sh)
"""
import os

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.extract import partition_params
from anatomix_tpu.models.vit3d import (
    PrimusConfig,
    init_primus_params,
    prepack_primus_tokenizer,
    primus_apply,
)
from anatomix_tpu.utils.benchtools import pipeline_time

cfg = PrimusConfig(embed_dim=396, eva_depth=12, eva_numheads=6,
                   patch_embed_size=(8, 8, 8), input_shape=(128, 128, 128),
                   num_register_tokens=8, qk_norm=True, num_classes=32,
                   out_norm="demean", out_norm_eps=1e-2)
params = prepack_primus_tokenizer(
    cfg, init_primus_params(cfg, jax.random.PRNGKey(0)),
    compute_dtype=jnp.bfloat16,
)
arrs, combine = partition_params(params)
x = jax.jit(lambda k: jax.random.normal(
    k, (1, 128, 128, 128, 1), jnp.float32))(jax.random.PRNGKey(1))


def run(emit, gate):
    os.environ["ANATOMIX_DECODER_BLOCK"] = gate

    def fwd(v, a):
        return primus_apply(cfg, combine(a), v,
                            compute_dtype=jnp.bfloat16, emit=emit)

    try:
        t = pipeline_time(fwd, x, n=4, reps=3, args=(arrs,))
        print(f"vit fwd emit={emit} block={gate}: {t * 1e3:.2f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001 — HW probe
        print(f"vit fwd emit={emit} block={gate}: FAIL "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


# HW parity first: both gates must produce byte-identical spatial values
# (shapes differ — fold (…,R,128) vs block (…,w,8C) — compare flattened
# on-device; only the scalar crosses the tunnel)
def spatial_bytes(gate):
    os.environ["ANATOMIX_DECODER_BLOCK"] = gate
    return jax.jit(
        lambda v, a: primus_apply(
            cfg, combine(a), v, compute_dtype=jnp.bfloat16, emit="packed"
        ).reshape(-1)
    )(x, arrs)


try:
    out0 = spatial_bytes("0")
    out1 = spatial_bytes("1")
    rel = float(jax.jit(
        lambda p0, p1: jnp.max(jnp.abs(
            p0.astype(jnp.float32) - p1.astype(jnp.float32)
        )) / (jnp.max(jnp.abs(p0.astype(jnp.float32))) + 1e-8)
    )(out0, out1))
    print(f"packed parity block=0 vs 1: rel max diff {rel:.3e}", flush=True)
except Exception as e:  # noqa: BLE001 — HW probe
    print(f"packed parity: FAIL {type(e).__name__}: {str(e)[:300]}",
          flush=True)

# NOTE: the env gate is read at trace time; each (emit, gate) pair traces
# fresh because `fwd` is a new closure per run() call.
run("packed", "0")
run("packed", "1")
run("spatial", "0")
run("spatial", "1")
