"""Smoke-check the bench.py ViT section end-to-end on HW at reduced
reps: prepacked tree -> partition -> fwd (spatial + packed emit) -> the
sliding extractor built FROM the prepacked tree (the BENCH r04 failure
path: string metadata leaves must stay python-static)."""

import time

import jax
import jax.numpy as jnp

from anatomix_tpu.extract import make_feature_extractor, partition_params
from anatomix_tpu.models.registry import ANATOMIX_VARIANTS
from anatomix_tpu.models.vit3d import load_primus_v2, primus_apply
from anatomix_tpu.models.vit3d.primus import prepack_primus_tokenizer
from anatomix_tpu.utils.benchtools import pipeline_time

t0 = time.time()
cfg, params = load_primus_v2(
    ANATOMIX_VARIANTS["anatomix-dev-vit"]["vit_kwargs"]
)
params = prepack_primus_tokenizer(cfg, params, compute_dtype="bfloat16")
arrs, combine = partition_params(params)
print(f"[{time.time()-t0:6.1f}s] params ready")


def vit_fwd(v, a):
    return primus_apply(cfg, combine(a), v, compute_dtype="bfloat16")


def vit_fwd_packed(v, a):
    return primus_apply(
        cfg, combine(a), v, compute_dtype="bfloat16", emit="packed"
    )


xf = jax.jit(
    lambda k: jax.random.normal(k, (1, 128, 128, 128, 1), jnp.float32)
)(jax.random.PRNGKey(2))
t1 = pipeline_time(vit_fwd, xf, n=4, reps=2, args=(arrs,))
print(f"[{time.time()-t0:6.1f}s] vit fwd: {t1*1e3:.2f} ms")
t1p = pipeline_time(vit_fwd_packed, xf, n=4, reps=2, args=(arrs,))
print(f"[{time.time()-t0:6.1f}s] vit fwd packed: {t1p*1e3:.2f} ms")

vol256 = jax.jit(
    lambda k: jax.random.normal(k, (1, 256, 256, 256, 1), jnp.float32)
)(jax.random.PRNGKey(1))
ext = make_feature_extractor(
    cfg, params, sw_batch_size=1, overlap=0.8, compute_dtype="bfloat16"
)
t2 = pipeline_time(ext.impl, vol256, n=1, reps=1, args=(ext.arrays,))
print(f"[{time.time()-t0:6.1f}s] vit sliding 256: {t2:.3f} s")
print("SMOKE OK")
