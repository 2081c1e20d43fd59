"""Measure 256^3 sliding extraction (6M UNet + ViT) after the folded
scatter + ViT sw_batch=1 changes.

PYTHONPATH=/root/repo:/root/.axon_site python tools/_bench_sw2.py
"""
import os
import sys

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

TARGET = sys.argv[1] if len(sys.argv) > 1 else "all"

from anatomix_tpu.extract import make_feature_extractor
from anatomix_tpu.models.registry import ANATOMIX_VARIANTS
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.models.vit3d import load_primus_v2
from anatomix_tpu.utils.benchtools import pipeline_time

vol = jax.jit(
    lambda k: jax.random.normal(k, (1, 256, 256, 256, 1), jnp.float32)
)(jax.random.PRNGKey(1))

if TARGET in ("all", "unet"):
    plan = build_plan(
    UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16)
)
    params = init_params(plan, jax.random.PRNGKey(0))
    ext = make_feature_extractor(
        plan, params, strategy="sliding", roi_size=(128, 128, 128),
        sw_batch_size=4, overlap=0.8, compute_dtype=jnp.bfloat16,
    )
    t = pipeline_time(ext.impl, vol, n=1, reps=2, args=(ext.arrays,))
    print(f"6M sliding 256^3: {t:.3f} s", flush=True)

if TARGET in ("all", "vit"):
    cfg, vparams = load_primus_v2(
        ANATOMIX_VARIANTS["anatomix-dev-vit"]["vit_kwargs"]
    )
    for b in (1, 2):
        extv = make_feature_extractor(
            cfg, vparams, sw_batch_size=b, overlap=0.8,
            compute_dtype=jnp.bfloat16,
        )
        tv = pipeline_time(extv.impl, vol, n=1, reps=2, args=(extv.arrays,))
        print(f"ViT sliding 256^3 (sw_batch={b}): {tv:.3f} s", flush=True)
