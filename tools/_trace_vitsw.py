"""Trace the ViT 256^3 sliding-window extraction to attribute the gap
between 86 chunks x (4 x 17 ms fwd) ~ 5.8s expected and 19.6s measured.

PYTHONPATH=/root/repo:/root/.axon_site python tools/_trace_vitsw.py
"""
import collections
import glob
import gzip
import json
import shutil

import jax
import jax.numpy as jnp

from anatomix_tpu.extract import make_feature_extractor
from anatomix_tpu.models.registry import ANATOMIX_VARIANTS
from anatomix_tpu.models.vit3d import load_primus_v2

cfg, params = load_primus_v2(ANATOMIX_VARIANTS["anatomix-dev-vit"]["vit_kwargs"])
ext = make_feature_extractor(cfg, params, sw_batch_size=2, overlap=0.8,
                             compute_dtype=jnp.bfloat16)
vol = jax.jit(
    lambda k: jax.random.normal(k, (1, 256, 256, 256, 1), jnp.float32)
)(jax.random.PRNGKey(1))

y = ext.impl(vol, ext.arrays)
print("warm:", float(jnp.sum(y.astype(jnp.float32))))

shutil.rmtree("/tmp/trace", ignore_errors=True)
with jax.profiler.trace("/tmp/trace"):
    y = ext.impl(vol, ext.arrays)
    print("traced:", float(jnp.sum(y.astype(jnp.float32))))

path = glob.glob("/tmp/trace/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(path, "rt") as fh:
    data = json.load(fh)
events = [e for e in data["traceEvents"] if e.get("ph") == "X"]
by_name = collections.Counter()
for e in events:
    by_name[e.get("name", "")] += e.get("dur", 0)
for name, dur in by_name.most_common(35):
    print(f"{dur/1000:9.3f} ms  {name[:110]}")
