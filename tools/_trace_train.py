"""Per-op trace of the pretraining step (304 ms @128 crop — conv fwd+bwd
only accounts for ~150 ms; find the rest).

PYTHONPATH=/root/repo:/root/.axon_site python tools/_trace_train.py
"""
import collections
import glob
import gzip
import json
import shutil

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from anatomix_tpu.models.unet import UnetConfig, build_plan
from anatomix_tpu.pretraining.train_step import (
    build_train_step,
    init_train_state,
)

plan = build_plan(
    UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16)
)
taps = (27, 31, 38, 45, 52, 65)
state = init_train_state(plan, jax.random.PRNGKey(0), tap_layers=taps,
                         num_patches=512, netf_nc=256, lr=2e-4)
rng = np.random.default_rng(0)
views = jax.jit(
    lambda k: jax.random.normal(k, (1, 2, 128, 128, 128, 1), jnp.float32)
)(jax.random.PRNGKey(1))
segs = jnp.asarray(rng.integers(0, 10, (1, 128, 128, 128, 1)).astype(np.int32))

step = build_train_step(plan, tap_layers=taps, num_patches=512,
                        nce_temperature=0.33, lr=2e-4,
                        compute_dtype=jnp.bfloat16, donate=False)
state, m = step(state, views, segs, jax.random.PRNGKey(2))
print("warm loss:", float(m["loss"]), flush=True)

shutil.rmtree("/tmp/trace_train", ignore_errors=True)
with jax.profiler.trace("/tmp/trace_train"):
    for _ in range(2):
        state, m = step(state, views, segs, jax.random.PRNGKey(2))
    print("traced loss:", float(m["loss"]), flush=True)

path = glob.glob("/tmp/trace_train/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(path, "rt") as fh:
    data = json.load(fh)
events = [e for e in data["traceEvents"] if e.get("ph") == "X"]
by_name = collections.Counter()
for e in events:
    by_name[e.get("name", "")] += e.get("dur", 0)
for name, dur in by_name.most_common(45):
    print(f"{dur/2/1000:9.3f} ms  {name[:110]}")
