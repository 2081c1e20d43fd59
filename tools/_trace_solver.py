"""Per-op trace of the registration instance-opt loop (the 2.13 s @192^3
case-time is ~22 ms x 80 Adam iters — attribute what the 22 ms is: the
packed row-gather, box_filter fwd+bwd, elementwise, or Adam update).

PYTHONPATH=/root/repo:/root/.axon_site python tools/_trace_solver.py
"""
import collections
import glob
import gzip
import json
import shutil

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from anatomix_tpu.registration.solver import run_instance_opt

H = W = D = 192
C = 12  # merged MIND-dim features

feats_fix = jax.jit(
    lambda k: jax.random.normal(k, (1, H, W, D, C), jnp.float32)
)(jax.random.PRNGKey(0))
feats_mov = jax.jit(
    lambda k: jax.random.normal(k, (1, H, W, D, C), jnp.float32)
)(jax.random.PRNGKey(1))
disp0 = jnp.zeros((1, H, W, D, 3), jnp.float32)

out = run_instance_opt(
    disp0, feats_fix, feats_mov, grid_sp_adam=2, lambda_weight=0.75,
    selected_niter=80, selected_smooth=0,
)
print("warm:", float(jnp.sum(out)), flush=True)

shutil.rmtree("/tmp/trace_solver", ignore_errors=True)
with jax.profiler.trace("/tmp/trace_solver"):
    out = run_instance_opt(
        disp0, feats_fix, feats_mov, grid_sp_adam=2, lambda_weight=0.75,
        selected_niter=80, selected_smooth=0,
    )
    print("traced:", float(jnp.sum(out)), flush=True)

path = glob.glob("/tmp/trace_solver/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(path, "rt") as fh:
    data = json.load(fh)
events = [e for e in data["traceEvents"] if e.get("ph") == "X"]
by_name = collections.Counter()
total = 0
for e in events:
    by_name[e.get("name", "")] += e.get("dur", 0)
    total += e.get("dur", 0)
for name, dur in by_name.most_common(45):
    print(f"{dur/1000:9.3f} ms  {name[:110]}")
