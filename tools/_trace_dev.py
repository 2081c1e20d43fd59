import glob, gzip, json, collections
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.models.unet_fused import prepack_fused, unet_apply_fused
from anatomix_tpu.extract import partition_params

cfg = UnetConfig(dimension=3, input_nc=1, output_nc=32, num_downs=5, ngf=32,
                 norm="instance", pooling="Avg", interp="trilinear", norm_eps=1e-2)
plan = build_plan(cfg)
params = jax.tree_util.tree_map(jnp.asarray, init_params(plan, jax.random.PRNGKey(0)))
pf = prepack_fused(plan, params, input_spatial=(128,128,128), compute_dtype=jnp.bfloat16)
arrs, combine = partition_params(pf)
x = jax.jit(lambda k: jax.random.normal(k, (1,128,128,128,1), jnp.bfloat16))(jax.random.PRNGKey(2))
f = jax.jit(lambda v, a: unet_apply_fused(plan, combine(a), v, compute_dtype=jnp.bfloat16))
y = f(x, arrs); print(float(jnp.sum(y.astype(jnp.float32))))
import shutil; shutil.rmtree("/tmp/trace_dev", ignore_errors=True)
with jax.profiler.trace("/tmp/trace_dev"):
    y = f(x, arrs)
    print(float(jnp.sum(y.astype(jnp.float32))))
path = glob.glob("/tmp/trace_dev/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(path, "rt") as fh:
    data = json.load(fh)
events = [e for e in data["traceEvents"] if e.get("ph") == "X"]
by = collections.Counter()
for e in events:
    n = e.get("name","")
    if n.startswith("$") or "asarray" in n: continue
    by[n] += e.get("dur", 0)
tot = 0
for name, dur in by.most_common(30):
    print(f"{dur/1000:8.3f} ms  {name[:90]}")
