import glob, gzip, json, collections
import jax, jax.numpy as jnp
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.extract import fold_batchnorm
from anatomix_tpu.models.unet_fused import prepack_fused, unet_apply_fused

plan = build_plan(UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16))
params = init_params(plan, jax.random.PRNGKey(0))
fplan, fparams = fold_batchnorm(plan, params)
pf = prepack_fused(fplan, fparams, input_spatial=(128,128,128), compute_dtype=jnp.bfloat16)
x = jax.jit(lambda k: jax.random.normal(k, (1,128,128,128,1), jnp.bfloat16))(jax.random.PRNGKey(2))
f = jax.jit(lambda v: unet_apply_fused(fplan, pf, v, compute_dtype=jnp.bfloat16))
y = f(x); print(float(jnp.sum(y.astype(jnp.float32))))  # warm
import shutil; shutil.rmtree("/tmp/trace", ignore_errors=True)
with jax.profiler.trace("/tmp/trace"):
    for _ in range(3):
        y = f(x)
    print(float(jnp.sum(y.astype(jnp.float32))))

path = glob.glob("/tmp/trace/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(path, "rt") as fh:
    data = json.load(fh)
# find TPU pid lanes
events = [e for e in data["traceEvents"] if e.get("ph") == "X"]
by_name = collections.Counter()
for e in events:
    name = e.get("name", "")
    if name.startswith(("Infeed", "Outfeed")) or "/" in name and False:
        continue
    by_name[name] += e.get("dur", 0)
total = sum(by_name.values())
for name, dur in by_name.most_common(40):
    print(f"{dur/3/1000:9.3f} ms  {name[:110]}")
