import glob, gzip, json, collections
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.extract import make_feature_extractor

plan = build_plan(UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16))
params = init_params(plan, jax.random.PRNGKey(0))
fx = make_feature_extractor(plan, params, strategy="sliding", roi_size=(128,128,128),
                            sw_batch_size=4, overlap=0.8, compute_dtype=jnp.bfloat16)
vol = jax.jit(lambda k: jax.random.normal(k, (1,256,256,256,1), jnp.float32))(jax.random.PRNGKey(1))
y = fx(vol); print(float(jnp.sum(y.astype(jnp.float32))))
import shutil; shutil.rmtree("/tmp/trace_sw", ignore_errors=True)
with jax.profiler.trace("/tmp/trace_sw"):
    y = fx(vol)
    print(float(jnp.sum(y.astype(jnp.float32))))
path = glob.glob("/tmp/trace_sw/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(path, "rt") as fh:
    data = json.load(fh)
events = [e for e in data["traceEvents"] if e.get("ph") == "X"]
by = collections.Counter()
for e in events:
    n = e.get("name","")
    if n.startswith("$") or "asarray" in n: continue
    by[n] += e.get("dur", 0)
for name, dur in by.most_common(25):
    print(f"{dur/1000:9.3f} ms  {name[:95]}")
