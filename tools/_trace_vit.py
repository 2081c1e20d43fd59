import glob, gzip, json, collections
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from anatomix_tpu.models.vit3d import PrimusConfig, primus_apply, init_primus_params, prepack_primus_tokenizer
from anatomix_tpu.extract import partition_params

cfg = PrimusConfig(embed_dim=396, eva_depth=12, eva_numheads=6,
                   patch_embed_size=(8,8,8), input_shape=(128,128,128),
                   num_register_tokens=8, qk_norm=True, num_classes=32,
                   out_norm="demean", out_norm_eps=1e-2)
params = prepack_primus_tokenizer(cfg, init_primus_params(cfg, jax.random.PRNGKey(0)))
arrs, combine = partition_params(jax.tree_util.tree_map(jnp.asarray, params))
x = jax.jit(lambda k: jax.random.normal(k, (1,128,128,128,1), jnp.bfloat16))(jax.random.PRNGKey(1))
f = jax.jit(lambda v, a: primus_apply(cfg, combine(a), v, compute_dtype=jnp.bfloat16))
y = f(x, arrs); print(float(jnp.sum(y.astype(jnp.float32))))
import shutil; shutil.rmtree("/tmp/trace_vit", ignore_errors=True)
with jax.profiler.trace("/tmp/trace_vit"):
    for _ in range(2):
        y = f(x, arrs)
    print(float(jnp.sum(y.astype(jnp.float32))))
path = glob.glob("/tmp/trace_vit/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(path, "rt") as fh:
    data = json.load(fh)
events = [e for e in data["traceEvents"] if e.get("ph") == "X"]
by = collections.Counter()
for e in events:
    by[e.get("name","")] += e.get("dur", 0)
for name, dur in by.most_common(28):
    if name.startswith("$") or "asarray" in name or "trace" in name: continue
    print(f"{dur/2/1000:8.3f} ms  {name[:100]}")

txt = f.lower(x, arrs).compile().as_text()
# dump the definitions (and called computations) of the top trace ops
tops = [n for n, d in by.most_common(40)
        if ("fusion" in n or "copy" in n or "reshape" in n)
        and d / 2 > 1500][:6]
lines = txt.splitlines()
for target in tops:
    for i, line in enumerate(lines):
        st = line.strip()
        if st.startswith(f"%{target} ") or st.startswith(f"{target} "):
            print("=" * 20, target)
            print(st[:400])
            import re as _re
            m = _re.search(r"calls=%([\w.\-]+)", st)
            if m:
                comp = m.group(1)
                ci = next((j for j, l in enumerate(lines)
                           if l.strip().startswith(f"%{comp} ")), None)
                if ci is not None:
                    for l in lines[ci:ci + 40]:
                        print("   ", l.strip()[:240])
                        if l.strip().startswith("ROOT"):
                            break
            break
