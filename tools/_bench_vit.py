import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from anatomix_tpu.models.vit3d import PrimusConfig, primus_apply, init_primus_params, prepack_primus_tokenizer
from anatomix_tpu.extract import partition_params
from anatomix_tpu.utils.benchtools import amortized_time

cfg = PrimusConfig(embed_dim=396, eva_depth=12, eva_numheads=6,
                   patch_embed_size=(8,8,8), input_shape=(128,128,128),
                   num_register_tokens=8, qk_norm=True, num_classes=32,
                   out_norm="demean", out_norm_eps=1e-2)
params = prepack_primus_tokenizer(cfg, init_primus_params(cfg, jax.random.PRNGKey(0)))
arrs, combine = partition_params(params)  # prepacked trees carry static
# string/int leaves — tree_map(jnp.asarray, ...) would choke on them
x = jax.jit(lambda k: jax.random.normal(k, (1,128,128,128,1), jnp.bfloat16))(jax.random.PRNGKey(1))
def fwd(v, *a):
    return primus_apply(cfg, combine(a), v, compute_dtype=jnp.bfloat16)[..., :1].astype(jnp.bfloat16)
t = amortized_time(fwd, x, n=4, reps=2, args=tuple(arrs))
print(f"26M ViT fwd @128^3: {t*1e3:.1f} ms")
