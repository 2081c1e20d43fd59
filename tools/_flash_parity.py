import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from anatomix_tpu.models.vit3d.primus import _flash_attention

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
B, H, N, hd = 1, 6, 4104, 66
q = jax.random.normal(k1, (B, H, N, hd), jnp.bfloat16)
k = jax.random.normal(k2, (B, H, N, hd), jnp.bfloat16)
v = jax.random.normal(k3, (B, H, N, hd), jnp.bfloat16)
scale = 1.0 / (hd ** 0.5)

@jax.jit
def ref(q, k, v):
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", attn.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32)

@jax.jit
def fl(q, k, v):
    return _flash_attention(q, k, v, scale)

r = ref(q, k, v).astype(jnp.float32)
f = fl(q, k, v).astype(jnp.float32)
err = float(jnp.max(jnp.abs(r - f)) / (jnp.max(jnp.abs(r)) + 1e-8))
print("flash vs xla rel err:", err, flush=True)
assert err < 2e-2, err
print("FLASH PARITY OK")
