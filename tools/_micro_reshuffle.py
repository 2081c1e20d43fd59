import jax, jax.numpy as jnp
from anatomix_tpu.ops.pallas.reshuffle import depth_to_space, space_to_depth
from anatomix_tpu.ops.pallas.conv3x3 import _depth_to_space, _space_to_depth
from anatomix_tpu.utils.benchtools import amortized_time

k = jax.random.PRNGKey(0)
y = jax.jit(lambda k: jax.random.normal(k, (1,64,64,64,128), jnp.bfloat16))(k)
x = jax.jit(lambda k: jax.random.normal(k, (1,128,128,128,16), jnp.bfloat16))(k)

# correctness vs XLA
d2s_p = depth_to_space(y)
d2s_x = _depth_to_space(y)
print("d2s match:", bool(jnp.all(d2s_p == d2s_x)))
s2d_p = space_to_depth(x)
s2d_x = _space_to_depth(x)
print("s2d match:", bool(jnp.all(s2d_p == s2d_x)))

# timing: chain with a roundtrip so carry shape matches
f_pallas = lambda v: space_to_depth(depth_to_space(v))
f_xla = lambda v: _space_to_depth(_depth_to_space(v))
tp = amortized_time(f_pallas, y, n=10, reps=3)
tx = amortized_time(f_xla, y, n=10, reps=3)
print(f"pallas d2s+s2d roundtrip: {tp*1e3:.3f} ms   xla: {tx*1e3:.3f} ms")

# 1-channel entry s2d
x1 = jax.jit(lambda k: jax.random.normal(k, (1,128,128,128,1), jnp.bfloat16))(k)
print("entry s2d match:", bool(jnp.all(space_to_depth(x1) == _space_to_depth(x1))))
f1p = lambda v: depth_to_space(space_to_depth(v))
f1x = lambda v: _depth_to_space(_space_to_depth(v))
print(f"1ch roundtrip pallas: {amortized_time(f1p, x1, n=10, reps=3)*1e3:.3f} ms  xla: {amortized_time(f1x, x1, n=10, reps=3)*1e3:.3f} ms")
