"""Patch-coordinate sampling strategies @ n=128³, p=512 (train-step trace
showed ~47 ms of sort in the 394 ms step from choice(replace=False)).

All candidates are EXACT uniform-without-replacement samplers:
  a) jax.random.choice(replace=False)      — full permutation (sort of n)
  b) top_k over iid uniform noise          — classic Gumbel-top-k property
  c) approx_max_k recall=0.95 over noise   — TPU-native partial reduction
     (still uniform: any fixed selection rule over iid noise is exchangeable,
     but only ~exact w.r.t. "without replacement"; measured for reference)
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from anatomix_tpu.utils.benchtools import amortized_time


def main():
    p = 512
    for n in (128 ** 3, 64 ** 3):
        key = jax.random.PRNGKey(0)

        def a(k):
            return jax.random.choice(k, n, (p,), replace=False)

        def b(k):
            g = jax.random.uniform(k, (n,), jnp.float32)
            _, idx = jax.lax.top_k(g, p)
            return idx

        def c(k):
            g = jax.random.uniform(k, (n,), jnp.float32)
            _, idx = jax.lax.approx_max_k(g, p, recall_target=0.95)
            return idx

        for name, f in (("choice", a), ("topk", b), ("approx", c)):
            # chain through the carry: next key = fold_in(key, sum(idx))
            def step(k):
                idx = f(k)
                return jax.random.fold_in(k, jnp.sum(idx) % 1000)

            try:
                t = amortized_time(step, key, n=32, reps=3)
                print(f"n={n:8d} {name:7s} {t*1000:8.3f} ms")
            except Exception as e:
                print(f"n={n:8d} {name:7s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
