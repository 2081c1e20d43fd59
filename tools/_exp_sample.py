"""Patch-coordinate sampling strategies @ n=128³, p=512 (train-step trace
showed ~47 ms of sort in the 394 ms step from choice(replace=False)).

All candidates draw uniformly WITHOUT replacement (the randperm-take-p
distribution): top-k over iid noise is the classic Gumbel-top-k property.
approx_max_k relaxes exactness (recall<1) and is measured for reference.
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from anatomix_tpu.utils.benchtools import amortized_time


def main():
    p = 512
    base = jax.random.PRNGKey(0)
    for n in (128 ** 3, 64 ** 3):
        def make(sampler):
            def step(v):
                k = jax.random.fold_in(
                    base, jnp.sum(v).astype(jnp.int32) % 997
                )
                idx = sampler(k)
                return v + jnp.mean(idx.astype(jnp.float32)) * 1e-9

            return step

        def s_choice(k):
            return jax.random.choice(k, n, (p,), replace=False)

        def s_topk(k):
            g = jax.random.uniform(k, (n,), jnp.float32)
            _, idx = jax.lax.top_k(g, p)
            return idx

        def s_approx(k):
            g = jax.random.uniform(k, (n,), jnp.float32)
            _, idx = jax.lax.approx_max_k(g, p, recall_target=0.95)
            return idx

        v0 = jnp.ones((8, 128), jnp.float32)
        for name, s in (("choice", s_choice), ("topk", s_topk),
                        ("approx", s_approx)):
            try:
                t = amortized_time(make(s), v0, n=32, reps=3)
                print(f"n={n:8d} {name:7s} {t*1000:8.3f} ms")
            except Exception as e:
                print(f"n={n:8d} {name:7s} FAILED {type(e).__name__}: "
                      f"{str(e)[:150]}")


if __name__ == "__main__":
    main()
