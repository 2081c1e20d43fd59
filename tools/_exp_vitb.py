"""ViT forward batch scaling: is the 256^3 sliding slowness (19.6s vs
~5.8s expected from the B=1 fwd) a batched-forward inefficiency?

PYTHONPATH=/root/repo:/root/.axon_site python tools/_exp_vitb.py
"""
import jax
import jax.numpy as jnp

from anatomix_tpu.models.registry import ANATOMIX_VARIANTS
from anatomix_tpu.models.vit3d import load_primus_v2, primus_apply
from anatomix_tpu.utils.benchtools import pipeline_time

cfg, params = load_primus_v2(ANATOMIX_VARIANTS["anatomix-dev-vit"]["vit_kwargs"])


def fwd(v, p):
    return primus_apply(cfg, p, v, compute_dtype=jnp.bfloat16)


for B in (1, 2, 4):
    x = jax.jit(
        lambda k, b=B: jax.random.normal(
            k, (b, 128, 128, 128, 1), jnp.float32
        )
    )(jax.random.PRNGKey(B))
    t = pipeline_time(fwd, x, n=3, reps=3, args=(params,))
    print(f"B={B}: {t*1e3:8.2f} ms total  {t/B*1e3:7.2f} ms/window",
          flush=True)
