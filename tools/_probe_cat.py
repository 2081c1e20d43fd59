"""HW probe for the two-operand skip conv kernel (conv_block_sparse_cat):
compile + bitwise parity vs the materialized-concat path + timing, at the
anatomix-dev decoder shapes that are cat-eligible at a 128³ window
(block extents 64/32/16/8; the extent-4 level stays on the concat path).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.ops.pallas.conv_block import (
    conv_block_sparse,
    conv_block_sparse_cat,
    prepack_sparse,
    sparse_cat_eligible,
)
from anatomix_tpu.utils.benchtools import amortized_time

# CPU logic smoke: interpret mode, shrunk shapes, no timing
SMOKE = os.environ.get("ANATOMIX_PROBE_SMOKE", "0") == "1"

# (c1, c2, co, block_extent) — dev decoder convs 73/66/59/52 at 128³
SHAPES = [
    (32, 64, 32, 64),
    (64, 128, 64, 32),
    (128, 256, 128, 16),
    (256, 512, 256, 8),
]
if SMOKE:
    SHAPES = [(16, 32, 16, 8)]

for c1, c2, co, s in SHAPES:
    if not sparse_cat_eligible(c1, c2, s, "reflect", co=co):
        wmb = 64 * (c1 + c2) * 8 * co * 2 / 2 ** 20
        print(
            f"[cat {c1}+{c2}->{co} @blk {s}] ineligible "
            f"(weight pack {wmb:.1f} MB) — demotes to concat path",
            flush=True,
        )
        continue
    kd = jax.random.PRNGKey(c1)
    enc = jax.random.normal(kd, (1, s, s, s, 8 * c1), jnp.bfloat16)
    up = jax.random.normal(
        jax.random.PRNGKey(c1 + 1), (1, s, s, s, 8 * c2), jnp.bfloat16
    )
    wt = (
        jax.random.normal(
            jax.random.PRNGKey(2), (3, 3, 3, c1 + c2, co), jnp.float32
        )
        * 0.05
    )
    bias = jax.random.normal(jax.random.PRNGKey(3), (co,), jnp.float32)
    packed = prepack_sparse(wt, bias, act="relu")

    B, d, h, w = enc.shape[:4]
    cat = jnp.concatenate(
        [
            enc.reshape(B, d, h, w, 8, c1),
            up.reshape(B, d, h, w, 8, c2),
        ],
        axis=-1,
    ).reshape(B, d, h, w, 8 * (c1 + c2))

    t0 = time.perf_counter()
    got = conv_block_sparse_cat(enc, up, packed, interpret=SMOKE)
    got_np = np.asarray(got, np.float32)
    print(
        f"[cat {c1}+{c2}->{co} @blk {s}] compile+run "
        f"{time.perf_counter() - t0:.1f} s",
        flush=True,
    )
    ref = np.asarray(
        conv_block_sparse(
            cat, packed, pad_type="reflect", interpret=SMOKE
        ),
        np.float32,
    )
    bit = np.array_equal(got_np, ref)
    md = np.abs(got_np - ref).max()
    print(f"  bit-exact={bit} maxdiff={md:.3e}", flush=True)

    # timing: scalar carry perturbs the input (serializes the chain) and
    # the full output is sum-consumed (no probe shrinking)
    def t_cat_step(v, e, u):
        out = conv_block_sparse_cat(
            e + (v[0] * 1e-6).astype(e.dtype), u, packed
        )
        return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

    def t_ref_step(v, c):
        out = conv_block_sparse(
            c + (v[0] * 1e-6).astype(c.dtype), packed, pad_type="reflect"
        )
        return jnp.sum(out.astype(jnp.float32))[None] * 1e-6

    if not SMOKE:
        v0 = jnp.zeros((1,), jnp.float32)
        t_cat = amortized_time(t_cat_step, v0, n=8, args=(enc, up))
        t_ref = amortized_time(t_ref_step, v0, n=8, args=(cat,))
        print(
            f"  t_cat={t_cat * 1e3:.3f} ms  "
            f"t_concat_conv={t_ref * 1e3:.3f} ms",
            flush=True,
        )

if not SMOKE:
    # compile+run only: the dev full_tiled 256³ top level (block 128) —
    # too big for a concat reference copy on-chip, but the extent must
    # be probed before the cat gate defaults on (r03 lesson)
    c1, c2, co, s = 32, 64, 32, 128
    enc = jax.random.normal(
        jax.random.PRNGKey(9), (1, s, s, s, 8 * c1), jnp.bfloat16
    )
    up = jax.random.normal(
        jax.random.PRNGKey(10), (1, s, s, s, 8 * c2), jnp.bfloat16
    )
    wt = (
        jax.random.normal(
            jax.random.PRNGKey(2), (3, 3, 3, c1 + c2, co), jnp.float32
        )
        * 0.05
    )
    packed = prepack_sparse(wt, None, act="relu")
    t0 = time.perf_counter()
    s_out = float(
        jnp.sum(
            conv_block_sparse_cat(enc, up, packed).astype(jnp.float32)
        )
    )
    print(
        f"[cat {c1}+{c2}->{co} @blk {s}] compile+run "
        f"{time.perf_counter() - t0:.1f} s (sum {s_out:.3e})",
        flush=True,
    )
print("probe_cat done", flush=True)
