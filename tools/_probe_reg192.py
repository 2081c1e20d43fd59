"""HW compile probe for the r03 registration failure (VERDICT r3 #2).

BENCH_r03's registration section died with `MosaicError: INTERNAL ...
tpu_compile_helper subprocess exit code 1` compiling the 6M full-strategy
extractor at 192³ — a shape whose 192-chain block extents (96/48/24/12/6)
the fused kernels had never compiled at (the 128/256 chains are all
powers of two). This probe:

  1. reproduces the exact extractor compile at 192³ (AOT lower+compile,
     no solver — cheap),
  2. on failure, bisects the failing conv layer by stripping the Pallas
     packs above a cutoff index (stripped convs fall back to XLA),
  3. prints one line per compile so the log identifies the kernel+extent.

Run via the TPU queue only (one client at a time).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.models.unet import UnetConfig, build_plan, init_params
from anatomix_tpu.models.unet_fused import prepack_fused, unet_apply_fused
from anatomix_tpu.extract import fold_batchnorm, partition_params

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 192


def log(msg):
    print(f"[probe192] {msg}", flush=True)


def main():
    plan = build_plan(
        UnetConfig(dimension=3, input_nc=1, output_nc=16, num_downs=4,
                   ngf=16)
    )
    params = init_params(plan, jax.random.PRNGKey(0))
    fplan, fparams = fold_batchnorm(plan, params)
    # replicate the bench registration path exactly: prepack at the
    # default roi (128³) but trace at SIZE³
    packed = prepack_fused(
        fplan, fparams, input_spatial=(128, 128, 128),
        compute_dtype=jnp.bfloat16,
    )
    conv_idxs = sorted(
        int(k) for k, v in packed.items()
        if k.isdigit() and isinstance(v, dict) and "fused" in v
    )
    log(f"fused convs: {conv_idxs}")

    def strip_above(p, cutoff):
        out = {}
        for k, v in p.items():
            if k.isdigit() and isinstance(v, dict):
                v = dict(v)
                if int(k) > cutoff:
                    v.pop("fused", None)
            out[k] = v
        return out

    vol_sds = jax.ShapeDtypeStruct((1, SIZE, SIZE, SIZE, 1), jnp.float32)

    def try_compile(label, p):
        arrays, combine = partition_params(p)

        def run(v, arrs):
            return unet_apply_fused(
                fplan, combine(arrs), v, compute_dtype=jnp.bfloat16
            )

        t0 = time.time()
        try:
            jax.jit(run).lower(vol_sds, arrays).compile()
            log(f"OK   {label} ({time.time() - t0:.1f}s)")
            return True
        except Exception as e:  # noqa: BLE001 — probe by design
            msg = str(e).replace("\n", " | ")[:400]
            log(f"FAIL {label} ({time.time() - t0:.1f}s): "
                f"{type(e).__name__}: {msg}")
            return False

    # 1. exact repro: all Pallas kernels on
    if try_compile(f"full@{SIZE}", packed):
        log("no repro — exact path compiles; r03 failure was transient")
        return

    # 2. bisect the smallest failing cutoff: cutoff k means Pallas packs
    # only on convs <= k (above -> XLA). all-XLA (cutoff -1) must pass.
    lo, hi = -1, len(conv_idxs) - 1  # lo passes (assumed), hi fails
    if not try_compile("all-xla", strip_above(packed, -1)):
        log("even all-XLA fails — not a Pallas kernel issue")
        return
    while hi - lo > 1:
        mid = (lo + hi) // 2
        cutoff = conv_idxs[mid] if mid >= 0 else -1
        ok = try_compile(f"pallas<= conv{cutoff}",
                         strip_above(packed, cutoff))
        if ok:
            lo = mid
        else:
            hi = mid
    bad = conv_idxs[hi]
    impl = packed[str(bad)]["fused"]["impl"]
    log(f"FIRST FAILING LAYER: conv {bad} (impl={impl})")
    # 3. confirm: that layer alone (strip everything else)
    solo = strip_above(packed, -1)
    solo[str(bad)] = dict(packed[str(bad)])
    try_compile(f"solo conv{bad}", solo)


if __name__ == "__main__":
    main()
