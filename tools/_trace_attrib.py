"""Trace a jitted program and attribute device time to SOURCE LINES.

Joins the profiler trace (per-op durations on the TPU lanes) with the
compiled HLO's metadata (op name -> source_file:line), then aggregates.
Usage:
    python tools/_trace_attrib.py vit      # 26M ViT fwd @128³ B=1
    python tools/_trace_attrib.py sw       # 6M sliding 256³ (1 call)
    python tools/_trace_attrib.py train    # pretrain step @128³
"""

import collections
import glob
import gzip
import json
import re
import shutil
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def build(which):
    if which in ("vit", "vitpacked"):
        from anatomix_tpu.models.vit3d import (
            PrimusConfig, init_primus_params, prepack_primus_tokenizer, primus_apply,
        )
        from anatomix_tpu.extract import partition_params

        cfg = PrimusConfig(
            embed_dim=396, eva_depth=12, eva_numheads=6,
            patch_embed_size=(8, 8, 8), input_shape=(128, 128, 128),
            num_register_tokens=8, qk_norm=True, num_classes=32,
            out_norm="demean", out_norm_eps=1e-2,
        )
        params = prepack_primus_tokenizer(
            cfg, init_primus_params(cfg, jax.random.PRNGKey(0)),
            compute_dtype=jnp.bfloat16,
        )
        # prepacked trees carry static string/int leaves — partition, do
        # NOT tree_map(jnp.asarray, ...)
        arrs, combine = partition_params(params)
        x = jax.jit(
            lambda k: jax.random.normal(
                k, (1, 128, 128, 128, 1), jnp.bfloat16
            )
        )(jax.random.PRNGKey(1))
        emit = "packed" if which == "vitpacked" else "spatial"
        f = jax.jit(
            lambda v, a: primus_apply(
                cfg, combine(a), v, compute_dtype=jnp.bfloat16, emit=emit
            )
        )
        return f, (x, arrs), 2
    if which == "sw":
        from anatomix_tpu.models.unet import (
            UnetConfig, build_plan, init_params,
        )
        from anatomix_tpu.extract import make_feature_extractor

        plan = build_plan(UnetConfig(
            dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16,
        ))
        params = init_params(plan, jax.random.PRNGKey(0))
        ext = make_feature_extractor(
            plan, params, strategy="sliding", roi_size=(128, 128, 128),
            sw_batch_size=4, overlap=0.8, compute_dtype=jnp.bfloat16,
        )
        vol = jax.jit(
            lambda k: jax.random.normal(
                k, (1, 256, 256, 256, 1), jnp.float32
            )
        )(jax.random.PRNGKey(1))
        return jax.jit(ext.impl), (vol, ext.arrays), 1
    if which == "devtiled":
        # 94M dev full_tiled 256³ — the fast-extraction headline
        # (BENCH dev_unet_full_tiled_256_seconds)
        from anatomix_tpu.extract import make_feature_extractor
        from anatomix_tpu.models.registry import ANATOMIX_VARIANTS
        from anatomix_tpu.models.unet import (
            UnetConfig, build_plan, init_params,
        )

        plan = build_plan(
            UnetConfig(**ANATOMIX_VARIANTS["anatomix-dev"]["unet_kwargs"])
        )
        ext = make_feature_extractor(
            plan, init_params(plan, jax.random.PRNGKey(0)),
            strategy="full_tiled", roi_size=(128, 128, 128),
            compute_dtype=jnp.bfloat16,
        )
        vol = jax.jit(
            lambda k: jax.random.normal(
                k, (1, 256, 256, 256, 1), jnp.float32
            )
        )(jax.random.PRNGKey(1))
        return ext.impl, (vol, ext.arrays), 1
    if which == "dev":
        # 94M dev per-window fused fwd @128³ (the sliding path's inner
        # call: live per-window instance norm). 343 of these make the
        # 20.9 s reference-exact 256³ sliding — this is THE lever for
        # the <10 s stretch (VERDICT r3 #6).
        from anatomix_tpu.extract import partition_params
        from anatomix_tpu.models.registry import ANATOMIX_VARIANTS
        from anatomix_tpu.models.unet import (
            UnetConfig, build_plan, init_params,
        )
        from anatomix_tpu.models.unet_fused import (
            prepack_fused, unet_apply_fused,
        )

        plan = build_plan(
            UnetConfig(**ANATOMIX_VARIANTS["anatomix-dev"]["unet_kwargs"])
        )
        params = prepack_fused(
            plan, init_params(plan, jax.random.PRNGKey(0)),
            input_spatial=(128, 128, 128), compute_dtype=jnp.bfloat16,
        )
        arrs, combine = partition_params(params)
        x = jax.jit(
            lambda k: jax.random.normal(
                k, (1, 128, 128, 128, 1), jnp.float32
            )
        )(jax.random.PRNGKey(1))
        f = jax.jit(
            lambda v, a: unet_apply_fused(
                plan, combine(a), v, compute_dtype=jnp.bfloat16
            )
        )
        return f, (x, arrs), 2
    if which == "fused6":
        # 6M fused fwd @128³ (BN folded, the bench patches/s unit):
        # measured 14.0–15.3 ms vs a 5.8 ms sparse-GEMM floor — attribute
        # the ~8.5 ms gap (dev got 57→~35 ms from glue alone, round 4c)
        from anatomix_tpu.extract import fold_batchnorm, partition_params
        from anatomix_tpu.models.unet import (
            UnetConfig, build_plan, init_params,
        )
        from anatomix_tpu.models.unet_fused import (
            prepack_fused, unet_apply_fused,
        )

        plan = build_plan(UnetConfig(
            dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16,
        ))
        fplan, fparams = fold_batchnorm(
            plan, init_params(plan, jax.random.PRNGKey(0))
        )
        params = prepack_fused(
            fplan, fparams, input_spatial=(128, 128, 128),
            compute_dtype=jnp.bfloat16,
        )
        arrs, combine = partition_params(params)
        x = jax.jit(
            lambda k: jax.random.normal(
                k, (1, 128, 128, 128, 1), jnp.float32
            )
        )(jax.random.PRNGKey(1))
        import os as _os_f6

        emit = (
            "fold" if _os_f6.environ.get("ANATOMIX_TRACE_EMIT", "fold")
            == "fold" else "spatial"
        )
        f = jax.jit(
            lambda v, a: unet_apply_fused(
                fplan, combine(a), v, compute_dtype=jnp.bfloat16,
                emit=emit,
            )
        )
        return f, (x, arrs), 2
    if which == "dx":
        # isolated input-gradient of the differentiable sparse conv at the
        # 128-crop training shape: trainkern measured dx ~4.4x the fwd
        # (16.4 vs 3.7 ms) even after the extent-tiling fix — attribute it
        import numpy as np

        from anatomix_tpu.ops.pallas.conv_block_train import (
            conv_block_sparse_train,
        )

        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal((2, 64, 64, 64, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((3, 3, 3, 16, 16)).astype(np.float32) * 0.1
        )
        b = jnp.asarray(rng.standard_normal(16).astype(np.float32))

        def loss(x, w, b):
            y = conv_block_sparse_train(
                x, w, b, "lrelu", "reflect", jnp.bfloat16
            )
            return jnp.sum(y.astype(jnp.float32))

        gx = jax.grad(loss, argnums=0)
        f = jax.jit(lambda x, w, b: jnp.sum(gx(x, w, b).astype(jnp.float32)))
        return f, (x, w, b), 4
    if which == "train":
        import numpy as np

        from anatomix_tpu.models.unet import UnetConfig, build_plan
        from anatomix_tpu.pretraining.train_step import (
            build_train_step, init_train_state,
        )

        plan = build_plan(UnetConfig(
            dimension=3, input_nc=1, output_nc=16, num_downs=4, ngf=16,
        ))
        taps = (27, 31, 38, 45, 52, 65)
        state = init_train_state(
            plan, jax.random.PRNGKey(0), tap_layers=taps, num_patches=512,
            netf_nc=256, lr=2e-4,
        )
        step = build_train_step(
            plan, tap_layers=taps, num_patches=512, nce_temperature=0.33,
            lr=2e-4, compute_dtype=jnp.bfloat16, donate=False,
        )
        views = jax.jit(lambda k: jax.random.normal(
            k, (1, 2, 128, 128, 128, 1), jnp.float32
        ))(jax.random.PRNGKey(4))
        segs = jnp.asarray(np.random.default_rng(3).integers(
            0, 10, (1, 128, 128, 128, 1)
        ).astype(np.int32))
        key = jax.random.PRNGKey(5)

        def f(st, v, s, k):
            return step(st, v, s, k)

        class _Wrap:
            def __init__(self):
                self._state = state

            def __call__(self, v, s, k):
                st, m = step(self._state, v, s, k)
                return m["loss"]

            def lower(self, v, s, k):
                return jax.jit(
                    lambda st, v, s, k: step(st, v, s, k)
                ).lower(state, v, s, k)

        w = _Wrap()
        return w, (views, segs, key), 1
    raise SystemExit(f"unknown target {which}")


def source_map(fn, args):
    """op name -> 'file:line' from the compiled HLO text."""
    txt = fn.lower(*args).compile().as_text()
    mp = {}
    pat = re.compile(
        r"%?([\w.\-]+) = .*?source_file=\"([^\"]+)\".*?source_line=(\d+)"
    )
    for line in txt.splitlines():
        m = pat.search(line)
        if m:
            name, f, ln = m.groups()
            f = f.split("/")[-1]
            mp[name] = f"{f}:{ln}"
    return mp


def main():
    which = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    fn, args, reps = build(which)
    y = fn(*args)
    print("warm:", float(jnp.sum(
        (y[0] if isinstance(y, tuple) else y).astype(jnp.float32)
    )) if hasattr(y, "astype") or isinstance(y, tuple) else y)

    tdir = f"/tmp/trace_{which}_attrib"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        for _ in range(reps):
            y = fn(*args)
        out = y[0] if isinstance(y, tuple) else y
        print("traced:", float(jnp.sum(out.astype(jnp.float32))))

    path = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)

    # keep only TPU-device lanes (pid whose name mentions TPU)
    tpu_pids = set()
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in str(e.get("args", {}).get("name", "")):
                tpu_pids.add(e["pid"])
    by_op = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        n = e.get("name", "")
        if n.startswith("$") or "asarray" in n:
            continue
        by_op[n] += e.get("dur", 0)

    try:
        smap = source_map(fn, args)
    except Exception as ex:  # lowering a wrapper may fail; degrade
        print("source_map failed:", ex)
        smap = {}

    by_line = collections.Counter()
    total = 0.0
    top_level = 0.0
    for name, dur in by_op.items():
        ms = dur / reps / 1000
        if name.startswith("jit_") or name.startswith("jit("):
            top_level = max(top_level, ms)
            continue
        src = smap.get(name)
        if src is None:
            base = name.split(".")[0]
            src = f"<{base}>"
        by_line[(src, name.split(".")[0])] += ms
        total += ms

    print(f"\n== {which}: top-level {top_level:.2f} ms, "
          f"sum of ops {total:.2f} ms ==")
    merged = collections.Counter()
    for (src, kind), ms in by_line.items():
        merged[f"{src:<46} {kind}"] += ms
    for k, ms in merged.most_common(topn):
        print(f"{ms:9.3f} ms  {k}")

    # HLO definitions of the top individual ops (shapes + layouts)
    print("\n== top-op HLO defs ==")
    try:
        txt = fn.lower(*args).compile().as_text()
        defs = {}
        for line in txt.splitlines():
            s = line.strip()
            if " = " in s and s.startswith("%"):
                defs[s.split(" = ")[0].lstrip("%")] = s
        for name, dur in by_op.most_common(60):
            if name in defs and dur / reps / 1000 > 0.3:
                print(f"[{dur/reps/1000:7.3f} ms] {defs[name][:240]}")
    except Exception as ex:
        print("hlo defs failed:", ex)


if __name__ == "__main__":
    main()
