"""Whole-volume feature extraction (the flagship inference workload).

Replaces the reference's `extract_features` (minmax-normalize + MONAI
sliding window, `/root/reference/anatomix/registration/convex_adam_utils.py:
134-221`) with a jit-compiled TPU pipeline:

* eval-mode batch norm is folded into the preceding convs (a per-channel
  affine — free at inference, saves HBM bandwidth),
* convs optionally run in bfloat16 with fp32 accumulation (`compute_dtype`),
* windows are batched and Gaussian-blend-stitched under one jit, optionally
  sharded across a device mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.models.unet import LayerSpec, UnetPlan, unet_apply
from anatomix_tpu.ops.sliding_window import sliding_window_inference


def fold_batchnorm(plan: UnetPlan, params: dict[str, Any]):
    """Fold eval-mode batch norms into their preceding convs.

    Returns `(folded_plan, folded_params)` where norm layers become
    'identity' no-ops (indices — and therefore tap semantics — are
    preserved: the activation at the identity layer equals the old norm
    output).
    """
    if plan.config.norm != "batch":
        return plan, params
    new_layers = list(plan.layers)
    new_params = {k: dict(v) for k, v in params.items()}
    prev_conv = None
    for idx, spec in enumerate(plan.layers):
        if spec.kind == "conv":
            prev_conv = idx
        elif spec.kind == "norm":
            p = new_params.pop(str(idx))
            inv = np.asarray(p["scale"], np.float32) / np.sqrt(
                np.asarray(p["var"], np.float32) + plan.config.norm_eps
            )
            shift = np.asarray(p["bias"], np.float32) - np.asarray(
                p["mean"], np.float32
            ) * inv
            conv_p = new_params[str(prev_conv)]
            conv_p["w"] = np.asarray(conv_p["w"], np.float32) * inv
            conv_p["b"] = (
                np.asarray(conv_p.get("b", 0.0), np.float32) + shift
                if "b" in conv_p
                else shift
            )
            new_layers[idx] = LayerSpec("identity")
    folded_plan = dataclasses.replace(plan, layers=tuple(new_layers))
    return folded_plan, new_params


def layer_spatials(plan: UnetPlan, input_spatial):
    """Input spatial dims seen by each layer index (pools halve, upsamples
    double; concat/convs preserve)."""
    spatials = {}
    cur = tuple(input_spatial)
    for idx, spec in enumerate(plan.layers):
        spatials[idx] = cur
        if spec.kind == "pool":
            cur = tuple(s // 2 for s in cur)
        elif spec.kind == "upsample":
            cur = tuple(s * 2 for s in cur)
    return spatials


def prepack_pallas(
    plan: UnetPlan,
    params: dict[str, Any],
    input_spatial=(128, 128, 128),
    compute_dtype=None,
):
    """Attach Pallas-packed weights to every conv layer the per-layer
    policy routes through the fused kernel (host-side, run once)."""
    from anatomix_tpu.ops.pallas.conv3x3 import choose_impl, prepack_conv

    spatials = layer_spatials(plan, input_spatial)
    new_params = {k: dict(v) for k, v in params.items()}
    for idx, spec in enumerate(plan.layers):
        if spec.kind != "conv":
            continue
        spatial = spatials[idx]
        if choose_impl(spec.in_ch, spec.out_ch, spatial) == "xla":
            continue
        p = new_params[str(idx)]
        p["pallas"] = prepack_conv(
            np.asarray(p["w"]),
            np.asarray(p["b"]) if "b" in p else None,
            spatial=spatial,
            compute_dtype=compute_dtype or jnp.bfloat16,
        )
    return new_params


def partition_params(params):
    """Split a (possibly Pallas-packed) param tree into its array leaves
    and a `combine` fn that rebuilds the tree at trace time.

    Arrays must travel as jit ARGUMENTS through the axon tunnel (closure
    constants ship inside the remote-compile payload, and large models —
    e.g. the packed 94M `anatomix-dev` — exceed its size limit), while the
    packed metadata (python scalars/strings/sets) must stay static.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    is_arr = [isinstance(x, (jax.Array, np.ndarray)) for x in leaves]
    arrays = [x for x, m in zip(leaves, is_arr) if m]

    def combine(arr_list):
        it = iter(arr_list)
        merged = [next(it) if m else x for x, m in zip(leaves, is_arr)]
        return jax.tree_util.tree_unflatten(treedef, merged)

    return arrays, combine


def _with_impl(impl, arrays):
    """Wrap a `(volume, arrays) -> features` jitted impl into a
    `volume -> features` extractor, exposing `.impl` and `.arrays` so
    callers that must pass params as explicit jit args (benchtools through
    the tunnel: closure constants hit the remote-compile payload limit)
    can reach them."""

    def fn(volume):
        return impl(volume, arrays)

    fn.impl = impl
    fn.arrays = arrays
    return fn


def minmax(arr: np.ndarray, minclip=None, maxclip=None) -> np.ndarray:
    """[0, 1] min-max normalization with optional clipping
    (`convex_adam_utils.py:134-156`)."""
    if not ((minclip is None) and (maxclip is None)):
        arr = np.clip(arr, minclip, maxclip)
    arr = arr.astype(np.float32)
    return (arr - arr.min()) / (arr.max() - arr.min())


def unit_normalize(feats: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Voxelwise unit L2 norm across channels (required for the dev models
    per the reference README)."""
    norm = jnp.linalg.norm(feats.astype(jnp.float32), axis=-1, keepdims=True)
    return (feats / jnp.maximum(norm, eps)).astype(feats.dtype)


def zscore_normalize(feats: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Voxelwise z-score across channels."""
    f32 = feats.astype(jnp.float32)
    mean = jnp.mean(f32, axis=-1, keepdims=True)
    std = jnp.std(f32, axis=-1, keepdims=True)
    return ((f32 - mean) / (std + eps)).astype(feats.dtype)


def make_feature_extractor(
    plan: UnetPlan,
    params: dict[str, Any],
    *,
    strategy: str = "sliding",
    roi_size=(128, 128, 128),
    sw_batch_size: int | None = None,  # auto: 2 (reference default; also
                                       # best for the ViT since the 3c
                                       # tokenizer/decoder rework: 9.43 s
                                       # vs 10.16 at B=1, wave 21)
    overlap: float = 0.8,
    mode: str = "gaussian",
    sigma_scale: float = 0.25,
    compute_dtype=None,
    fold_bn: bool = True,
    mesh=None,
    conv_impl: str = "auto",
):
    """Build a jitted `volume (1,D,H,W,C) -> features (1,D,H,W,out)` fn.

    Strategies:
      * 'sliding' — Gaussian-blended 128³ windows, the reference's exact
        semantics (`convex_adam_utils.py:202-219`).
      * 'full' — ONE whole-volume forward. For batch-norm models in eval
        mode the UNet is fully convolutional, so this computes the same
        feature map with a single consistent spatial context instead of 343
        overlapping window contexts — no tiling/blend artifacts, ~1/27th the
        FLOPs of overlap-0.8 tiling. Not bitwise-comparable to stitching
        (each stitched voxel mixes windows whose reflect-padding contexts
        differ); it is the artifact-free version of the same features.
        Spatial dims are padded to a multiple of 2^num_downs. NOT valid for
        instance-norm models (their normalization context is per-window).
      * 'full_tiled' — ONE whole-volume forward with instance-norm
        statistics computed per roi-sized subvolume tile
        (`ops/norms.tiled_instance_norm`): the documented fast variant for
        instance-norm models (`anatomix-dev`), whose normalization context
        is per-window under the reference semantics. Each voxel is
        normalized with the stats of its own ~roi³ tile — approximating
        the Gaussian blend of per-window stats at 1/27th the overlap-0.8
        FLOPs. Parity vs 'sliding' is quantified in
        tests/test_extract.py::test_full_tiled_vs_sliding.
      * 'auto' — 'full' for batch/none norms, 'sliding' otherwise.

    Speed/fidelity guidance for instance-norm models at 94M/256³ (the
    wave-26 HW Pareto, PERF.md round 4a): reference-exact sliding at
    overlap 0.8 is 20.9 s; `overlap=0.5` is 1.72 s at cosine 0.8715 to
    the reference features; `full_tiled` is 0.87 s at 0.7987. The default
    stays the reference-exact overlap-0.8 — pass `overlap=0.5` when
    throughput matters more than exact reference feature definitions
    (the cosine gap is instance-norm context, not kernel error).
    """
    # ViT backbone: fixed 128³ input -> sliding windows only
    # ("amenable to sliding window", reference README.md:47)
    from anatomix_tpu.models.vit3d import PrimusConfig, primus_apply

    if isinstance(plan, PrimusConfig):
        from anatomix_tpu.models.vit3d.primus import (
            prepack_primus_tokenizer,
        )

        vit_cfg = plan
        # prepacked trees carry python-static metadata leaves (strings/
        # ints) that must NOT be asarray'd — convert array leaves only,
        # so callers may pass either raw or already-prepacked params
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x)
            if isinstance(x, np.ndarray)
            and np.issubdtype(x.dtype, np.number)
            else x,
            params,
        )
        already_packed = (
            isinstance(params.get("tokenizer"), dict)
            and isinstance(params["tokenizer"].get("stem"), dict)
            and "pallas" in params["tokenizer"]["stem"]
        )
        if jax.default_backend() not in ("cpu",) and not already_packed:
            # one-time sparse packing of the fused tokenizer weights
            # (otherwise the pack gathers re-run on every window chunk)
            params = prepack_primus_tokenizer(
                vit_cfg, params, compute_dtype=compute_dtype
            )

        # params travel as jit ARGUMENTS: closure constants are shipped in
        # the remote-compile payload and large models exceed its size
        # limit. Prepacked trees carry python-static metadata leaves, so
        # only the array leaves ride as arguments; `combine` rebuilds the
        # tree at trace time (same discipline as the UNet pallas path).
        vit_arrays, vit_combine = partition_params(params)

        @jax.jit
        def extract_vit_impl(volume, arrs):
            p = vit_combine(arrs)
            from anatomix_tpu.ops.sliding_window import (
                scatter_kernel_eligible,
            )

            # emit the folded flat-lane window form straight from the
            # decoder exit kernel when the scatter kernel will stitch it
            # (zero XLA relayouts between model exit and canvas RMW)
            emit = "fold" if scatter_kernel_eligible(
                max(volume.shape[3], vit_cfg.input_shape[2]),
                vit_cfg.input_shape[2],
                vit_cfg.num_classes,
            ) else "spatial"

            def vit_window_fn(windows):
                return primus_apply(
                    vit_cfg, p, windows, compute_dtype=compute_dtype,
                    emit=emit,
                )

            # single-channel volumes ride the packed 4-D window form
            # (primus_apply handles both ranks; see sliding_window's
            # accepts_4d contract — dodges the 128x lane-padding of
            # (…, W, 1) tensors on every window slice)
            vit_window_fn.accepts_4d = True

            return sliding_window_inference(
                volume,
                vit_window_fn,
                vit_cfg.num_classes,
                roi_size=vit_cfg.input_shape,
                sw_batch_size=sw_batch_size or 2,
                overlap=overlap,
                mode=mode,
                sigma_scale=sigma_scale,
                mesh=mesh,
            )

        return _with_impl(extract_vit_impl, vit_arrays)

    if strategy == "auto":
        strategy = "full" if plan.config.norm in ("batch", "none") else "sliding"
    if fold_bn:
        plan, params = fold_batchnorm(plan, params)
    if conv_impl == "auto":
        # fused block-space Pallas path for eligible configs (needs folded
        # norms and a TPU backend — interpret-mode fallbacks are for tests)
        from anatomix_tpu.models.unet_fused import supports_fusion

        on_tpu = jax.default_backend() not in ("cpu",)
        fusable = (
            supports_fusion(plan.config)
            # batch norm must be folded; instance/none norms run live
            and (fold_bn or plan.config.norm != "batch")
            and on_tpu
            and mesh is None  # sharded paths take the plain-params route
        )
        conv_impl = "pallas_fused" if fusable else "xla"
    params = jax.tree_util.tree_map(jnp.asarray, params)
    if conv_impl == "pallas":
        # after tree_map: the packed metadata must stay python-static
        params = prepack_pallas(
            plan, params, input_spatial=roi_size,
            compute_dtype=compute_dtype or jnp.bfloat16,
        )
    elif conv_impl == "pallas_fused":
        from anatomix_tpu.models.unet_fused import (
            prepack_fused,
            supports_fusion,
        )

        if not supports_fusion(plan.config):
            raise ValueError(
                "pallas_fused requires batch/none/instance norm, "
                "nearest/trilinear interp, Max/Avg pool, reflect/zeros "
                "padding"
            )
        params = prepack_fused(
            plan, params, input_spatial=roi_size,
            compute_dtype=compute_dtype or jnp.bfloat16,
        )
    out_channels = plan.config.output_nc

    # split static packed metadata (python scalars) from array leaves so
    # params can travel as a jit argument (see ViT note above)
    def window_fn(p, windows, in_tile_counts=None, emit="spatial"):
        if conv_impl == "pallas_fused":
            from anatomix_tpu.models.unet_fused import unet_apply_fused

            return unet_apply_fused(
                plan, p, windows,
                compute_dtype=compute_dtype or jnp.bfloat16,
                in_tile_counts=in_tile_counts,
                emit=emit,
            )
        # non-fused impls always emit spatial windows; the sliding
        # scatter-kernel path reshapes them itself
        return unet_apply(
            plan, p, windows, compute_dtype=compute_dtype,
            conv_impl=conv_impl, in_tile_counts=in_tile_counts,
        )

    # all array leaves travel as jit args (tunnel payload limit); packed
    # python-static metadata stays in the closure via `combine`
    arrays, combine = partition_params(params)

    if strategy == "full" and mesh is not None and "space" in getattr(
        mesh, "axis_names", ()
    ):
        # single giant volume sharded over the 'space' axis with per-conv
        # halo exchange over ICI (parallel/spatial.py)
        from anatomix_tpu.parallel.spatial import spatial_sharded_unet

        return spatial_sharded_unet(
            plan, params, mesh, compute_dtype=compute_dtype
        )

    if strategy in ("full", "full_tiled"):
        stride = 2 ** plan.config.num_downs
        tiled = strategy == "full_tiled"

        @jax.jit
        def extract_impl(volume, arrs):
            p = combine(arrs)
            spatial = volume.shape[1:4]
            pads = [(0, 0)]
            crops = []
            for s in spatial:
                pad = (-s) % stride
                pads.append((pad // 2, pad - pad // 2))
                crops.append((pad // 2, pad // 2 + s))
            pads.append((0, 0))
            x = jnp.pad(volume, pads) if any(
                q != (0, 0) for q in pads
            ) else volume
            tile_counts = None
            if tiled:
                # ~roi-sized normalization tiles (static: shapes are known
                # at trace time); a 256³ volume with roi 128 gets 2×2×2
                tile_counts = tuple(
                    max(1, round(s / r))
                    for s, r in zip(x.shape[1:4], roi_size)
                )
            y = window_fn(p, x, in_tile_counts=tile_counts)
            (c0, c1), (c2, c3), (c4, c5) = crops
            return y[:, c0:c1, c2:c3, c4:c5, :]

        return _with_impl(extract_impl, arrays)

    if strategy != "sliding":
        raise ValueError(f"Unknown strategy: {strategy}")

    @jax.jit
    def extract_sliding_impl(volume, arrs):
        from anatomix_tpu.ops.sliding_window import (
            scatter_kernel_eligible,
        )

        p = combine(arrs)
        emit = "fold" if scatter_kernel_eligible(
            max(volume.shape[3], roi_size[2]), roi_size[2], out_channels
        ) else "spatial"

        def sliding_apply(windows):
            return window_fn(p, windows, emit=emit)

        # fused path + 1-channel model: slice packed 4-D windows (the
        # fused entry consumes them via its block-input pack; dodges the
        # 128x lane-padding of (…, W, 1) slices — see sliding_window)
        sliding_apply.accepts_4d = (
            conv_impl == "pallas_fused" and plan.config.input_nc == 1
        )
        return sliding_window_inference(
            volume,
            sliding_apply,
            out_channels,
            roi_size=roi_size,
            sw_batch_size=sw_batch_size or 2,
            overlap=overlap,
            mode=mode,
            sigma_scale=sigma_scale,
            mesh=mesh,
        )

    return _with_impl(extract_sliding_impl, arrays)


def extract_features(
    img_fixed: np.ndarray,
    img_moving: np.ndarray,
    plan: UnetPlan,
    params: dict[str, Any],
    fixminclip=None,
    fixmaxclip=None,
    movminclip=None,
    movmaxclip=None,
    **extractor_kwargs,
):
    """Reference-compatible two-volume feature extraction
    (`convex_adam_utils.py:159-221`). Returns channel-last jax arrays."""
    extractor = make_feature_extractor(plan, params, **extractor_kwargs)
    fixed = jnp.asarray(
        minmax(img_fixed, fixminclip, fixmaxclip)[None, ..., None]
    )
    moving = jnp.asarray(
        minmax(img_moving, movminclip, movmaxclip)[None, ..., None]
    )
    return extractor(fixed), extractor(moving)
