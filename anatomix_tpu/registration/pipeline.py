"""The training-free multimodal registration workload (flagship).

Orchestration matches `convex_adam` (`/root/reference/anatomix/registration/
run_convex_adam_with_network_feats.py:26-327`): load model → extract
anatomix features with sliding windows → ×downscale_feat_scalar → merge with
MIND-SSC (optional mask infill) → avg-pool to grid spacing → stage-1 coupled
convex (+inverse consistency) → stage-2 Adam instance optimization → warp
image (+labels) → save → report macro-Dice.

On TPU the whole post-feature solver runs as a handful of jitted programs;
host work is only file IO and the optional EDT infill.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from anatomix_tpu.extract import extract_features
from anatomix_tpu.models.load import load_model
from anatomix_tpu.ops.pool import avg_pool
from anatomix_tpu.registration.merge import merge_features
from anatomix_tpu.registration.solver import (
    run_instance_opt,
    run_stage1_registration,
)
from anatomix_tpu.registration.warp import warp_volume
from anatomix_tpu.utils.nifti import load_volume, save_volume


def macro_dice(fixed_seg: np.ndarray, moved_seg: np.ndarray) -> float:
    """Macro-averaged F1/Dice over the fixed segmentation's non-background
    labels (reference uses sklearn `f1_score(average='macro',
    labels=unique(fixseg)[1:])`, `run_convex_adam...py:283-295`)."""
    labels = np.unique(fixed_seg).astype(int).tolist()
    labels = [l for l in labels if l != 0]
    if not labels:
        return float("nan")
    scores = []
    f = fixed_seg.reshape(-1)
    m = moved_seg.reshape(-1)
    for lab in labels:
        tp = np.sum((f == lab) & (m == lab))
        fp = np.sum((f != lab) & (m == lab))
        fn = np.sum((f == lab) & (m != lab))
        denom = 2 * tp + fp + fn
        scores.append(2 * tp / denom if denom > 0 else 0.0)
    return float(np.mean(scores))


def register_pair(
    fixed_img: np.ndarray,
    moving_img: np.ndarray,
    plan,
    params,
    *,
    lambda_weight: float = 0.75,
    grid_sp: int = 2,
    disp_hw: int = 1,
    selected_niter: int = 80,
    selected_smooth: int = 0,
    grid_sp_adam: int = 2,
    ic: bool = True,
    use_mask: bool = False,
    fixed_mask: np.ndarray | None = None,
    moving_mask: np.ndarray | None = None,
    fixed_minclip=None,
    fixed_maxclip=None,
    moving_minclip=None,
    moving_maxclip=None,
    downscale_feat_scalar: float = 0.1,
    extract_strategy: str = "sliding",
    compute_dtype=None,
    conv_impl: str = "auto",
):
    """Core registration on in-memory volumes. Returns (disp_vox
    (1,H,W,D,3), solver_seconds). Displacement channels (dH, dW, dD) in
    voxel units. `conv_impl` routes the feature extractor's convs
    ("auto"/"xla"/"pallas_fused" — see `extract.make_feature_extractor`);
    "xla" is the safe fallback when a Pallas kernel fails to compile at an
    unusual volume extent."""
    pred_fixed, pred_moving = extract_features(
        fixed_img, moving_img, plan, params,
        fixminclip=fixed_minclip, fixmaxclip=fixed_maxclip,
        movminclip=moving_minclip, movmaxclip=moving_maxclip,
        strategy=extract_strategy, compute_dtype=compute_dtype,
        conv_impl=conv_impl,
    )
    pred_fixed = pred_fixed * downscale_feat_scalar
    pred_moving = pred_moving * downscale_feat_scalar

    _, _, feat_fix, feat_mov = merge_features(
        use_mask, pred_fixed, pred_moving, fixed_mask, moving_mask,
        fixed_img, moving_img,
    )

    H, W, D = feat_fix.shape[1:4]

    # ONE jitted program for the whole solver: through the remote-TPU
    # tunnel, eager op-by-op dispatch costs ~28 ms per op and dwarfs the
    # device time.
    @jax.jit
    def solve(ffix, fmov):
        fix_smooth = avg_pool(ffix.astype(jnp.float32), grid_sp)
        mov_smooth = avg_pool(fmov.astype(jnp.float32), grid_sp)
        disp = run_stage1_registration(
            fix_smooth, mov_smooth, disp_hw, grid_sp, (H, W, D), ic,
        )
        if selected_niter > 0:
            disp = run_instance_opt(
                disp, ffix, fmov,
                grid_sp_adam=grid_sp_adam, lambda_weight=lambda_weight,
                selected_niter=selected_niter,
                selected_smooth=selected_smooth, lr=1.0,
            )
        return disp

    # compile outside the timed region (the reference brackets device time
    # with cuda.synchronize; compilation is a one-time cost)
    disp_hr = jax.block_until_ready(solve(feat_fix, feat_mov))
    t0 = time.time()
    disp_hr = solve(feat_fix, feat_mov)
    float(jnp.sum(disp_hr))  # tunnel-proof sync
    solver_time = time.time() - t0
    return disp_hr, solver_time


def convex_adam(
    expname: str,
    lambda_weight: float,
    grid_sp: int,
    disp_hw: int,
    selected_niter: int,
    selected_smooth: int,
    ckpt_path: str | None = None,
    hf_variant: str | None = None,
    grid_sp_adam: int = 2,
    ic: bool = True,
    result_path: str = "./",
    fixed_image: str | None = None,
    moving_image: str | None = None,
    use_mask: bool = False,
    fixed_mask: str | None = None,
    moving_mask: str | None = None,
    fixed_minclip=None,
    fixed_maxclip=None,
    moving_minclip=None,
    moving_maxclip=None,
    warp_seg: bool = False,
    fixed_seg: str | None = None,
    moving_seg: str | None = None,
    downscale_feat_scalar: float = 0.1,
    num_downs: int = 4,
    ngf: int = 16,
    output_nc: int = 16,
    norm: str = "batch",
    interp: str = "nearest",
    pooling: str = "Max",
    extract_strategy: str = "sliding",
):
    """File-to-file registration CLI entry (reference-compatible flags)."""
    print("Loading model")
    plan, params = load_model(
        ckpt_path=ckpt_path, hf_variant=hf_variant,
        num_downs=num_downs, ngf=ngf, output_nc=output_nc,
        norm=norm, interp=interp, pooling=pooling,
    )

    fixedim, affine_mtx = load_volume(fixed_image)
    movingim, _ = load_volume(moving_image)

    fname = os.path.basename(moving_image)
    movsavename = fname[:-7] if fname.endswith(".nii.gz") else os.path.splitext(fname)[0]

    mask_f = mask_m = None
    if use_mask:
        mask_f, _ = load_volume(fixed_mask)
        mask_m, _ = load_volume(moving_mask)

    print("Running network on input images")
    disp_hr, case_time = register_pair(
        fixedim, movingim, plan, params,
        lambda_weight=lambda_weight, grid_sp=grid_sp, disp_hw=disp_hw,
        selected_niter=selected_niter, selected_smooth=selected_smooth,
        grid_sp_adam=grid_sp_adam, ic=ic, use_mask=use_mask,
        fixed_mask=mask_f, moving_mask=mask_m,
        fixed_minclip=fixed_minclip, fixed_maxclip=fixed_maxclip,
        moving_minclip=moving_minclip, moving_maxclip=moving_maxclip,
        downscale_feat_scalar=downscale_feat_scalar,
        extract_strategy=extract_strategy,
    )
    print("case time: ", case_time)

    moved = warp_volume(
        jnp.asarray(movingim, jnp.float32)[None, ..., None], disp_hr,
        mode="bilinear",
    )

    tag = "{}_g{}_hw{}_l{}_ga{}_ic{}_{}".format(
        movsavename, grid_sp, disp_hw, lambda_weight, grid_sp_adam, ic,
        expname,
    )
    os.makedirs(result_path, exist_ok=True)

    if warp_seg:
        fixseg, _ = load_volume(fixed_seg)
        movseg, _ = load_volume(moving_seg)
        moved_seg = warp_volume(
            jnp.asarray(movseg, jnp.float32)[None, ..., None], disp_hr,
            mode="nearest",
        )
        moved_seg_np = np.asarray(moved_seg)[0, ..., 0]
        save_volume(
            os.path.join(result_path, f"labels_moved_{tag}.nii.gz"),
            moved_seg_np, affine_mtx,
        )
        print("Dice: {}".format(macro_dice(fixseg, moved_seg_np)))

    save_volume(
        os.path.join(result_path, f"disp_{tag}.nii.gz"),
        np.asarray(disp_hr)[0], affine_mtx,
    )
    save_volume(
        os.path.join(result_path, f"moved_{tag}.nii.gz"),
        np.asarray(moved)[0, ..., 0], affine_mtx,
    )
