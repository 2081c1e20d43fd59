"""Training-free multimodal registration (ConvexAdam + anatomix features).

Public surface mirrors the reference's `anatomix/registration/__init__.py`:
`extract_features, load_model, MINDSSC, correlate, coupled_convex,
inverse_consistency, run_stage1_registration, run_instance_opt,
merge_features, diffusion_regularizer, apply_avg_pool3d` plus `convex_adam`.
"""

from anatomix_tpu.extract import extract_features
from anatomix_tpu.models.load import load_model
from anatomix_tpu.ops.pool import box_filter as apply_avg_pool3d
from anatomix_tpu.registration.correlate import (
    COUPLED_COEFFS,
    correlate,
    coupled_convex,
    displacement_mesh,
)
from anatomix_tpu.registration.merge import merge_features
from anatomix_tpu.registration.mind import mindssc as MINDSSC
from anatomix_tpu.registration.mind import mindssc, pdist_squared
from anatomix_tpu.registration.pipeline import (
    convex_adam,
    macro_dice,
    register_pair,
)
from anatomix_tpu.registration.solver import (
    run_instance_opt,
    run_stage1_registration,
)
from anatomix_tpu.registration.warp import (
    diffusion_regularizer,
    generate_grid,
    inverse_consistency,
    jacobian_det,
    normalize_disp,
    smooth_disp,
    warp_volume,
)

__all__ = [
    "COUPLED_COEFFS",
    "MINDSSC",
    "apply_avg_pool3d",
    "convex_adam",
    "correlate",
    "coupled_convex",
    "diffusion_regularizer",
    "displacement_mesh",
    "extract_features",
    "generate_grid",
    "inverse_consistency",
    "jacobian_det",
    "load_model",
    "macro_dice",
    "merge_features",
    "mindssc",
    "normalize_disp",
    "pdist_squared",
    "register_pair",
    "run_instance_opt",
    "run_stage1_registration",
    "smooth_disp",
    "warp_volume",
]
