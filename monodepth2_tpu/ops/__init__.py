"""Differentiable geometry + loss core (reference: src/utils.jl, src/training.jl).

Pure jax.numpy implementations, CPU-testable, with Pallas TPU kernels for the
warp hot loop under ops/pallas/. All conventions are 0-indexed NHWC (the
reference is 1-indexed Julia WHCN); normalization to (-1,1) keeps the same
align-corners effect as the reference's `normalize` (src/utils.jl:79-81).
"""

from .geometry import (
    hat,
    so3_exp_map,
    compose_transform,
    pixel_grid,
    backproject,
    project,
    disparity_to_depth,
    invert_intrinsics,
    safe_sqrt,
)
from .ssim import ssim
from .grid_sample import grid_sample
from .losses import (
    photometric_loss,
    automasking_loss,
    prediction_loss,
    apply_automask,
    smooth_loss,
    warp_images,
)

__all__ = [
    "hat",
    "so3_exp_map",
    "compose_transform",
    "pixel_grid",
    "backproject",
    "project",
    "disparity_to_depth",
    "invert_intrinsics",
    "safe_sqrt",
    "ssim",
    "grid_sample",
    "photometric_loss",
    "automasking_loss",
    "prediction_loss",
    "apply_automask",
    "smooth_loss",
    "warp_images",
]
