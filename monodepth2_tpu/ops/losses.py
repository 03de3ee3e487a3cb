"""Photometric / smoothness losses and the differentiable warp.

Reference: src/training.jl:1-19 (photometric, automasking, prediction,
_apply_mask), src/utils.jl:159-173 (smooth_loss), and the per-scale warp block
src/training.jl:48-57. `warp_images` is also the honest reconstruction of the
`warp(...)` the reference's simple_depth calls but never defines
(src/simple_depth.jl:30-32 — latent bug, see SURVEY.md §3.4).

Shapes: images NHWC; frame stacks (N, L, H, W, C) with L the 3-frame temporal
axis; disparity (N, H, W, 1).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .geometry import backproject, disparity_to_depth, project
from .grid_sample import grid_sample
from .ssim import ssim

Array = jax.Array


def photometric_loss(predicted: Array, target: Array, alpha: float = 0.85) -> Array:
    """α·SSIM + (1−α)·L1, channel-averaged: NHWC -> (N,H,W,1).

    Reference: src/training.jl:1-7 (α=0.85).
    """
    l1 = jnp.mean(jnp.abs(target - predicted), axis=-1, keepdims=True)
    ssim_term = jnp.mean(ssim(predicted, target), axis=-1, keepdims=True)
    return alpha * ssim_term + (1.0 - alpha) * l1


def prediction_loss(predictions: Sequence[Array], target: Array) -> Array:
    """Per-pixel minimum of photometric losses over warped predictions.

    The min-reprojection trick of Monodepth2. Reference: src/training.jl:13-15.
    """
    losses = jnp.stack([photometric_loss(p, target) for p in predictions], axis=0)
    return jnp.min(losses, axis=0)


def automasking_loss(frames: Array, target: Array, source_ids: Sequence[int]) -> Array:
    """Identity-reprojection loss: min photometric of *unwarped* sources.

    frames (N,L,H,W,C), target (N,H,W,C). Reference: src/training.jl:9-11.
    """
    losses = jnp.stack(
        [photometric_loss(frames[:, i], target) for i in source_ids], axis=0
    )
    return jnp.min(losses, axis=0)


def apply_automask(auto_loss: Array, warp_loss: Array) -> Array:
    """Pixelwise min with the identity loss (reference src/training.jl:17-19)."""
    return jnp.minimum(auto_loss, warp_loss)


def smooth_loss(disparity: Array, image: Array) -> Array:
    """Edge-aware first-order smoothness: mean(|∇d|·exp(−|∇I|)) per axis.

    disparity (N,H,W), image (N,H,W,C). Reference: src/utils.jl:159-173
    (the reference's WHN first axis = width = our axis 2).
    """
    dd_x = jnp.abs(disparity[:, :, :-1] - disparity[:, :, 1:])
    dd_y = jnp.abs(disparity[:, :-1, :] - disparity[:, 1:, :])

    di_x = jnp.abs(image[:, :, :-1, :] - image[:, :, 1:, :])
    di_y = jnp.abs(image[:, :-1, :, :] - image[:, 1:, :, :])
    di_x = jnp.mean(di_x, axis=-1)
    di_y = jnp.mean(di_y, axis=-1)

    return jnp.mean(dd_x * jnp.exp(-di_x)) + jnp.mean(dd_y * jnp.exp(-di_y))


def warp_images(
    disparity: Array,
    frames: Array,
    poses: Sequence[Tuple[Array, Array]],
    K: Array,
    invK: Array,
    grid: Array,
    source_ids: Sequence[int],
    min_depth: float,
    max_depth: float,
    method: Optional[str] = None,
) -> list:
    """Warp each source frame into the target view through predicted depth.

    disparity (N,H,W,1) at full resolution, frames (N,L,H,W,C),
    poses[i] = (R (N,3,3), t (N,3,1)) target→source_i, grid (H*W,3).
    Returns [ (N,H,W,C) ] per source.

    This is the inner hot block of the training loss
    (src/training.jl:48-57): disparity → depth → backproject with invK →
    rigid transform + project with K → bilinear border grid-sample.
    """
    n, h, w, _ = disparity.shape
    depth = disparity_to_depth(disparity, min_depth, max_depth)
    points = backproject(depth.reshape(n, h * w), invK, grid)  # (N,HW,3)
    warped = []
    for (R, t), sid in zip(poses, source_ids):
        uv = project(points, K, R, t, w, h)  # (N,HW,2)
        sampled = grid_sample(frames[:, sid], uv, method=method)  # (N,HW,C)
        warped.append(sampled.reshape(n, h, w, frames.shape[-1]))
    return warped
