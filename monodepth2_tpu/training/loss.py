"""Multi-scale self-supervised training loss (reference: src/training.jl:21-78).

Per scale: bilinear-upsample disparity to full resolution → disparity→depth →
backproject → SE(3) transform + project → border grid-sample warp of each
source frame → SSIM+L1 min-reprojection loss (optionally automasked) +
mean-normalized edge-aware smoothness × weight × scale; averaged over scales.

Everything here traces into one XLA program: the 4-scale × 2-source warp block
(the reference's inner hot loop, src/training.jl:42-75) fuses with the model's
backward pass under jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..nn.core import upsample_bilinear
from ..ops.losses import (
    apply_automask,
    prediction_loss,
    smooth_loss,
    warp_images,
)
from ..ops.geometry import compose_transform
from .config import TrainConfig, TrainContext

Array = jax.Array


def train_loss(
    model,
    params,
    stats,
    frames: Array,
    ctx: TrainContext,
    cfg: TrainConfig,
    auto_loss: Optional[Array] = None,
    train: bool = True,
):
    """frames (N,L,H,W,C) -> (loss, aux dict).

    aux carries the finest-scale disparity, warped sources, per-pixel warp
    loss (for viz/debug — reference returns the same trio) and new BN stats.
    """
    target = frames[:, cfg.target_id]
    if cfg.compute_dtype == "bfloat16":
        # mixed precision: network in bf16 on the MXU, geometry/loss in fp32.
        # Master params stay fp32 (the cast is linear, so gradients flow to
        # the fp32 leaves automatically).
        bf16 = jnp.bfloat16
        cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(bf16), t)
        disparities, poses, new_stats = model(
            cast(params), cast(stats), frames.astype(bf16),
            cfg.source_ids, cfg.target_id, train=train,
        )
        disparities = [d.astype(frames.dtype) for d in disparities]
        poses = [
            (r.astype(frames.dtype), t.astype(frames.dtype)) for r, t in poses
        ]
        new_stats = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), new_stats
        )
    else:
        disparities, poses, new_stats = model(
            params, stats, frames, cfg.source_ids, cfg.target_id, train=train
        )

    # target→source rigid transforms; sources before the target use the
    # inverted transform (reference src/training.jl:29-32)
    transforms = [
        compose_transform(rvec, tvec, invert=sid < cfg.target_id)
        for (rvec, tvec), sid in zip(poses, cfg.source_ids)
    ]

    width, height = cfg.target_size
    dtype = frames.dtype
    total = jnp.zeros((), dtype)
    aux = {"stats": new_stats, "poses": poses}

    n_scales = len(cfg.scales)
    for i, (disparity, scale) in enumerate(zip(disparities, cfg.scales)):
        if disparity.shape[1] != height or disparity.shape[2] != width:
            disparity = upsample_bilinear(disparity, size=(height, width))

        warped = warp_images(
            disparity,
            frames,
            transforms,
            ctx.K,
            ctx.invK,
            ctx.grid,
            cfg.source_ids,
            cfg.min_depth,
            cfg.max_depth,
        )
        warp_loss = prediction_loss(warped, target)
        if cfg.automasking and auto_loss is not None:
            warp_loss = apply_automask(auto_loss, warp_loss)

        mean_disp = jnp.mean(disparity, axis=(1, 2), keepdims=True)
        normalized = (disparity / (mean_disp + jnp.asarray(1e-7, dtype)))[..., 0]
        disparity_loss = (
            smooth_loss(normalized, target)
            * jnp.asarray(cfg.disparity_smoothness, dtype)
            * jnp.asarray(scale, dtype)
        )

        total = total + jnp.mean(warp_loss) + disparity_loss

        if i == n_scales - 1:
            aux["disparity"] = disparity
            aux["warped"] = warped
            aux["warp_loss"] = warp_loss

    return total / n_scales, aux
