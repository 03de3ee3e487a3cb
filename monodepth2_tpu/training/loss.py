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
from ..ops.geometry import (
    backproject,
    compose_transform,
    disparity_to_depth,
    invert_intrinsics,
    project,
)
from ..ops.grid_sample import grid_sample
from ..ops.losses import photometric_loss
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
    disp_reg_weight: Optional[Array] = None,
    Ks: Optional[Array] = None,
):
    """frames (N,L,H,W,C) -> (loss, aux dict).

    aux carries the finest-scale disparity, warped sources, per-pixel warp
    loss (for viz/debug — reference returns the same trio) and new BN stats.

    Ks (N,3,3), optional: per-item camera intrinsics. When given, each batch
    item backprojects/projects with ITS OWN calibration instead of ctx.K —
    KITTI's 22 odometry sequences genuinely differ in fx, and the reference
    trains the whole chain with sequence 1's K (src/Monodepth.jl:99). The
    cost is one adjugate inverse + swapping a shared (3,3) matmul operand
    for a batched (N,3,3) one — noise next to the warp itself.
    """
    target = frames[:, cfg.target_id]

    def model_fn(p, s, f):
        return model(p, s, f, cfg.source_ids, cfg.target_id, train=train)

    if cfg.remat:
        # rematerialize the network in the backward pass: trades FLOPs for
        # HBM, enabling larger batches/resolutions (SURVEY.md TPU notes)
        model_fn = jax.checkpoint(model_fn)

    if cfg.compute_dtype == "bfloat16":
        # mixed precision: network in bf16 on the MXU, geometry/loss in fp32.
        # Master params stay fp32 (the cast is linear, so gradients flow to
        # the fp32 leaves automatically).
        from ..nn.core import cast_tree

        bf16 = jnp.bfloat16
        disparities, poses, new_stats = model_fn(
            cast_tree(params, bf16), cast_tree(stats, bf16), frames.astype(bf16)
        )
        disparities = [d.astype(frames.dtype) for d in disparities]
        poses = [
            (r.astype(frames.dtype), t.astype(frames.dtype)) for r, t in poses
        ]
        new_stats = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), new_stats
        )
    else:
        disparities, poses, new_stats = model_fn(params, stats, frames)

    # target→source rigid transforms; sources before the target use the
    # inverted transform (reference src/training.jl:29-32)
    transforms = [
        compose_transform(rvec, tvec, invert=sid < cfg.target_id)
        for (rvec, tvec), sid in zip(poses, cfg.source_ids)
    ]

    width, height = cfg.target_size
    dtype = frames.dtype
    aux = {"stats": new_stats, "poses": poses}

    n, _, h, w, c = frames.shape
    S = len(cfg.scales)
    Src = len(cfg.source_ids)
    hw = h * w

    # ---- batch ALL scales (upsampled to full res, reference
    # src/training.jl:44-46) so the 4-scale × 2-source warp runs as ONE
    # grid-sample kernel launch and one batched SSIM instead of 8 small ones.
    disps_full = jnp.stack(
        [
            d if d.shape[1] == height and d.shape[2] == width
            else upsample_bilinear(d, size=(height, width))
            for d in disparities
        ],
        axis=0,
    )  # (S, N, H, W, 1)

    depth = disparity_to_depth(disps_full, cfg.min_depth, cfg.max_depth)
    if Ks is not None:
        # per-item calibration: fold over scales exactly like the batch
        Ks = Ks.astype(dtype)
        K_t = jnp.tile(Ks, (S, 1, 1))  # (S*N,3,3)
        invK_t = jnp.tile(invert_intrinsics(Ks), (S, 1, 1))
    else:
        K_t, invK_t = ctx.K, ctx.invK
    points = backproject(
        depth.reshape(S * n, hw), invK_t, ctx.grid
    )  # (S*N, HW, 3)

    # uv for every (scale, source): tile the per-source transform over scales
    uvs = []
    for R, t in transforms:
        Rt = jnp.tile(R, (S, 1, 1))
        tt = jnp.tile(t, (S, 1, 1))
        uvs.append(project(points, K_t, Rt, tt, w, h))  # (S*N, HW, 2)
    uv_all = jnp.concatenate(uvs, axis=0)  # (Src*S*N, HW, 2)

    src_imgs = jnp.concatenate(
        [jnp.tile(frames[:, sid], (S, 1, 1, 1)) for sid in cfg.source_ids], axis=0
    )  # (Src*S*N, H, W, C)

    sampled = grid_sample(src_imgs, uv_all, method=cfg.warp_method)
    warped_all = sampled.reshape(Src, S, n, h, w, c)

    # batched photometric loss: fold (Src,S) into the batch for one SSIM pass
    target_rep = jnp.broadcast_to(target, (Src * S, n, h, w, c)).reshape(
        Src * S * n, h, w, c
    )
    photo = photometric_loss(
        warped_all.reshape(Src * S * n, h, w, c), target_rep
    ).reshape(Src, S, n, h, w, 1)
    warp_loss = jnp.min(photo, axis=0)  # min over sources: (S, N, H, W, 1)
    if cfg.automasking and auto_loss is not None:
        warp_loss = jnp.minimum(auto_loss[None], warp_loss)

    # edge-aware smoothness, batched over scales (reference src/utils.jl:159-173)
    mean_disp = jnp.mean(disps_full, axis=(2, 3), keepdims=True)
    nd = (disps_full / (mean_disp + jnp.asarray(1e-7, dtype)))[..., 0]  # (S,N,H,W)
    dd_x = jnp.abs(nd[..., :-1] - nd[..., 1:])
    dd_y = jnp.abs(nd[..., :-1, :] - nd[..., 1:, :])
    di_x = jnp.exp(-jnp.mean(jnp.abs(target[:, :, :-1] - target[:, :, 1:]), axis=-1))
    di_y = jnp.exp(-jnp.mean(jnp.abs(target[:, :-1] - target[:, 1:]), axis=-1))
    smooth_per_scale = jnp.mean(dd_x * di_x[None], axis=(1, 2, 3)) + jnp.mean(
        dd_y * di_y[None], axis=(1, 2, 3)
    )  # (S,)

    scale_w = jnp.asarray(cfg.scales, dtype)
    per_scale = (
        jnp.mean(warp_loss, axis=(1, 2, 3, 4))
        + smooth_per_scale * jnp.asarray(cfg.disparity_smoothness, dtype) * scale_w
    )
    total = jnp.mean(per_scale)

    if disp_reg_weight is not None:
        # anti-collapse stabilizer (config.py disp_reg): L2 on the recovered
        # pre-sigmoid logit. d(logit²)/d(pre-activation) = 2·logit — a
        # non-vanishing restoring force even when the sigmoid saturates,
        # which is exactly when the photometric gradient dies (VALIDATION.md
        # saturation attractors).
        d = jnp.clip(disps_full, 1e-6, 1.0 - 1e-6)
        logit = jnp.log(d) - jnp.log1p(-d)
        total = total + disp_reg_weight * jnp.mean(logit * logit)

    aux["disparity"] = disps_full[-1]
    aux["warped"] = [warped_all[s, -1] for s in range(Src)]
    aux["warp_loss"] = warp_loss[-1]
    return total, aux
