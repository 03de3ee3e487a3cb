"""Combined depth+pose model (reference: src/model.jl).

Forward folds the 3-frame temporal axis into the batch so the encoder runs
**once** over all frames (reference src/model.jl:9-14) — on TPU this keeps the
MXU fed with one large batch instead of 3 small ones. The depth decoder sees
the target frame's features only; the pose decoder runs per source on feature
pairs ordered (earlier, later) (reference `_get_pose_features`,
src/model.jl:30-35).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Module
from .depth_decoder import DepthDecoder
from .pose_decoder import PoseDecoder
from .resnet import ResNetEncoder

Array = jax.Array


@dataclass(frozen=True)
class Model(Module):
    encoder: ResNetEncoder
    depth_decoder: DepthDecoder
    pose_decoder: PoseDecoder

    @staticmethod
    def create(
        depth: int = 18,
        in_channels: int = 1,
        scale_levels: Sequence[int] = (2, 3, 4, 5),
        pose_tz_init: float = 0.0,
    ) -> "Model":
        encoder = ResNetEncoder(depth=depth, in_channels=in_channels)
        return Model(
            encoder=encoder,
            depth_decoder=DepthDecoder(
                encoder_channels=encoder.stages, scale_levels=tuple(scale_levels)
            ),
            pose_decoder=PoseDecoder(
                in_channels=encoder.stages[-1], tz_init=pose_tz_init
            ),
        )

    def init(self, key):
        ke, kd, kp = jax.random.split(key, 3)
        pe, se = self.encoder.init(ke)
        pd, sd = self.depth_decoder.init(kd)
        pp, sp = self.pose_decoder.init(kp)
        return (
            {"encoder": pe, "depth_decoder": pd, "pose_decoder": pp},
            {"encoder": se, "depth_decoder": sd, "pose_decoder": sp},
        )

    def __call__(
        self,
        params,
        stats,
        frames: Array,
        source_ids: Sequence[int] = (0, 2),
        target_id: int = 1,
        train: bool = False,
    ):
        """frames (N,L,H,W,C) -> (disparities coarse→fine, poses per source,
        new_stats). poses[i] = (rvec (N,3), tvec (N,3,1))."""
        n, l, h, w, c = frames.shape
        flat = frames.reshape(n * l, h, w, c)
        feats_flat, enc_stats = self.encoder(
            params["encoder"], stats["encoder"], flat, train=train
        )
        # un-flatten each stage to (N, L, h', w', c')
        feats = [f.reshape(n, l, *f.shape[1:]) for f in feats_flat]

        target_feats = [f[:, target_id] for f in feats]
        disparities, _ = self.depth_decoder(
            params["depth_decoder"], stats["depth_decoder"], target_feats, train=train
        )

        last = feats[-1]
        poses = []
        for sid in source_ids:
            if sid < target_id:
                pair = (last[:, sid], last[:, target_id])
            else:
                pair = (last[:, target_id], last[:, sid])
            pose, _ = self.pose_decoder(
                params["pose_decoder"], stats["pose_decoder"], pair, train=train
            )
            poses.append(pose)
        new_stats = dict(stats)
        new_stats["encoder"] = enc_stats
        return disparities, poses, new_stats

    def eval_disparity(self, params, stats, x: Array):
        """Single-image disparity inference: x (N,H,W,C) -> list of
        disparities coarse→fine (reference eval_disparity, src/model.jl:28)."""
        feats, _ = self.encoder(params["encoder"], stats["encoder"], x, train=False)
        disparities, _ = self.depth_decoder(
            params["depth_decoder"], stats["depth_decoder"], feats, train=False
        )
        return disparities
