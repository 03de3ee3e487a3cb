"""U-Net depth decoder with per-scale sigmoid disparity heads.

Reference: src/depth_decoder.jl. Five up-stages with decoder channels
[256,128,64,32,16]; each stage is a BranchBlock (reflect-pad 3×3 conv-ELU →
2× bilinear upsample → concat encoder skip → reflect-pad 3×3 conv-ELU); the
stages are partitioned among the requested `scale_levels` (train config 2..5,
src/Monodepth.jl:106), each partition ending in a reflect-pad 3×3 conv +
sigmoid 1-channel disparity head. Returns one disparity per scale level,
coarse → fine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Conv, Module, upsample_bilinear

Array = jax.Array

DECODER_CHANNELS = (256, 128, 64, 32, 16)


@dataclass(frozen=True)
class BranchBlock(Module):
    """conv-ELU → 2× bilinear up → concat skip → conv-ELU
    (reference src/depth_decoder.jl:7-19)."""

    in_ch: int
    skip_ch: int
    out_ch: int

    def _parts(self):
        c1 = Conv(self.in_ch, self.out_ch, 3, 1, "reflect", act=jax.nn.elu)
        c2 = Conv(self.out_ch + self.skip_ch, self.out_ch, 3, 1, "reflect", act=jax.nn.elu)
        return c1, c2

    def init(self, key):
        c1, c2 = self._parts()
        k1, k2 = jax.random.split(key)
        return {"c1": c1.init(k1)[0], "c2": c2.init(k2)[0]}, {}

    def __call__(self, params, stats, x, skip=None, train: bool = False):
        c1, c2 = self._parts()
        y, _ = c1(params["c1"], {}, x)
        y = upsample_bilinear(y, scale=2)
        if skip is not None:
            y = jnp.concatenate([y, skip], axis=-1)
        y, _ = c2(params["c2"], {}, y)
        return y, stats


@dataclass(frozen=True)
class DepthDecoder(Module):
    """encoder_channels: per-stage channels, fine→coarse (encoder.stages);
    scale_levels ⊆ 1..5 pick which up-stages emit a disparity head."""

    encoder_channels: Tuple[int, ...] = (64, 64, 128, 256, 512)
    scale_levels: Tuple[int, ...] = (2, 3, 4, 5)

    def __post_init__(self):
        sl = self.scale_levels
        if len(sl) > 5 or min(sl) < 1 or max(sl) > 5:
            raise ValueError(
                "scale_levels must have ≤5 entries with values in [1, 5]"
            )
        if tuple(sorted(sl)) != tuple(sl):
            raise ValueError("scale_levels must be sorted ascending")

    def _blocks(self):
        enc = tuple(reversed(self.encoder_channels))  # coarse→fine
        head = enc[0]
        in_channels = (head,) + DECODER_CHANNELS[:-1]
        skip_channels = enc[1:] + (0,)
        blocks = [
            BranchBlock(in_channels[i], skip_channels[i], DECODER_CHANNELS[i])
            for i in range(5)
        ]
        heads = {
            level: Conv(DECODER_CHANNELS[level - 1], 1, 3, 1, "reflect", act=jax.nn.sigmoid)
            for level in self.scale_levels
        }
        return blocks, heads

    def init(self, key):
        blocks, heads = self._blocks()
        n_used = max(self.scale_levels)
        keys = jax.random.split(key, n_used + len(heads))
        params = {}
        for i in range(n_used):
            params[f"block{i + 1}"] = blocks[i].init(keys[i])[0]
        for j, (level, head) in enumerate(heads.items()):
            params[f"head{level}"] = head.init(keys[n_used + j])[0]
        return params, {}

    def __call__(self, params, stats, features: Sequence[Array], train: bool = False):
        """features: 5 encoder stages fine→coarse. Returns list of disparity
        maps (N,h,w,1), one per scale level, coarse→fine."""
        blocks, heads = self._blocks()
        x = features[-1]
        skips = list(features[:-1])[::-1]  # coarse→fine, 4 of them
        disparities = []
        for i in range(max(self.scale_levels)):
            skip = skips[i] if i < len(skips) else None
            x, _ = blocks[i](params[f"block{i + 1}"], {}, x, skip=skip, train=train)
            level = i + 1
            if level in heads:
                d, _ = heads[level](params[f"head{level}"], {}, x)
                disparities.append(d)
        return disparities, stats
