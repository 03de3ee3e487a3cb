"""ResNet-18/34 encoder with multi-scale stage outputs.

Rebuilds the capability the reference takes from the external ResNet.jl
package (`ResidualNetwork(18; in_channels, classes=nothing)` +
`encoder(x, Val(:stages))`, used at src/Monodepth.jl:117 and src/model.jl:12-14):
a classification-free backbone returning the 5 feature maps at strides
2/4/8/16/32 that the depth decoder consumes as skips.

TPU notes: NHWC layout, all convs lower to MXU matmuls; BatchNorm is fused by
XLA into neighboring convs at inference. `in_channels` is configurable
(grayscale=1 for the KITTI config, reference src/Monodepth.jl:82-83).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import BatchNorm, Conv, Module, max_pool

Array = jax.Array

STAGE_CHANNELS = {
    18: (64, 64, 128, 256, 512),
    34: (64, 64, 128, 256, 512),
    50: (64, 256, 512, 1024, 2048),
}
STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
}


@dataclass(frozen=True)
class BasicBlock(Module):
    """conv3x3-BN-ReLU → conv3x3-BN, residual add, ReLU."""

    in_ch: int
    out_ch: int
    stride: int = 1

    @property
    def has_projection(self) -> bool:
        return self.stride != 1 or self.in_ch != self.out_ch

    def _parts(self):
        conv1 = Conv(self.in_ch, self.out_ch, 3, self.stride, 1, use_bias=False)
        bn1 = BatchNorm(self.out_ch)
        conv2 = Conv(self.out_ch, self.out_ch, 3, 1, 1, use_bias=False)
        bn2 = BatchNorm(self.out_ch)
        parts = {"conv1": conv1, "bn1": bn1, "conv2": conv2, "bn2": bn2}
        if self.has_projection:
            parts["proj"] = Conv(self.in_ch, self.out_ch, 1, self.stride, 0, use_bias=False)
            parts["proj_bn"] = BatchNorm(self.out_ch)
        return parts

    def init(self, key):
        params, stats = {}, {}
        parts = self._parts()
        keys = jax.random.split(key, len(parts))
        for k, (name, layer) in zip(keys, parts.items()):
            p, s = layer.init(k)
            params[name], stats[name] = p, s
        return params, stats

    def __call__(self, params, stats, x, train: bool = False):
        parts = self._parts()
        new_stats = dict(stats)
        y, _ = parts["conv1"](params["conv1"], {}, x)
        y, new_stats["bn1"] = parts["bn1"](params["bn1"], stats["bn1"], y, train=train)
        y = jax.nn.relu(y)
        y, _ = parts["conv2"](params["conv2"], {}, y)
        y, new_stats["bn2"] = parts["bn2"](params["bn2"], stats["bn2"], y, train=train)
        if self.has_projection:
            sc, _ = parts["proj"](params["proj"], {}, x)
            sc, new_stats["proj_bn"] = parts["proj_bn"](
                params["proj_bn"], stats["proj_bn"], sc, train=train
            )
        else:
            sc = x
        return jax.nn.relu(y + sc), new_stats


@dataclass(frozen=True)
class Bottleneck(Module):
    """1×1 reduce → 3×3 (strided) → 1×1 expand ×4, residual add, ReLU."""

    in_ch: int
    out_ch: int  # expanded (×4) output channels
    stride: int = 1

    @property
    def has_projection(self) -> bool:
        return self.stride != 1 or self.in_ch != self.out_ch

    def _parts(self):
        mid = self.out_ch // 4
        parts = {
            "conv1": Conv(self.in_ch, mid, 1, 1, 0, use_bias=False),
            "bn1": BatchNorm(mid),
            "conv2": Conv(mid, mid, 3, self.stride, 1, use_bias=False),
            "bn2": BatchNorm(mid),
            "conv3": Conv(mid, self.out_ch, 1, 1, 0, use_bias=False),
            "bn3": BatchNorm(self.out_ch),
        }
        if self.has_projection:
            parts["proj"] = Conv(self.in_ch, self.out_ch, 1, self.stride, 0, use_bias=False)
            parts["proj_bn"] = BatchNorm(self.out_ch)
        return parts

    def init(self, key):
        params, stats = {}, {}
        parts = self._parts()
        keys = jax.random.split(key, len(parts))
        for k, (name, layer) in zip(keys, parts.items()):
            p, s = layer.init(k)
            params[name], stats[name] = p, s
        return params, stats

    def __call__(self, params, stats, x, train: bool = False):
        parts = self._parts()
        new_stats = dict(stats)
        y, _ = parts["conv1"](params["conv1"], {}, x)
        y, new_stats["bn1"] = parts["bn1"](params["bn1"], stats["bn1"], y, train=train)
        y = jax.nn.relu(y)
        y, _ = parts["conv2"](params["conv2"], {}, y)
        y, new_stats["bn2"] = parts["bn2"](params["bn2"], stats["bn2"], y, train=train)
        y = jax.nn.relu(y)
        y, _ = parts["conv3"](params["conv3"], {}, y)
        y, new_stats["bn3"] = parts["bn3"](params["bn3"], stats["bn3"], y, train=train)
        if self.has_projection:
            sc, _ = parts["proj"](params["proj"], {}, x)
            sc, new_stats["proj_bn"] = parts["proj_bn"](
                params["proj_bn"], stats["proj_bn"], sc, train=train
            )
        else:
            sc = x
        return jax.nn.relu(y + sc), new_stats


@dataclass(frozen=True)
class ResNetEncoder(Module):
    """ResNet backbone; __call__ returns the 5 stage outputs, coarse last.

    stages property mirrors ResNet.jl's `encoder.stages` (per-stage channel
    counts, consumed by the decoders at src/Monodepth.jl:118-122).
    """

    depth: int = 18
    in_channels: int = 1

    @property
    def stages(self) -> Tuple[int, ...]:
        return STAGE_CHANNELS[self.depth]

    def _blocks(self):
        blocks = []
        chans = STAGE_CHANNELS[self.depth]
        counts = STAGE_BLOCKS[self.depth]
        block_cls = Bottleneck if self.depth >= 50 else BasicBlock
        in_ch = chans[0]
        for stage_i, (out_ch, n) in enumerate(zip(chans[1:], counts)):
            stride = 1 if stage_i == 0 else 2
            stage = []
            for b in range(n):
                stage.append(block_cls(in_ch, out_ch, stride if b == 0 else 1))
                in_ch = out_ch
            blocks.append(stage)
        return blocks

    def init(self, key):
        k_stem, *k_stages = jax.random.split(key, 5 + 1)
        stem_conv = Conv(self.in_channels, 64, 7, 2, 3, use_bias=False)
        stem_bn = BatchNorm(64)
        kc, kb = jax.random.split(k_stem)
        params = {"stem_conv": stem_conv.init(kc)[0]}
        stats = {"stem_bn": stem_bn.init(kb)[1]}
        params["stem_bn"] = stem_bn.init(kb)[0]
        stats["stem_conv"] = {}
        for si, stage in enumerate(self._blocks()):
            keys = jax.random.split(k_stages[si], len(stage))
            for bi, block in enumerate(stage):
                name = f"layer{si + 1}_{bi}"
                p, s = block.init(keys[bi])
                params[name], stats[name] = p, s
        return params, stats

    def __call__(self, params, stats, x, train: bool = False):
        """x (N,H,W,C) -> tuple of 5 features at strides 2,4,8,16,32."""
        new_stats = dict(stats)
        stem_conv = Conv(self.in_channels, 64, 7, 2, 3, use_bias=False)
        stem_bn = BatchNorm(64)
        y, _ = stem_conv(params["stem_conv"], {}, x)
        y, new_stats["stem_bn"] = stem_bn(params["stem_bn"], stats["stem_bn"], y, train=train)
        y = jax.nn.relu(y)
        features = [y]  # stride 2
        y = max_pool(y, window=3, stride=2, padding=1)
        for si, stage in enumerate(self._blocks()):
            for bi, block in enumerate(stage):
                name = f"layer{si + 1}_{bi}"
                y, new_stats[name] = block(params[name], stats[name], y, train=train)
            features.append(y)  # strides 4, 8, 16, 32
        return tuple(features), new_stats
