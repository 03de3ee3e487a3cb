"""Model layer: ResNet-18 stage encoder + U-Net depth decoder + pose decoder.

Reference: external ResNet.jl (used at src/Monodepth.jl:117-118 via
`ResidualNetwork(18; in_channels, classes=nothing)` with stage outputs),
src/depth_decoder.jl, src/pose_decoder.jl, src/model.jl.
"""

from .resnet import ResNetEncoder
from .depth_decoder import DepthDecoder
from .pose_decoder import PoseDecoder
from .model import Model

__all__ = ["ResNetEncoder", "DepthDecoder", "PoseDecoder", "Model"]
