"""Functional neural-network layer library (the framework's Flux replacement).

Pure-functional: every layer is a lightweight Python object describing shapes;
parameters and batch statistics live in plain pytrees (nested dicts), so
everything composes with jax.jit / jax.grad / jax.sharding with no framework
magic. Covers the layer surface the reference uses via Flux/NNlib
(reference: src/depth_decoder.jl, src/pose_decoder.jl and the external
ResNet.jl): Conv (incl. reflect padding), BatchNorm, MaxPool/MeanPool,
bilinear upsampling, activations, Sequential composition.
"""

from .core import (
    Module,
    Conv,
    BatchNorm,
    Sequential,
    max_pool,
    mean_pool,
    upsample_bilinear,
    cast_tree,
    reflect_pad,
)

__all__ = [
    "Module",
    "Conv",
    "BatchNorm",
    "Sequential",
    "max_pool",
    "mean_pool",
    "upsample_bilinear",
    "cast_tree",
    "reflect_pad",
]
