"""Core functional layers.

Conventions (TPU-first, not the reference's Julia WHCN):
  * images are NHWC (batch, height, width, channel) — XLA's preferred TPU layout
  * conv weights are HWIO
  * params/state are nested dicts (pytrees); layers are stateless describers

Every layer object has
    init(key) -> (params, stats)
    __call__(params, stats, x, train=False) -> (y, new_stats)
`stats` holds non-learned running statistics (BatchNorm); layers without state
use empty dicts so composition is uniform.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array
PyTree = dict


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def reflect_pad(x: Array, pad: int) -> Array:
    """Reflect-pad H and W of an NHWC tensor (reference: Flux.pad_reflect,
    used by src/depth_decoder.jl:5 and the SSIM window src/utils.jl:27-28)."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class Module:
    """Marker base class for layer describers."""

    def init(self, key: Array):
        raise NotImplementedError

    def __call__(self, params, stats, x, train: bool = False):
        raise NotImplementedError


@dataclass(frozen=True)
class Conv(Module):
    """2-D convolution, NHWC/HWIO.

    padding:
      int p            -> zero pad p on each side of H and W
      "reflect"        -> reflect-pad (kernel-1)//2 then VALID conv
                          (the reference's pad_reflect+Conv DecoderBlock,
                          src/depth_decoder.jl:1-5)
      "same"/"valid"   -> XLA named padding
    """

    in_ch: int
    out_ch: int
    kernel: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, str] = 0
    use_bias: bool = True
    act: Optional[Callable[[Array], Array]] = None

    def init(self, key: Array):
        kh, kw = _pair(self.kernel)
        fan_in = kh * kw * self.in_ch
        fan_out = kh * kw * self.out_ch
        # Glorot uniform (Flux's default Conv init)
        limit = math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(
            key, (kh, kw, self.in_ch, self.out_ch), jnp.float32, -limit, limit
        )
        params = {"w": w}
        if self.use_bias:
            params["b"] = jnp.zeros((self.out_ch,), jnp.float32)
        return params, {}

    def __call__(self, params, stats, x, train: bool = False):
        kh, kw = _pair(self.kernel)
        sh, sw = _pair(self.stride)
        pad = self.padding
        if pad == "reflect":
            x = reflect_pad(x, (kh - 1) // 2)
            padding = "VALID"
        elif isinstance(pad, str):
            padding = pad.upper()
        else:
            p_h, p_w = _pair(pad)
            padding = ((p_h, p_h), (p_w, p_w))
        y = lax.conv_general_dilated(
            x,
            params["w"].astype(x.dtype),
            window_strides=(sh, sw),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + params["b"].astype(y.dtype)
        if self.act is not None:
            y = self.act(y)
        return y, stats


@dataclass(frozen=True)
class BatchNorm(Module):
    """Batch normalization over N,H,W with running statistics.

    Matches Flux.BatchNorm semantics used by the reference's external ResNet.jl
    encoder: eps 1e-5, momentum 0.1, `trainmode!`/`testmode!` become the
    `train` flag; running stats live in the `stats` pytree.
    """

    ch: int
    eps: float = 1e-5
    momentum: float = 0.1
    act: Optional[Callable[[Array], Array]] = None

    def init(self, key: Array):
        params = {
            "scale": jnp.ones((self.ch,), jnp.float32),
            "bias": jnp.zeros((self.ch,), jnp.float32),
        }
        stats = {
            "mean": jnp.zeros((self.ch,), jnp.float32),
            "var": jnp.ones((self.ch,), jnp.float32),
        }
        return params, stats

    def __call__(self, params, stats, x, train: bool = False):
        if train:
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))
            m = self.momentum
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            new_stats = {
                "mean": (1 - m) * stats["mean"] + m * mean.astype(jnp.float32),
                "var": (1 - m) * stats["var"] + m * unbiased.astype(jnp.float32),
            }
        else:
            mean, var = stats["mean"], stats["var"]
            new_stats = stats
        inv = lax.rsqrt(var.astype(x.dtype) + jnp.asarray(self.eps, x.dtype))
        y = (x - mean.astype(x.dtype)) * inv * params["scale"].astype(
            x.dtype
        ) + params["bias"].astype(x.dtype)
        if self.act is not None:
            y = self.act(y)
        return y, new_stats


@dataclass(frozen=True)
class Sequential(Module):
    """Compose layers; params/stats are dicts keyed "0", "1", ..."""

    layers: Sequence[Module] = field(default_factory=tuple)

    def init(self, key: Array):
        params, stats = {}, {}
        keys = jax.random.split(key, max(len(self.layers), 1))
        for i, layer in enumerate(self.layers):
            p, s = layer.init(keys[i])
            params[str(i)] = p
            stats[str(i)] = s
        return params, stats

    def __call__(self, params, stats, x, train: bool = False):
        new_stats = {}
        for i, layer in enumerate(self.layers):
            x, s = layer(params[str(i)], stats[str(i)], x, train=train)
            new_stats[str(i)] = s
        return x, new_stats


def max_pool(x: Array, window: int = 2, stride: int = 2, padding="VALID") -> Array:
    """Max pool over H,W of NHWC."""
    if isinstance(padding, int):
        padding = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )


def mean_pool(x: Array, window: int = 3, stride: int = 1, padding="VALID") -> Array:
    """Mean pool over H,W of NHWC (reference: Flux.MeanPool((3,3); stride=1)
    inside SSIM, src/utils.jl:19)."""
    # literal 0 init keeps this on the reduce-window-sum path, which has a
    # reverse-mode rule (an array init makes it the generic, non-differentiable
    # reduce_window)
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )
    return summed / jnp.asarray(window * window, x.dtype)


def upsample_bilinear(
    x: Array, scale: Optional[int] = None, size: Optional[Tuple[int, int]] = None
) -> Array:
    """Bilinear upsample NHWC with align_corners=True.

    Matches NNlib.upsample_bilinear which the reference uses both in the depth
    decoder (src/depth_decoder.jl:18-19) and for per-scale disparity upsampling
    (src/training.jl:44-46); NNlib's version aligns corners.
    """
    n, h, w, c = x.shape
    if size is None:
        size = (h * scale, w * scale)
    nh, nw = size
    if (nh, nw) == (h, w):
        return x

    def axis_coords(new, old):
        if new == 1 or old == 1:
            return jnp.zeros((new,), x.dtype)
        return jnp.arange(new, dtype=x.dtype) * ((old - 1) / (new - 1))

    ys = axis_coords(nh, h)
    xs = axis_coords(nw, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(x.dtype))[None, :, None, None]
    wx = (xs - x0.astype(x.dtype))[None, None, :, None]

    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def cast_tree(tree, dtype):
    """Cast every leaf of a pytree (params/stats/inputs) to `dtype`.

    The single definition of the mixed-precision cast used by training
    (training/loss.py), live inference (eval.make_infer_fn), and serving
    export (serving.make_inference_fn) — one recipe, three consumers, so a
    precision-policy change cannot silently diverge them.
    """
    import jax

    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)
