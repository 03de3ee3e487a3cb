"""Bilinear grid sampling with border padding (XLA reference path).

Semantics match NNlib.grid_sample(...; padding_mode=:border) as used by the
reference warp (src/training.jl:52-57, identity-warp test test/runtests.jl:94-122):
align-corners normalized coords — u=-1 is the center of the first column,
u=+1 the center of the last — and out-of-range samples clamp to the border,
which also zeroes the coordinate gradient outside (the bilinear weights are
computed from the clamped coordinate).

Implementation: unnormalize, clamp, and do 4 flat gathers with
take_along_axis — XLA lowers these to TPU gathers and the VJP to scatter-adds.
A fused Pallas kernel for the full depth→backproject→project→sample chain
lives in ops/pallas/.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_sample(image: Array, uv: Array) -> Array:
    """Sample NHWC `image` at normalized coords `uv` (N,P,2) in (-1,1).

    Returns (N,P,C). uv[..., 0] is x (width axis), uv[..., 1] is y.
    """
    n, h, w, c = image.shape
    dtype = image.dtype

    u = (uv[..., 0] + 1.0) * 0.5 * (w - 1)  # (N,P)
    v = (uv[..., 1] + 1.0) * 0.5 * (h - 1)
    # border padding: clamp the *coordinate*, so weights saturate too
    u = jnp.clip(u, 0.0, w - 1)
    v = jnp.clip(v, 0.0, h - 1)

    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    wx = (u - x0).astype(dtype)[..., None]
    wy = (v - y0).astype(dtype)[..., None]

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    flat = image.reshape(n, h * w, c)

    def gather(yi, xi):
        idx = (yi * w + xi)[..., None]  # (N,P,1)
        return jnp.take_along_axis(flat, idx, axis=1)  # (N,P,C)

    p00 = gather(y0i, x0i)
    p01 = gather(y0i, x1i)
    p10 = gather(y1i, x0i)
    p11 = gather(y1i, x1i)

    top = p00 * (1.0 - wx) + p01 * wx
    bot = p10 * (1.0 - wx) + p11 * wx
    return top * (1.0 - wy) + bot * wy


def grid_sample_nhwc(image: Array, uv_grid: Array) -> Array:
    """Convenience wrapper: uv_grid (N,H',W',2) -> sampled (N,H',W',C)."""
    n, gh, gw, _ = uv_grid.shape
    out = grid_sample(image, uv_grid.reshape(n, gh * gw, 2))
    return out.reshape(n, gh, gw, image.shape[-1])
