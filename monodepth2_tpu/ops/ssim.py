"""SSIM-as-distance (reference: src/utils.jl:13-39).

Reflect-pad 1 + 3×3 stride-1 mean pooling for local moments, c1=0.01²,
c2=0.03²; output is clamp((1-ssim)/2, 0, 1): 0 for identical images, symmetric.
Stateless free function (the reference wraps a MeanPool layer in a struct; on
TPU XLA fuses the reduce_windows so there is nothing to cache).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.core import mean_pool, reflect_pad

Array = jax.Array


def ssim(x: Array, y: Array, c1: float = 0.01**2, c2: float = 0.03**2) -> Array:
    """Per-pixel SSIM distance of NHWC images; same shape out as in.

    The more similar x and y, the lower the value (0 = identical).
    """
    dtype = x.dtype
    xp = reflect_pad(x, 1)
    yp = reflect_pad(y, 1)
    mu_x = mean_pool(xp)
    mu_y = mean_pool(yp)

    sigma_x = mean_pool(xp * xp) - mu_x * mu_x
    sigma_y = mean_pool(yp * yp) - mu_y * mu_y
    sigma_xy = mean_pool(xp * yp) - mu_x * mu_y

    c1 = jnp.asarray(c1, dtype)
    c2 = jnp.asarray(c2, dtype)
    ssim_n = (2.0 * mu_x * mu_y + c1) * (2.0 * sigma_xy + c2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)
