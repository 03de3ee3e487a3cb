"""Bilinear grid sampling with border padding.

Semantics match NNlib.grid_sample(...; padding_mode=:border) as used by the
reference warp (src/training.jl:52-57, identity-warp test test/runtests.jl:94-122):
align-corners normalized coords — u=-1 is the center of the first column,
u=+1 the center of the last — and out-of-range samples clamp to the border,
which also zeroes the coordinate gradient outside (the bilinear weights are
computed from the clamped coordinate).

Two implementations, dispatched by platform:

* "gather" — 4 flat take_along_axis gathers. Exact, and fast on CPU, but
  XLA:TPU lowers arbitrary gathers to a scalar loop (~11 ms for a
  (4,53248)-point sample on v5e — measured, ~2500× off the HBM roofline,
  and the dominant cost of the reference-style training step).
* "onehot" — the TPU-native design: bilinear sampling is two interpolation
  CONTRACTIONS, out = Wy^T (img Wx), with Wx/Wy one-hot-pair matrices built
  from iota comparisons. Runs on the MXU as matmuls — no gather at all —
  ~4.7× faster than the gather path on v5e even counting one-hot
  materialization traffic. (Mosaic's tpu.dynamic_gather can't cross vregs,
  so a gather-style Pallas kernel loses to the MXU here; the Pallas kernel
  in ops/pallas/ builds the same one-hot tiles in VMEM to skip the HBM
  traffic entirely.)

On TPU the matmuls use the default (bf16) MXU precision — sampling error
~2e-3 on [0,1] images, the normal mixed-precision training regime. Pass
method="gather" where exactness matters (tests/parity runs on CPU do this
implicitly via platform dispatch).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _unnormalize(image: Array, uv: Array):
    """Shared coordinate math: normalized (-1,1) -> indices + weights."""
    n, h, w, c = image.shape
    dtype = image.dtype
    u = (uv[..., 0] + 1.0) * 0.5 * (w - 1)  # (N,P)
    v = (uv[..., 1] + 1.0) * 0.5 * (h - 1)
    # border padding: clamp the *coordinate*, so weights saturate too
    u = jnp.clip(u, 0.0, w - 1)
    v = jnp.clip(v, 0.0, h - 1)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    wx = (u - x0).astype(dtype)
    wy = (v - y0).astype(dtype)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    return x0i, x1i, y0i, y1i, wx, wy


def _grid_sample_gather(image: Array, uv: Array) -> Array:
    n, h, w, c = image.shape
    x0i, x1i, y0i, y1i, wx, wy = _unnormalize(image, uv)
    wx = wx[..., None]
    wy = wy[..., None]
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


def _chunk_size(P: int, target: int = 8192) -> int:
    """Largest divisor of P not exceeding `target` (trace-time only)."""
    for q in range(min(P, target), 0, -1):
        if P % q == 0:
            return q
    return 1


def _grid_sample_onehot(image: Array, uv: Array) -> Array:
    n, h, w, c = image.shape
    P = uv.shape[1]
    dtype = image.dtype
    x0i, x1i, y0i, y1i, wx, wy = _unnormalize(image, uv)

    q = _chunk_size(P)
    nch = P // q

    def chunked(a):
        return a.reshape(n, nch, q).transpose(1, 0, 2)  # (nch, N, q)

    idxs = tuple(chunked(a) for a in (x0i, x1i, y0i, y1i, wx, wy))
    xi = jnp.arange(w, dtype=jnp.int32)[None, :, None]  # (1, w, 1)
    yi = jnp.arange(h, dtype=jnp.int32)[None, :, None]  # (1, h, 1)

    def chunk_body(carry, idx):
        x0b, x1b, y0b, y1b, wxb, wyb = idx  # each (N, q)
        wxe = wxb[:, None, :]
        wye = wyb[:, None, :]
        # Wx (N, w, q): one-hot pair with bilinear x-weights baked in
        Wx = jnp.where(xi == x0b[:, None, :], 1.0 - wxe, 0.0) + jnp.where(
            xi == x1b[:, None, :], wxe, 0.0
        )
        # x-interpolation: (N,h,w,c) x (N,w,q) -> (N,h,q,c) on the MXU
        Pm = jnp.einsum(
            "nhxc,nxq->nhqc", image, Wx.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        # y-contraction: (N,h,q) one-hot pair, reduce over h
        Wy = jnp.where(yi == y0b[:, None, :], 1.0 - wye, 0.0) + jnp.where(
            yi == y1b[:, None, :], wye, 0.0
        )
        out = jnp.einsum("nhqc,nhq->nqc", Pm, Wy.astype(Pm.dtype))
        return carry, out.astype(dtype)

    _, outs = jax.lax.scan(chunk_body, 0.0, idxs)  # (nch, N, q, c)
    return outs.transpose(1, 0, 2, 3).reshape(n, P, c)


def grid_sample(image: Array, uv: Array, method: Optional[str] = None) -> Array:
    """Sample NHWC `image` at normalized coords `uv` (N,P,2) in (-1,1).

    Returns (N,P,C). uv[..., 0] is x (width axis), uv[..., 1] is y.
    method: None (auto: Pallas kernel on TPU, gathers on CPU),
    "gather", "onehot", or "pallas" (fused VMEM kernel, ops/pallas/).
    """
    if method is None:
        platform = jax.devices()[0].platform
        method = "gather" if platform == "cpu" else "pallas"
    if method == "gather":
        return _grid_sample_gather(image, uv)
    if method == "onehot":
        return _grid_sample_onehot(image, uv)
    if method == "pallas":
        from .pallas import grid_sample_pallas

        return grid_sample_pallas(image, uv)
    raise ValueError(f"unknown grid_sample method {method!r}")


def grid_sample_nhwc(image: Array, uv_grid: Array) -> Array:
    """Convenience wrapper: uv_grid (N,H',W',2) -> sampled (N,H',W',C)."""
    n, gh, gw, _ = uv_grid.shape
    out = grid_sample(image, uv_grid.reshape(n, gh * gw, 2))
    return out.reshape(n, gh, gw, image.shape[-1])
