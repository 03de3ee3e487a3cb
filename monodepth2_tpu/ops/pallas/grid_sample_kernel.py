"""Fused bilinear grid-sample as a Pallas TPU kernel (one-hot MXU formulation).

Why this shape: XLA:TPU lowers arbitrary gathers to a scalar loop (~2500× off
roofline for our warp), and Mosaic's tpu.dynamic_gather cannot cross vregs, so
per-element gathering is structurally slow on this hardware. Bilinear sampling
is instead expressed as two interpolation contractions

    out[p] = Σ_h Wy[h,p] · (Σ_w img[h,w] · Wx[w,p])

with Wx/Wy one-hot-pair matrices carrying the bilinear weights. The XLA
version of this (ops/grid_sample.py) materializes Wx/Wy chunks through HBM;
this kernel builds them **in VMEM with broadcasted-iota compares** so the only
HBM traffic is img + uv + out — the roofline the one-hot trick pays for with
cheap MXU FLOPs.

Forward and backward are both Pallas kernels under jax.custom_vjp:
  d_img  = (Wy ⊙ g) @ Wxᵀ                      (same contraction, transposed)
  d_u    = g ⊙ Σ_h Wy ⊙ (img @ (O1x − O0x))    (weight-derivative one-hots)
  d_v    = g ⊙ Σ_h (O1y − O0y) ⊙ (img @ Wx)
with border-clamp zeroing d_u/d_v outside the image, matching the gather
path's VJP exactly.

Layout: image (N,H,W) single-channel per call (C folded into N by the
wrapper), output points chunked to Q=512 per grid step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

Q = 2048  # output points per grid step (swept: 2048 best on v5e)
# precise (fp32/HIGHEST) keeps every kernel buffer at 4 bytes — Q=2048 blows
# the 16MB scoped-VMEM stack in the bwd kernel at training shapes (W=416), so
# the fp32 path halves the chunk
Q_PRECISE = 1024


def _coords(image_hw, uv):
    """Normalized uv (N,P,2) -> clamped indices/weights, all (N,P)."""
    h, w = image_hw
    u = (uv[..., 0] + 1.0) * 0.5 * (w - 1)
    v = (uv[..., 1] + 1.0) * 0.5 * (h - 1)
    inside_u = (u >= 0.0) & (u <= w - 1)
    inside_v = (v >= 0.0) & (v <= h - 1)
    u = jnp.clip(u, 0.0, w - 1)
    v = jnp.clip(v, 0.0, h - 1)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    wx = (u - x0).astype(jnp.float32)
    wy = (v - y0).astype(jnp.float32)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    return x0i, y0i, wx, wy, inside_u, inside_v


def _onehot_pair(idx_row, weight_row, size, limit, q):
    """(1,q) int idx + weight -> (size, q) matrix
    M[k, p] = (k==idx_p)·(1−w_p) + (k==idx_p+1 clamped)·w_p."""
    ki = jax.lax.broadcasted_iota(jnp.int32, (size, q), 0)
    i0 = idx_row  # (1, Q)
    i1 = jnp.minimum(i0 + 1, limit - 1)
    w = weight_row
    return jnp.where(ki == i0, 1.0 - w, 0.0) + jnp.where(ki == i1, w, 0.0)


def _fwd_kernel(img_ref, x0_ref, y0_ref, wx_ref, wy_ref, out_ref, *, H, W, precise, q):
    img = img_ref[0]  # (H, W)
    Wx = _onehot_pair(x0_ref[0, 0], wx_ref[0, 0], W, W, q)  # (W, q)
    Wy = _onehot_pair(y0_ref[0, 0], wy_ref[0, 0], H, H, q)  # (H, q)
    if precise:
        pm = jax.lax.dot_general(
            img, Wx, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        pm = jax.lax.dot_general(
            img.astype(jnp.bfloat16), Wx.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = jnp.sum(pm * Wy, axis=0, keepdims=True)  # (1, Q)


def _bwd_kernel(
    img_ref, x0_ref, y0_ref, wx_ref, wy_ref, iu_ref, iv_ref, g_ref,
    dimg_ref, du_ref, dv_ref, *, H, W, precise, q,
):
    img = img_ref[0]
    g = g_ref[0, 0]  # (1, q)
    Wx = _onehot_pair(x0_ref[0, 0], wx_ref[0, 0], W, W, q)  # (W, q)
    Wy = _onehot_pair(y0_ref[0, 0], wy_ref[0, 0], H, H, q)  # (H, q)

    def dot(a, b, dims):
        if precise:
            return jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )

    # d_img accumulation: (Wy ⊙ g) @ Wxᵀ  -> (H, W); grid revisits accumulate
    wyg = Wy * g  # (H, Q)
    contrib = dot(wyg, Wx, (((1,), (1,)), ((), ())))  # (H, W)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[:] = jnp.zeros_like(dimg_ref)

    dimg_ref[:] += contrib[None]

    # weight-derivative one-hots: dM/dw = O1 − O0
    ki_w = jax.lax.broadcasted_iota(jnp.int32, (W, q), 0)
    x0 = x0_ref[0, 0]
    x1 = jnp.minimum(x0 + 1, W - 1)
    Dx = jnp.where(ki_w == x1, 1.0, 0.0) - jnp.where(ki_w == x0, 1.0, 0.0)
    ki_h = jax.lax.broadcasted_iota(jnp.int32, (H, q), 0)
    y0 = y0_ref[0, 0]
    y1 = jnp.minimum(y0 + 1, H - 1)
    Dy = jnp.where(ki_h == y1, 1.0, 0.0) - jnp.where(ki_h == y0, 1.0, 0.0)

    pdx = dot(img, Dx, (((1,), (0,)), ((), ())))  # (H, Q): img @ (O1x−O0x)
    pm = dot(img, Wx, (((1,), (0,)), ((), ())))  # (H, Q): img @ Wx

    dwx = jnp.sum(Wy * pdx, axis=0, keepdims=True) * g  # (1, Q)
    dwy = jnp.sum(Dy * pm, axis=0, keepdims=True) * g

    # border clamp: no coordinate gradient outside the image
    du_ref[0, 0] = jnp.where(iu_ref[0, 0] != 0, dwx, 0.0)
    dv_ref[0, 0] = jnp.where(iv_ref[0, 0] != 0, dwy, 0.0)


def _pad_points(arrs, P, q):
    Ppad = ((P + q - 1) // q) * q
    if Ppad == P:
        return arrs, P
    return [jnp.pad(a, ((0, 0), (0, Ppad - P))) for a in arrs], P


def _row4(a, q):
    """(N, P) -> (N, P//q, 1, q): Mosaic requires the last two block dims to
    be tile-aligned or equal to the array dims; (1, q) trailing dims satisfy
    the 'equal' branch."""
    N, P = a.shape
    return a.reshape(N, P // q, 1, q)


def _fwd_call(img, x0i, y0i, wx, wy, *, precise, interpret, q):
    N, H, W = img.shape
    P = x0i.shape[1]
    nq = P // q
    kernel = functools.partial(_fwd_kernel, H=H, W=W, precise=precise, q=q)
    row_spec = pl.BlockSpec(
        (1, 1, 1, q), lambda n, j: (n, j, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(N, nq),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda n, j: (n, 0, 0), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((N, nq, 1, q), jnp.float32),
        interpret=interpret,
    )(img, _row4(x0i, q), _row4(y0i, q), _row4(wx, q), _row4(wy, q))
    return out.reshape(N, P)


def _bwd_call(img, x0i, y0i, wx, wy, iu, iv, g, *, precise, interpret, q):
    N, H, W = img.shape
    P = x0i.shape[1]
    nq = P // q
    kernel = functools.partial(_bwd_kernel, H=H, W=W, precise=precise, q=q)
    row_spec = pl.BlockSpec(
        (1, 1, 1, q), lambda n, j: (n, j, 0, 0), memory_space=pltpu.VMEM
    )
    img_spec = pl.BlockSpec((1, H, W), lambda n, j: (n, 0, 0), memory_space=pltpu.VMEM)
    dimg, du, dv = pl.pallas_call(
        kernel,
        grid=(N, nq),
        in_specs=[img_spec] + [row_spec] * 7,
        out_specs=(
            pl.BlockSpec((1, H, W), lambda n, j: (n, 0, 0), memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, H, W), jnp.float32),
            jax.ShapeDtypeStruct((N, nq, 1, q), jnp.float32),
            jax.ShapeDtypeStruct((N, nq, 1, q), jnp.float32),
        ),
        interpret=interpret,
    )(img, _row4(x0i, q), _row4(y0i, q), _row4(wx, q), _row4(wy, q),
      _row4(iu, q), _row4(iv, q), _row4(g, q))
    return dimg, du.reshape(N, P), dv.reshape(N, P)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sample(img, uv, precise, interpret):
    return _sample_fwd(img, uv, precise, interpret)[0]


def _sample_fwd(img, uv, precise, interpret):
    N, H, W = img.shape
    P = uv.shape[1]
    q = Q_PRECISE if precise else Q
    x0i, y0i, wx, wy, iu, iv = _coords((H, W), uv)
    arrs, _ = _pad_points([x0i, y0i, wx, wy], P, q)
    x0p, y0p, wxp, wyp = arrs
    out = _fwd_call(img, x0p, y0p, wxp, wyp, precise=precise, interpret=interpret, q=q)
    out = out[:, :P]
    residuals = (img, x0p, y0p, wxp, wyp, iu, iv, uv.shape)
    return out, residuals


def _sample_bwd(precise, interpret, residuals, g):
    img, x0p, y0p, wxp, wyp, iu, iv, uv_shape = residuals
    N, H, W = img.shape
    P = uv_shape[1]
    q = Q_PRECISE if precise else Q
    Ppad = x0p.shape[1]
    gp = jnp.pad(g, ((0, 0), (0, Ppad - P)))
    iup = jnp.pad(iu.astype(jnp.int32), ((0, 0), (0, Ppad - P)))
    ivp = jnp.pad(iv.astype(jnp.int32), ((0, 0), (0, Ppad - P)))
    dimg, du, dv = _bwd_call(
        img, x0p, y0p, wxp, wyp, iup, ivp, gp, precise=precise, interpret=interpret, q=q
    )
    du = du[:, :P] * ((W - 1) * 0.5)
    dv = dv[:, :P] * ((H - 1) * 0.5)
    duv = jnp.stack([du, dv], axis=-1)
    return dimg, duv


_sample.defvjp(_sample_fwd, _sample_bwd)


def grid_sample_pallas(
    image: Array,
    uv: Array,
    precise: bool = False,
    interpret: Optional[bool] = None,
) -> Array:
    """Drop-in for ops.grid_sample: NHWC image, uv (N,P,2) in (-1,1) -> (N,P,C).

    precise=True keeps the MXU contractions in fp32 (HIGHEST); default bf16.
    interpret defaults to True off-TPU so tests run on CPU.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n, h, w, c = image.shape
    dtype = image.dtype
    # fold channels into the batch: kernel is single-channel
    img_nc = jnp.moveaxis(image, -1, 1).reshape(n * c, h, w).astype(jnp.float32)
    uv_nc = jnp.repeat(uv, c, axis=0) if c > 1 else uv
    out = _sample(img_nc, uv_nc.astype(jnp.float32), precise, interpret)
    out = out.reshape(n, c, -1).transpose(0, 2, 1)  # (N,P,C)
    return out.astype(dtype)
