"""Fused bilinear grid-sample as a Pallas TPU kernel (one-hot MXU formulation).

Why this shape: XLA:TPU lowers arbitrary gathers to a scalar loop (~2500× off
roofline for our warp), and Mosaic's tpu.dynamic_gather cannot cross vregs, so
per-element gathering is structurally slow on this hardware. Bilinear sampling
is instead expressed as two interpolation contractions

    out[p] = Σ_h Wy[h,p] · (Σ_w img[h,w] · Wx[w,p])

with Wx/Wy one-hot-pair matrices carrying the bilinear weights. The XLA
version of this (ops/grid_sample.py) materializes Wx/Wy chunks through HBM;
this kernel builds them **in VMEM with broadcasted-iota compares** so the only
HBM traffic is img + uv + out.

Forward and backward are Pallas kernels under jax.custom_vjp:
  d_img  = (Wy ⊙ g) @ Wxᵀ                      (same contraction, transposed)
  d_u    = g ⊙ Σ_h Wy ⊙ (img @ (O1x − O0x))    (weight-derivative one-hots)
  d_v    = g ⊙ Σ_h (O1y − O0y) ⊙ (img @ Wx)
with border-clamp zeroing d_u/d_v outside the image, matching the gather
path's VJP exactly. d_img runs in its OWN pallas_call so XLA dead-code
eliminates it when the image cotangent is unused — which is every training
step (source frames are data, not parameters).

Column-band optimization: the one-hot formulation pays H·W MACs per point.
When the call covers a full H×W output grid, points are reordered
column-major so each Q-chunk spans ~Q/H consecutive columns, and the x
contraction is restricted to a CBAND=128-column window (one MXU systolic
pass) selected per chunk from CSTRIDE=64-strided pre-materialized windows
(static slices — no gathers; scalar-prefetch block indexing picks the
window per grid step; Mosaic on this device supports neither dynamic VMEM
slicing nor value-level dynamic_slice, so windows are the only exact
banding mechanism available). W/CBAND ≈ 3.3× fewer MACs at the training
shape with full MXU utilization (M=H=128, K=CBAND=128). Exactness is
preserved: the wrapper checks every chunk's true source-column range and
`lax.cond` falls back to the full-W kernel if any chunk overflows its
window — banding is a pure speedup, never an approximation. Banding the y
dimension instead would shrink the matmul M-dim below the 128-row MXU and
win nothing.

Layout: image (N,H,W) single-channel per call (C folded into N by the
wrapper), output points chunked to Q per grid step.
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
CBAND = 128  # source-column window width = one MXU systolic (K) pass
CSTRIDE = 64  # window stride; windows overlap so any ≤65-column chunk fits


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
    i0 = idx_row  # (1, q)
    i1 = jnp.minimum(i0 + 1, limit - 1)
    w = weight_row
    return jnp.where(ki == i0, 1.0 - w, 0.0) + jnp.where(ki == i1, w, 0.0)


def _onehot_pair_rel(idx0_row, idx1_row, weight_row, size, q):
    """One-hot pair from precomputed (possibly equal, window-relative) index
    rows; indices outside [0, size) never match the iota and contribute 0."""
    ki = jax.lax.broadcasted_iota(jnp.int32, (size, q), 0)
    w = weight_row
    return jnp.where(ki == idx0_row, 1.0 - w, 0.0) + jnp.where(ki == idx1_row, w, 0.0)


def _dot(a, b, dims, precise):
    if precise:
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims,
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------- full kernels


def _fwd_kernel(img_ref, x0_ref, y0_ref, wx_ref, wy_ref, out_ref, *, H, W, precise, q):
    img = img_ref[0]  # (H, W)
    Wx = _onehot_pair(x0_ref[0, 0], wx_ref[0, 0], W, W, q)  # (W, q)
    Wy = _onehot_pair(y0_ref[0, 0], wy_ref[0, 0], H, H, q)  # (H, q)
    pm = _dot(img, Wx, (((1,), (0,)), ((), ())), precise)  # (H, q)
    out_ref[0, 0] = jnp.sum(pm * Wy, axis=0, keepdims=True)  # (1, q)


def _bwd_duv_kernel(
    img_ref, x0_ref, y0_ref, wx_ref, wy_ref, iu_ref, iv_ref, g_ref,
    du_ref, dv_ref, *, H, W, precise, q,
):
    img = img_ref[0]
    g = g_ref[0, 0]  # (1, q)
    Wx = _onehot_pair(x0_ref[0, 0], wx_ref[0, 0], W, W, q)  # (W, q)
    Wy = _onehot_pair(y0_ref[0, 0], wy_ref[0, 0], H, H, q)  # (H, q)

    # weight-derivative one-hots: dM/dw = O1 − O0
    ki_w = jax.lax.broadcasted_iota(jnp.int32, (W, q), 0)
    x0 = x0_ref[0, 0]
    x1 = jnp.minimum(x0 + 1, W - 1)
    Dx = jnp.where(ki_w == x1, 1.0, 0.0) - jnp.where(ki_w == x0, 1.0, 0.0)
    ki_h = jax.lax.broadcasted_iota(jnp.int32, (H, q), 0)
    y0 = y0_ref[0, 0]
    y1 = jnp.minimum(y0 + 1, H - 1)
    Dy = jnp.where(ki_h == y1, 1.0, 0.0) - jnp.where(ki_h == y0, 1.0, 0.0)

    pdx = _dot(img, Dx, (((1,), (0,)), ((), ())), precise)  # (H, q)
    pm = _dot(img, Wx, (((1,), (0,)), ((), ())), precise)  # (H, q)

    dwx = jnp.sum(Wy * pdx, axis=0, keepdims=True) * g  # (1, q)
    dwy = jnp.sum(Dy * pm, axis=0, keepdims=True) * g

    # border clamp: no coordinate gradient outside the image
    du_ref[0, 0] = jnp.where(iu_ref[0, 0] != 0, dwx, 0.0)
    dv_ref[0, 0] = jnp.where(iv_ref[0, 0] != 0, dwy, 0.0)


def _bwd_dimg_kernel(
    x0_ref, y0_ref, wx_ref, wy_ref, g_ref, dimg_ref, *, H, W, precise, q
):
    g = g_ref[0, 0]  # (1, q)
    Wx = _onehot_pair(x0_ref[0, 0], wx_ref[0, 0], W, W, q)  # (W, q)
    Wy = _onehot_pair(y0_ref[0, 0], wy_ref[0, 0], H, H, q)  # (H, q)
    # d_img accumulation: (Wy ⊙ g) @ Wxᵀ -> (H, W); the (n,·) block stays
    # resident across consecutive j steps, so revisits accumulate in VMEM
    wyg = Wy * g
    contrib = _dot(wyg, Wx, (((1,), (1,)), ((), ())), precise)  # (H, W)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[:] = jnp.zeros_like(dimg_ref)

    dimg_ref[:] += contrib[None]


# -------------------------------------------------------- column-band kernels


def _fwd_kernel_colband(
    w_ref, win_ref, x0r_ref, x1r_ref, y0_ref, wx_ref, wy_ref, out_ref,
    *, H, precise, q,
):
    win = win_ref[0, 0]  # (CBAND, H): columns of the selected window
    WxR = _onehot_pair_rel(x0r_ref[0, 0], x1r_ref[0, 0], wx_ref[0, 0], CBAND, q)
    Wy = _onehot_pair(y0_ref[0, 0], wy_ref[0, 0], H, H, q)  # (H, q)
    pm = _dot(win, WxR, (((0,), (0,)), ((), ())), precise)  # (H, q)
    out_ref[0, 0] = jnp.sum(pm * Wy, axis=0, keepdims=True)


def _bwd_duv_kernel_colband(
    w_ref, win_ref, x0r_ref, x1r_ref, y0_ref, wx_ref, wy_ref, iu_ref, iv_ref,
    g_ref, du_ref, dv_ref, *, H, precise, q,
):
    win = win_ref[0, 0]  # (CBAND, H)
    g = g_ref[0, 0]
    WxR = _onehot_pair_rel(x0r_ref[0, 0], x1r_ref[0, 0], wx_ref[0, 0], CBAND, q)
    Wy = _onehot_pair(y0_ref[0, 0], wy_ref[0, 0], H, H, q)

    ki_c = jax.lax.broadcasted_iota(jnp.int32, (CBAND, q), 0)
    DxR = jnp.where(ki_c == x1r_ref[0, 0], 1.0, 0.0) - jnp.where(
        ki_c == x0r_ref[0, 0], 1.0, 0.0
    )
    ki_h = jax.lax.broadcasted_iota(jnp.int32, (H, q), 0)
    y0 = y0_ref[0, 0]
    y1 = jnp.minimum(y0 + 1, H - 1)
    Dy = jnp.where(ki_h == y1, 1.0, 0.0) - jnp.where(ki_h == y0, 1.0, 0.0)

    pdx = _dot(win, DxR, (((0,), (0,)), ((), ())), precise)  # (H, q)
    pm = _dot(win, WxR, (((0,), (0,)), ((), ())), precise)  # (H, q)

    dwx = jnp.sum(Wy * pdx, axis=0, keepdims=True) * g
    dwy = jnp.sum(Dy * pm, axis=0, keepdims=True) * g

    du_ref[0, 0] = jnp.where(iu_ref[0, 0] != 0, dwx, 0.0)
    dv_ref[0, 0] = jnp.where(iv_ref[0, 0] != 0, dwy, 0.0)


def _bwd_dimg_kernel_colband(
    x0r_ref, x1r_ref, y0_ref, wx_ref, wy_ref, g_ref, part_ref, *, H, precise, q
):
    """Per-chunk window-relative d_img partial (CBAND, H); folded to (H, W)
    on the XLA side (windows overlap, so in-kernel accumulation across
    non-consecutive window revisits would be unsound)."""
    g = g_ref[0, 0]
    WxR = _onehot_pair_rel(x0r_ref[0, 0], x1r_ref[0, 0], wx_ref[0, 0], CBAND, q)
    Wy = _onehot_pair(y0_ref[0, 0], wy_ref[0, 0], H, H, q)
    dwin = _dot(WxR * g, Wy, (((1,), (1,)), ((), ())), precise)  # (CBAND, H)
    part_ref[0, 0] = dwin


# ----------------------------------------------------------------- call glue


def _pad_points(arrs, P, q, modes=None):
    Ppad = ((P + q - 1) // q) * q
    if Ppad == P:
        return arrs, P
    modes = modes or ["constant"] * len(arrs)
    return [
        jnp.pad(a, ((0, 0), (0, Ppad - P)), mode=m) for a, m in zip(arrs, modes)
    ], P


def _row4(a, q):
    """(N, P) -> (N, P//q, 1, q): Mosaic requires the last two block dims to
    be tile-aligned or equal to the array dims; (1, q) trailing dims satisfy
    the 'equal' branch."""
    N, P = a.shape
    return a.reshape(N, P // q, 1, q)


def _to_cm(a, H, W):
    """Row-major point order -> column-major (chunks become column runs)."""
    N = a.shape[0]
    return a.reshape(N, H, W).transpose(0, 2, 1).reshape(N, H * W)


def _from_cm(a, H, W):
    N = a.shape[0]
    return a.reshape(N, W, H).transpose(0, 2, 1).reshape(N, H * W)


def _padded_width(W):
    """Window grid geometry: smallest Wp >= W with (Wp-CBAND) % CSTRIDE == 0."""
    span = max(W - CBAND, 0)
    nspan = -(-span // CSTRIDE)  # ceil
    Wp = nspan * CSTRIDE + CBAND
    nwin = nspan + 1
    return Wp, nwin


def _make_windows(img):
    """(N, H, W) -> (N, nwin, CBAND, H) CSTRIDE-strided column windows
    (static slices only; zero-pad columns past W are never selected because
    x0 <= W-1)."""
    N, H, W = img.shape
    Wp, nwin = _padded_width(W)
    img_t = jnp.pad(img.transpose(0, 2, 1), ((0, 0), (0, Wp - W), (0, 0)))
    return jnp.stack(
        [img_t[:, s : s + CBAND, :] for s in range(0, Wp - CBAND + 1, CSTRIDE)],
        axis=1,
    )


def _window_info(x0p, W, q):
    """Per-(image, chunk) window index + global fits flag + window-relative
    index rows. x0p must be edge-padded so tail chunks stay tight."""
    N, Ppad = x0p.shape
    _, nwin = _padded_width(W)
    xc = x0p.reshape(N, Ppad // q, q)
    x1c = jnp.minimum(xc + 1, W - 1)
    wv = jnp.clip(jnp.min(xc, axis=2) // CSTRIDE, 0, nwin - 1).astype(jnp.int32)
    fits = jnp.all(jnp.max(x1c, axis=2) - wv * CSTRIDE <= CBAND - 1)
    off = (wv * CSTRIDE)[:, :, None]
    x0r = (xc - off).reshape(N, Ppad)
    x1r = (x1c - off).reshape(N, Ppad)
    return wv, fits, x0r, x1r


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


def _fwd_call_colband(wins, wv, x0r, x1r, y0i, wx, wy, *, H, precise, interpret, q):
    N = wins.shape[0]
    P = x0r.shape[1]
    nq = P // q
    kernel = functools.partial(_fwd_kernel_colband, H=H, precise=precise, q=q)
    row = pl.BlockSpec((1, 1, 1, q), lambda n, j, w: (n, j, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N, nq),
            in_specs=[
                pl.BlockSpec((1, 1, CBAND, H), lambda n, j, w: (n, w[n, j], 0, 0)),
                row, row, row, row, row,
            ],
            out_specs=row,
        ),
        out_shape=jax.ShapeDtypeStruct((N, nq, 1, q), jnp.float32),
        interpret=interpret,
    )(
        wv, wins, _row4(x0r, q), _row4(x1r, q), _row4(y0i, q),
        _row4(wx, q), _row4(wy, q),
    )
    return out.reshape(N, P)


def _bwd_duv_call(img, x0i, y0i, wx, wy, iu, iv, g, *, precise, interpret, q):
    N, H, W = img.shape
    P = x0i.shape[1]
    nq = P // q
    kernel = functools.partial(_bwd_duv_kernel, H=H, W=W, precise=precise, q=q)
    row_spec = pl.BlockSpec(
        (1, 1, 1, q), lambda n, j: (n, j, 0, 0), memory_space=pltpu.VMEM
    )
    img_spec = pl.BlockSpec((1, H, W), lambda n, j: (n, 0, 0), memory_space=pltpu.VMEM)
    du, dv = pl.pallas_call(
        kernel,
        grid=(N, nq),
        in_specs=[img_spec] + [row_spec] * 7,
        out_specs=(row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((N, nq, 1, q), jnp.float32),
            jax.ShapeDtypeStruct((N, nq, 1, q), jnp.float32),
        ),
        interpret=interpret,
    )(img, _row4(x0i, q), _row4(y0i, q), _row4(wx, q), _row4(wy, q),
      _row4(iu, q), _row4(iv, q), _row4(g, q))
    return du.reshape(N, P), dv.reshape(N, P)


def _bwd_duv_call_colband(
    wins, wv, x0r, x1r, y0i, wx, wy, iu, iv, g, *, H, precise, interpret, q
):
    N = wins.shape[0]
    P = x0r.shape[1]
    nq = P // q
    kernel = functools.partial(_bwd_duv_kernel_colband, H=H, precise=precise, q=q)
    row = pl.BlockSpec((1, 1, 1, q), lambda n, j, w: (n, j, 0, 0))
    du, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N, nq),
            in_specs=[
                pl.BlockSpec((1, 1, CBAND, H), lambda n, j, w: (n, w[n, j], 0, 0)),
            ] + [row] * 8,
            out_specs=(row, row),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, nq, 1, q), jnp.float32),
            jax.ShapeDtypeStruct((N, nq, 1, q), jnp.float32),
        ),
        interpret=interpret,
    )(
        wv, wins, _row4(x0r, q), _row4(x1r, q), _row4(y0i, q), _row4(wx, q),
        _row4(wy, q), _row4(iu, q), _row4(iv, q), _row4(g, q),
    )
    return du.reshape(N, P), dv.reshape(N, P)


def _bwd_dimg_call(shape_hw, x0i, y0i, wx, wy, g, *, precise, interpret, q):
    H, W = shape_hw
    N, P = x0i.shape
    nq = P // q
    kernel = functools.partial(_bwd_dimg_kernel, H=H, W=W, precise=precise, q=q)
    row_spec = pl.BlockSpec(
        (1, 1, 1, q), lambda n, j: (n, j, 0, 0), memory_space=pltpu.VMEM
    )
    dimg = pl.pallas_call(
        kernel,
        grid=(N, nq),
        in_specs=[row_spec] * 5,
        out_specs=pl.BlockSpec(
            (1, H, W), lambda n, j: (n, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        interpret=interpret,
    )(_row4(x0i, q), _row4(y0i, q), _row4(wx, q), _row4(wy, q), _row4(g, q))
    return dimg


def _bwd_dimg_call_colband(
    shape_hw, wv, x0r, x1r, y0i, wx, wy, g, *, precise, interpret, q
):
    H, W = shape_hw
    N, P = x0r.shape
    nq = P // q
    Wp, nwin = _padded_width(W)
    kernel = functools.partial(_bwd_dimg_kernel_colband, H=H, precise=precise, q=q)
    row = pl.BlockSpec((1, 1, 1, q), lambda n, j: (n, j, 0, 0))
    part = pl.pallas_call(
        kernel,
        grid=(N, nq),
        in_specs=[row] * 6,
        out_specs=pl.BlockSpec((1, 1, CBAND, H), lambda n, j: (n, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, nq, CBAND, H), jnp.float32),
        interpret=interpret,
    )(
        _row4(x0r, q), _row4(x1r, q), _row4(y0i, q), _row4(wx, q),
        _row4(wy, q), _row4(g, q),
    )
    # fold overlapping-window partials: group chunks by window with an exact
    # fp32 masked sum (an MXU one-hot contraction here would run at the TPU
    # default bf16 matmul precision and corrupt d_img by ~1e-2), then scatter
    # the nwin accumulators with static slices
    dimg_t = jnp.zeros((N, Wp, H), part.dtype)
    for wi in range(nwin):
        acc = jnp.sum(
            jnp.where((wv == wi)[:, :, None, None], part, 0.0), axis=1
        )  # (N, CBAND, H)
        s = wi * CSTRIDE
        dimg_t = dimg_t.at[:, s : s + CBAND, :].add(acc)
    return dimg_t[:, :W, :].transpose(0, 2, 1)  # (N, H, W)


# ------------------------------------------------------------------ custom_vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sample(img, uv, precise, interpret):
    return _sample_fwd(img, uv, precise, interpret)[0]


def _prep(img, uv, precise):
    """Shared fwd/bwd preprocessing: coords, column-major reorder (full-grid
    calls only), padding, window info."""
    N, H, W = img.shape
    P = uv.shape[1]
    q = Q_PRECISE if precise else Q
    cm = P == H * W and W > CBAND  # reorder only helps full-grid calls
    banding = W > CBAND
    x0i, y0i, wx, wy, iu, iv = _coords((H, W), uv)
    if cm:
        x0i, y0i, wx, wy, iu, iv = (
            _to_cm(a, H, W) for a in (x0i, y0i, wx, wy, iu, iv)
        )
    arrs, _ = _pad_points(
        [x0i, y0i, wx, wy], P, q, modes=["edge", "constant", "constant", "constant"]
    )
    x0p, y0p, wxp, wyp = arrs
    if banding:
        wv, fits, x0r, x1r = _window_info(x0p, W, q)
    else:
        wv = fits = x0r = x1r = None
    return dict(
        N=N, H=H, W=W, P=P, q=q, cm=cm, banding=banding,
        x0p=x0p, y0p=y0p, wxp=wxp, wyp=wyp, iu=iu, iv=iv,
        wv=wv, fits=fits, x0r=x0r, x1r=x1r,
    )


def _sample_fwd(img, uv, precise, interpret):
    # COMPILE COST (ADVICE r2): every banded call compiles BOTH lax.cond
    # branches — the column-banded kernels and the exact full-W fallback —
    # in fwd, and twice more in bwd, roughly doubling Pallas compile time
    # even when the fallback is never taken at runtime. This is deliberate:
    # the fallback is what keeps banding exact (any chunk whose uv spread
    # overflows its 128-column window reruns the whole call unbanded), and
    # compiles are one-time + persistently cached. A host-side heuristic
    # gating the fallback for known-full-grid training shapes would give up
    # that exactness guarantee for a one-time cost, so it is not taken.
    c = _prep(img, uv, precise)
    H, W, P, q = c["H"], c["W"], c["P"], c["q"]
    if c["banding"]:
        wins = _make_windows(img)
        out = jax.lax.cond(
            c["fits"],
            lambda: _fwd_call_colband(
                wins, c["wv"], c["x0r"], c["x1r"], c["y0p"], c["wxp"], c["wyp"],
                H=H, precise=precise, interpret=interpret, q=q,
            ),
            lambda: _fwd_call(
                img, c["x0p"], c["y0p"], c["wxp"], c["wyp"],
                precise=precise, interpret=interpret, q=q,
            ),
        )
    else:
        out = _fwd_call(
            img, c["x0p"], c["y0p"], c["wxp"], c["wyp"],
            precise=precise, interpret=interpret, q=q,
        )
    out = out[:, :P]
    if c["cm"]:
        out = _from_cm(out, H, W)
    return out, (img, uv)


def _sample_bwd(precise, interpret, residuals, g):
    img, uv = residuals
    c = _prep(img, uv, precise)
    H, W, P, q = c["H"], c["W"], c["P"], c["q"]
    Ppad = c["x0p"].shape[1]
    if c["cm"]:
        g = _to_cm(g, H, W)
    gp = jnp.pad(g, ((0, 0), (0, Ppad - P)))
    iup = jnp.pad(c["iu"].astype(jnp.int32), ((0, 0), (0, Ppad - P)))
    ivp = jnp.pad(c["iv"].astype(jnp.int32), ((0, 0), (0, Ppad - P)))

    if c["banding"]:
        wins = _make_windows(img)
        du, dv = jax.lax.cond(
            c["fits"],
            lambda: _bwd_duv_call_colband(
                wins, c["wv"], c["x0r"], c["x1r"], c["y0p"], c["wxp"], c["wyp"],
                iup, ivp, gp, H=H, precise=precise, interpret=interpret, q=q,
            ),
            lambda: _bwd_duv_call(
                img, c["x0p"], c["y0p"], c["wxp"], c["wyp"], iup, ivp, gp,
                precise=precise, interpret=interpret, q=q,
            ),
        )
        dimg = jax.lax.cond(
            c["fits"],
            lambda: _bwd_dimg_call_colband(
                (H, W), c["wv"], c["x0r"], c["x1r"], c["y0p"], c["wxp"],
                c["wyp"], gp, precise=precise, interpret=interpret, q=q,
            ),
            lambda: _bwd_dimg_call(
                (H, W), c["x0p"], c["y0p"], c["wxp"], c["wyp"], gp,
                precise=precise, interpret=interpret, q=q,
            ),
        )
    else:
        du, dv = _bwd_duv_call(
            img, c["x0p"], c["y0p"], c["wxp"], c["wyp"], iup, ivp, gp,
            precise=precise, interpret=interpret, q=q,
        )
        dimg = _bwd_dimg_call(
            (H, W), c["x0p"], c["y0p"], c["wxp"], c["wyp"], gp,
            precise=precise, interpret=interpret, q=q,
        )

    du = du[:, :P]
    dv = dv[:, :P]
    if c["cm"]:
        du = _from_cm(du, H, W)
        dv = _from_cm(dv, H, W)
    du = du * ((W - 1) * 0.5)
    dv = dv * ((H - 1) * 0.5)
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
