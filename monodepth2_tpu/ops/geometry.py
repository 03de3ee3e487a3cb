"""so(3)/SE(3) and pinhole-camera geometry in pure jax.numpy.

Reference semantics: src/utils.jl (Backproject :41-65, Project+normalize
:67-99, so3_exp_map :101-117, hat :119-128 with its hand-written rrule :130-141,
composeT :181-188, disparity_to_depth :175-179).

Design differences from the reference (deliberate, TPU-first):
  * batch-leading shapes — rvec (N,3), R (N,3,3), points (N,HW,3) — so every op
    is a plain batched matmul XLA tiles onto the MXU;
  * 0-indexed pixel grid; because the same K is used for backprojection and
    projection the warp is self-consistent, and the (-1,1) normalization
    `u/(W-1)*2-1` has the identical align-corners effect as the reference's
    1-indexed `((px-1)/(W-1)-0.5)*2`;
  * no mutation anywhere, so `hat` needs no custom VJP (the reference's rrule
    exists only because Julia's in-place build is not Zygote-differentiable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.custom_jvp
def safe_sqrt(x):
    """sqrt with a zero subgradient at 0.

    The reference works around NaN-at-0 gradients with
    `θ_inv = 1/max(θ, 1e-4)` (src/utils.jl:108-111, README.md:47-51); under JAX
    the sqrt itself produces the inf gradient, so the fix lives here.
    """
    return jnp.sqrt(x)


@safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.sqrt(x)
    grad = jnp.where(x > 0, 0.5 / jnp.where(x > 0, y, 1.0), 0.0)
    return y, grad * dx


def hat(rvec: Array) -> Array:
    """Skew-symmetric matrices of rotation vectors: (N,3) -> (N,3,3).

    hat(v) @ p == v × p. Matches the reference's `hat` (src/utils.jl:119-128).
    """
    rx, ry, rz = rvec[:, 0], rvec[:, 1], rvec[:, 2]
    zero = jnp.zeros_like(rx)
    rows = jnp.stack(
        [
            jnp.stack([zero, -rz, ry], axis=-1),
            jnp.stack([rz, zero, -rx], axis=-1),
            jnp.stack([-ry, rx, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def so3_exp_map(rvec: Array, eps: float = 1e-4) -> Array:
    """Rodrigues exponential map: (N,3) axis-angle -> (N,3,3) rotation.

    R = I + (sin θ / θ) K + ((1-cos θ)/θ²) K², with θ clamped at `eps` for the
    division exactly as the reference does (src/utils.jl:101-117).
    """
    dtype = rvec.dtype
    n = rvec.shape[0]
    skew = hat(rvec)
    skew2 = skew @ skew
    theta = safe_sqrt(jnp.sum(rvec * rvec, axis=-1, keepdims=True))  # (N,1)
    theta_inv = 1.0 / jnp.maximum(theta, jnp.asarray(eps, dtype))
    f1 = (theta_inv * jnp.sin(theta)).reshape(n, 1, 1)
    f2 = (theta_inv * theta_inv * (1.0 - jnp.cos(theta))).reshape(n, 1, 1)
    eye = jnp.eye(3, dtype=dtype)
    return f1 * skew + f2 * skew2 + eye


def compose_transform(rvec: Array, tvec: Array, invert: bool):
    """Axis-angle + translation -> (R, t); optionally the inverse transform.

    rvec (N,3), tvec (N,3,1) -> R (N,3,3), t (N,3,1).
    invert=True returns (Rᵀ, Rᵀ @ (−t)) — used for source frames that come
    before the target (reference composeT, src/utils.jl:181-188; inversion
    choice at src/training.jl:29-32).
    """
    R = so3_exp_map(rvec)
    if invert:
        R = jnp.swapaxes(R, -1, -2)
        t = R @ (-tvec)
    else:
        t = tvec
    return R, t


def pixel_grid(width: int, height: int, dtype=jnp.float32) -> Array:
    """Homogeneous pixel coordinates, (H*W, 3), row-major (idx = h*W + w).

    0-indexed (see module docstring); the reference builds the 1-indexed
    analog once at startup (src/utils.jl:45-51).
    """
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    xg, yg = jnp.meshgrid(xs, ys)  # (H,W)
    ones = jnp.ones_like(xg)
    return jnp.stack([xg, yg, ones], axis=-1).reshape(height * width, 3)


def invert_intrinsics(K: Array) -> Array:
    """Exact 3x3 inverse via the adjugate: (...,3,3) -> (...,3,3).

    Per-item camera intrinsics ride inside the jitted loss (K varies across
    KITTI sequences — see DChain.K_of), so the inverse must be computed
    in-graph. The adjugate form is closed-form, batched, and lowers to plain
    VPU arithmetic — no LU solve (`jnp.linalg.inv` lowers to a loop-heavy
    factorization that XLA cannot fuse). Exact for any invertible K, not
    just zero-skew pinhole matrices.
    """
    a, b, c = K[..., 0, 0], K[..., 0, 1], K[..., 0, 2]
    d, e, f = K[..., 1, 0], K[..., 1, 1], K[..., 1, 2]
    g, h, i = K[..., 2, 0], K[..., 2, 1], K[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    cof = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return cof / det[..., None, None]


def backproject(depth: Array, invK: Array, grid: Array) -> Array:
    """Lift pixels to camera-space rays scaled by depth.

    depth (N,HW) or (N,HW,1), invK (3,3) shared or (N,3,3) per item,
    grid (HW,3) -> points (N,HW,3).
    Reference: Backproject forward, src/utils.jl:63-65 (single shared K;
    the batched-K form has no reference analog — it lets a DChain train
    each KITTI sequence with its own calibration, VERDICT r3 #4).
    """
    if depth.ndim == 2:
        depth = depth[..., None]
    # grid @ invKᵀ: (HW,3) @ (3,3) -> (HW,3), or broadcast-batched
    # (HW,3) @ (N,3,3) -> (N,HW,3) — either way a small MXU matmul
    rays = grid @ jnp.swapaxes(invK, -1, -2).astype(grid.dtype)
    if rays.ndim == 2:
        rays = rays[None, :, :]
    return depth * rays


def project(
    points: Array,
    K: Array,
    R: Array,
    t: Array,
    width: int,
    height: int,
    eps: float = 1e-7,
) -> Array:
    """Rigid-transform, project, and normalize to (-1,1) grid-sample coords.

    points (N,HW,3), K (3,3) shared or (N,3,3) per item, R (N,3,3),
    t (N,3,1) -> uv (N,HW,2).
    cam = K (R p + t); uv = cam.xy/(cam.z+eps); normalized u/(W-1)*2-1.
    Reference: Project forward + normalize, src/utils.jl:79-99 (eps 1e-7).
    """
    dtype = points.dtype
    # (N,HW,3) @ (N,3,3)ᵀ + tᵀ — batched matmuls on the MXU; K broadcasts
    # (3,3) shared → every item, (N,3,3) → per item
    cam = (points @ jnp.swapaxes(R, -1, -2) + jnp.swapaxes(t, -1, -2)) @ jnp.swapaxes(
        K, -1, -2
    ).astype(dtype)
    denom = 1.0 / (cam[..., 2:3] + jnp.asarray(eps, dtype))
    uv = cam[..., :2] * denom
    norm = jnp.asarray([width - 1.0, height - 1.0], dtype)
    return (uv / norm) * 2.0 - 1.0


def disparity_to_depth(disparity: Array, min_depth: float, max_depth: float) -> Array:
    """Sigmoid disparity in (0,1) -> depth in [min_depth, max_depth].

    depth = 1 / (disp·(1/min − 1/max) + 1/max)
    Reference: src/utils.jl:175-179.
    """
    dtype = disparity.dtype
    min_disp = jnp.asarray(1.0 / max_depth, dtype)
    max_disp = jnp.asarray(1.0 / min_depth, dtype)
    return 1.0 / (disparity * (max_disp - min_disp) + min_disp)
