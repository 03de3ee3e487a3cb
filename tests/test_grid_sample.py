"""Grid-sample + identity-warp tests — the key warp-correctness surface
(mirrors reference test/runtests.jl:94-122)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from monodepth2_tpu.ops import (
    backproject,
    grid_sample,
    pixel_grid,
    project,
    so3_exp_map,
    warp_images,
)
from monodepth2_tpu.ops.grid_sample import grid_sample_nhwc


def _normalized_grid(w, h, dtype=jnp.float64):
    g = pixel_grid(w, h, dtype)
    u = g[:, 0] / (w - 1) * 2 - 1
    v = g[:, 1] / (h - 1) * 2 - 1
    return jnp.stack([u, v], axis=-1)[None]  # (1,HW,2)


def test_identity_sample_reproduces_image():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, 8, 12, 3)))
    uv = _normalized_grid(12, 8)
    out = grid_sample(img, uv).reshape(1, 8, 12, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-10)


def test_half_pixel_shift_interpolates():
    # shift by half a pixel in x: output = average of horizontal neighbors
    img = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 4, 8, 1)))
    w = 8
    g = pixel_grid(w, 4, jnp.float64)
    u = (g[:, 0] + 0.5) / (w - 1) * 2 - 1
    v = g[:, 1] / 3 * 2 - 1
    uv = jnp.stack([u, v], axis=-1)[None]
    out = np.asarray(grid_sample(img, uv)).reshape(4, 8)
    expected = np.asarray(img)[0, :, :, 0]
    expected_shift = 0.5 * (expected[:, :-1] + expected[:, 1:])
    np.testing.assert_allclose(out[:, :-1], expected_shift, atol=1e-10)
    # last column clamps to border
    np.testing.assert_allclose(out[:, -1], expected[:, -1], atol=1e-10)


def test_border_padding_clamps():
    img = jnp.asarray(np.arange(12, dtype=np.float64).reshape(1, 3, 4, 1))
    uv = jnp.asarray([[[-5.0, -5.0], [5.0, 5.0], [-5.0, 5.0]]])
    out = np.asarray(grid_sample(img, uv))[0, :, 0]
    np.testing.assert_allclose(out, [0.0, 11.0, 8.0], atol=1e-12)


def test_identity_warp_full_chain():
    """Backproject → identity SE(3) → project → grid_sample reproduces the
    input exactly (reference test/runtests.jl:94-122, atol 1e-3 at res 16)."""
    res, n = 16, 2
    rng = np.random.default_rng(2)
    image = jnp.asarray(rng.uniform(size=(n, res, res, 1)))
    depth = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, res * res)))
    K = jnp.asarray([[910.0, 0, res / 2], [0, 910.0, res / 2], [0, 0, 1.0]])
    invK = jnp.linalg.inv(K)
    grid = pixel_grid(res, res, jnp.float64)

    R = so3_exp_map(jnp.zeros((n, 3)))
    t = jnp.zeros((n, 3, 1))

    points = backproject(depth, invK, grid)
    uv = project(points, K, R, t, res, res)
    sampled = grid_sample(image, uv).reshape(n, res, res, 1)
    np.testing.assert_allclose(np.asarray(sampled), np.asarray(image), atol=1e-3)


def test_warp_images_identity():
    """warp_images with identity poses ≈ source frames (the reconstruction of
    the reference's undefined `warp`, src/simple_depth.jl:30-32)."""
    h, w, n = 8, 12, 1
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.uniform(size=(n, 3, h, w, 1)))
    disparity = jnp.full((n, h, w, 1), 0.5)
    K = jnp.asarray([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1.0]])
    invK = jnp.linalg.inv(K)
    grid = pixel_grid(w, h, jnp.float64)
    eyeR = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
    zt = jnp.zeros((n, 3, 1))

    warped = warp_images(
        disparity, frames, [(eyeR, zt), (eyeR, zt)], K, invK, grid,
        source_ids=[0, 2], min_depth=0.1, max_depth=100.0,
    )
    # the projection's z-epsilon (1e-7, reference src/utils.jl:96) perturbs
    # sample coordinates by ~1e-6 — same as the reference, whose identity-warp
    # test uses atol 1e-3 (test/runtests.jl:115)
    np.testing.assert_allclose(np.asarray(warped[0]), np.asarray(frames[:, 0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(warped[1]), np.asarray(frames[:, 2]), atol=1e-4)


def test_grid_sample_gradients():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(1, 6, 6, 1)))
    uv = jnp.asarray(rng.uniform(-0.8, 0.8, size=(1, 10, 2)))
    check_grads(lambda i, g: jnp.sum(grid_sample(i, g) ** 2), (img, uv), order=1,
                atol=1e-4, rtol=1e-4)


def test_grid_sample_nhwc_wrapper():
    img = jnp.asarray(np.random.default_rng(5).uniform(size=(2, 5, 7, 3)))
    uvg = jnp.zeros((2, 3, 4, 2))
    out = grid_sample_nhwc(img, uvg)
    assert out.shape == (2, 3, 4, 3)


def test_grid_sample_jit_compatible():
    f = jax.jit(grid_sample)
    img = jnp.ones((1, 4, 4, 1))
    uv = jnp.zeros((1, 5, 2))
    out = f(img, uv)
    assert out.shape == (1, 5, 1)
