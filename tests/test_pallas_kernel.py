"""Pallas fused grid-sample kernel vs the exact gather path (interpret mode
on CPU; the same kernel compiles for TPU — BASELINE.json roofline target)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodepth2_tpu.ops.grid_sample import _grid_sample_gather, _grid_sample_onehot
from monodepth2_tpu.ops.pallas import grid_sample_pallas


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(2, 16, 32, 1)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1.2, 1.2, size=(2, 100, 2)), jnp.float32)
    return img, uv


def test_forward_matches_gather(case):
    img, uv = case
    ref = _grid_sample_gather(img, uv)
    got = grid_sample_pallas(img, uv, precise=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_onehot_matches_gather(case):
    img, uv = case
    ref = _grid_sample_gather(img, uv)
    got = _grid_sample_onehot(img, uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_gradients_match_gather(case):
    img, uv = case

    def loss(f):
        return lambda i, u: jnp.sum(f(i, u) ** 2)

    gi_ref, gu_ref = jax.grad(loss(_grid_sample_gather), argnums=(0, 1))(img, uv)
    gi, gu = jax.grad(
        loss(lambda i, u: grid_sample_pallas(i, u, precise=True)), argnums=(0, 1)
    )(img, uv)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_ref), atol=1e-4)


def test_border_gradient_zero(case):
    """Coordinate gradient must vanish for samples clamped at the border."""
    img, _ = case
    uv_out = jnp.asarray([[[-2.0, 0.0], [2.0, 0.0], [0.0, -3.0]]], jnp.float32)
    gu = jax.grad(
        lambda u: jnp.sum(grid_sample_pallas(img[:1], u, precise=True))
    )(uv_out)
    # u out of range -> du == 0; v in range -> dv may be nonzero
    assert float(jnp.abs(gu[0, 0, 0])) == 0.0
    assert float(jnp.abs(gu[0, 1, 0])) == 0.0
    assert float(jnp.abs(gu[0, 2, 1])) == 0.0


def test_multichannel(case):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(2, 8, 16, 3)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1, 1, size=(2, 40, 2)), jnp.float32)
    ref = _grid_sample_gather(img, uv)
    got = grid_sample_pallas(img, uv, precise=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_full_warp_resolution(case):
    """416×128, the training shape (chunking + padding path)."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(size=(1, 128, 416, 1)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-1, 1, size=(1, 128 * 416, 2)), jnp.float32)
    ref = _grid_sample_gather(img, uv)
    got = grid_sample_pallas(img, uv, precise=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)



def _smooth_uv(N, H, W, scale, seed=3):
    rng = np.random.default_rng(seed)
    bu = np.tile(np.linspace(-1, 1, W), (H, 1))
    bv = np.tile(np.linspace(-1, 1, H)[:, None], (1, W))
    uv = np.stack(
        [np.tile(bu, (N, 1, 1)) + scale * rng.standard_normal((N, H, W)),
         np.tile(bv, (N, 1, 1)) + scale * rng.standard_normal((N, H, W))],
        axis=-1,
    ).reshape(N, H * W, 2)
    return jnp.asarray(uv, jnp.float32)


@pytest.mark.parametrize("scale", [0.02, 0.9])
def test_column_banded_path_matches_gather(scale):
    """Near-identity warps take the CBAND-column fast path, wild warps the
    full fallback — both must agree with the gather oracle (fwd + grads).
    Revalidated on real v5e (BASELINE.md)."""
    from monodepth2_tpu.ops.pallas import grid_sample_kernel as kmod

    N, H, W = 2, 64, 160
    assert W > kmod.CBAND  # banding is reachable at this shape
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(N, H, W, 1)), jnp.float32)
    uv = _smooth_uv(N, H, W, scale)
    g = jnp.asarray(rng.uniform(size=(N, H * W, 1)), jnp.float32)

    # confirm which path the fits flag selects at this scale
    x0 = kmod._coords((H, W), uv)[0]
    x0 = kmod._to_cm(x0, H, W)
    _, fits, _, _ = kmod._window_info(x0, W, kmod.Q_PRECISE)
    assert bool(fits) == (scale < 0.5)

    ref = _grid_sample_gather(img, uv)
    got = grid_sample_pallas(img, uv, precise=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    gr = jax.grad(lambda im, u: jnp.vdot(_grid_sample_gather(im, u), g), (0, 1))(img, uv)
    gp = jax.grad(
        lambda im, u: jnp.vdot(grid_sample_pallas(im, u, precise=True), g), (0, 1)
    )(img, uv)
    np.testing.assert_allclose(
        np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-4, rtol=1e-5
    )
    # duv scales by (W-1)/2, so large values need the relative term
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gr[1]), atol=1e-4, rtol=1e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("scale", [0.02, 0.9])
def test_column_banded_640x192_matches_gather(scale):
    """The Depth10k resolution (640×192 — BASELINE.json configs[4]): the
    banding constants were swept at W=416 (VERDICT r4 missing #2), so both
    the fast path (near-identity warp) and the fallback (wild warp) must be
    revalidated against the gather oracle at W=640. Revalidated on real v5e
    alongside the 640 throughput rows (BASELINE.md)."""
    from monodepth2_tpu.ops.pallas import grid_sample_kernel as kmod

    N, H, W = 1, 192, 640
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(size=(N, H, W, 1)), jnp.float32)
    uv = _smooth_uv(N, H, W, scale, seed=6)
    g = jnp.asarray(rng.uniform(size=(N, H * W, 1)), jnp.float32)

    x0 = kmod._coords((H, W), uv)[0]
    x0 = kmod._to_cm(x0, H, W)
    _, fits, _, _ = kmod._window_info(x0, W, kmod.Q_PRECISE)
    assert bool(fits) == (scale < 0.5)

    ref = _grid_sample_gather(img, uv)
    got = grid_sample_pallas(img, uv, precise=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    gr = jax.grad(lambda im, u: jnp.vdot(_grid_sample_gather(im, u), g), (0, 1))(img, uv)
    gp = jax.grad(
        lambda im, u: jnp.vdot(grid_sample_pallas(im, u, precise=True), g), (0, 1)
    )(img, uv)
    np.testing.assert_allclose(
        np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-4, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gr[1]), atol=1e-4, rtol=1e-5
    )


def test_window_info_geometry():
    from monodepth2_tpu.ops.pallas import grid_sample_kernel as kmod

    q = kmod.Q_PRECISE
    W = 416
    # chunk reading columns 100..140 -> window 1 (cols 64..191), in-range rel
    x0 = jnp.tile(jnp.linspace(100, 140, q).astype(jnp.int32), (1, 1))
    wv, fits, x0r, x1r = kmod._window_info(x0, W, q)
    assert int(wv[0, 0]) == 1
    assert bool(fits)
    assert int(x0r.min()) >= 0 and int(x1r.max()) < kmod.CBAND
    # chunk spanning the full width cannot fit one window
    x0 = jnp.tile(jnp.linspace(0, W - 1, q).astype(jnp.int32), (1, 1))
    _, fits, _, _ = kmod._window_info(x0, W, q)
    assert not bool(fits)
