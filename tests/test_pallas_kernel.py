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
