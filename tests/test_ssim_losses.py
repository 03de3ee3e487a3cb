"""SSIM / smoothness / photometric loss tests
(mirrors reference test/runtests.jl:52-83 plus loss-layer properties)."""

import jax.numpy as jnp
import numpy as np
import pytest

from monodepth2_tpu.ops import (
    apply_automask,
    automasking_loss,
    photometric_loss,
    prediction_loss,
    smooth_loss,
    ssim,
)


def test_ssim_identical_is_zero():
    x = jnp.ones((1, 2, 2, 1))
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 0.0, atol=1e-12)


def test_ssim_ones_vs_zeros_near_half():
    x = jnp.ones((1, 2, 2, 1))
    y = jnp.zeros((1, 2, 2, 1))
    np.testing.assert_allclose(np.asarray(ssim(x, y)), 0.5, atol=1e-1)


def test_ssim_symmetric():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 2, 2, 1)))
    y = jnp.asarray(rng.uniform(size=(2, 2, 2, 1)))
    np.testing.assert_allclose(np.asarray(ssim(x, y)), np.asarray(ssim(y, x)), atol=1e-12)


def test_ssim_range():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)))
    y = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)))
    s = np.asarray(ssim(x, y))
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_smooth_loss_uniform_image():
    # uniform image ⇒ exp(-|∇I|)=1 ⇒ loss = mean|∇d|_x + mean|∇d|_y
    # (reference test/runtests.jl:70-77)
    # disparity rows [0.0,0.1],[0.2,0.3] in (H,W) layout
    disp = jnp.asarray([[0.0, 0.1], [0.2, 0.3]])[None]  # (1,2,2)
    image = jnp.ones((1, 2, 2, 1))
    sl = float(smooth_loss(disp, image))
    expected = np.mean([0.1, 0.1]) + np.mean([0.2, 0.2])
    assert sl == pytest.approx(expected, abs=1e-12)


def test_smooth_loss_fixed_value():
    # hand-computed oracle 0.2542 (reference test/runtests.jl:79-83)
    disp = jnp.asarray([[0.0, 0.1], [0.2, 0.3]])[None]
    image = jnp.asarray([[0.1, 0.2], [0.3, 0.4]])[None, :, :, None]
    sl = float(smooth_loss(disp, image))
    assert sl == pytest.approx(0.2542, abs=1e-4)


def test_photometric_loss_zero_on_identical():
    x = jnp.ones((1, 4, 4, 3)) * 0.3
    pl = np.asarray(photometric_loss(x, x))
    np.testing.assert_allclose(pl, 0.0, atol=1e-10)
    assert pl.shape == (1, 4, 4, 1)


def test_prediction_loss_takes_min():
    rng = np.random.default_rng(2)
    target = jnp.asarray(rng.uniform(size=(1, 6, 6, 1)))
    exact = target  # photometric 0
    noisy = jnp.asarray(rng.uniform(size=(1, 6, 6, 1)))
    out = np.asarray(prediction_loss([exact, noisy], target))
    np.testing.assert_allclose(out, 0.0, atol=1e-10)


def test_automasking_on_static_scene():
    # static scene: all frames identical ⇒ identity loss 0 everywhere
    frame = jnp.asarray(np.random.default_rng(3).uniform(size=(1, 6, 6, 1)))
    frames = jnp.stack([frame, frame, frame], axis=1)  # (N,L,H,W,C)
    auto = np.asarray(automasking_loss(frames, frames[:, 1], source_ids=[0, 2]))
    np.testing.assert_allclose(auto, 0.0, atol=1e-10)
    # masking then kills any warp loss
    masked = np.asarray(
        apply_automask(jnp.asarray(auto), jnp.ones_like(jnp.asarray(auto)))
    )
    np.testing.assert_allclose(masked, 0.0, atol=1e-10)
