"""Direct unit tests of the functional layer library (nn/core.py) against
scipy / closed-form oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal

from monodepth2_tpu.nn.core import (
    BatchNorm,
    Conv,
    Sequential,
    max_pool,
    mean_pool,
    reflect_pad,
    upsample_bilinear,
)


def test_conv_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 10, 1)).astype(np.float32)
    conv = Conv(1, 1, 3, 1, 1, use_bias=True)
    params, _ = conv.init(jax.random.PRNGKey(0))
    y, _ = conv(params, {}, jnp.asarray(x))
    w = np.asarray(params["w"])[..., 0, 0]
    # lax conv is cross-correlation; scipy.correlate2d with 'same' matches
    expected = signal.correlate2d(x[0, ..., 0], w, mode="same") + float(
        params["b"][0]
    )
    np.testing.assert_allclose(np.asarray(y)[0, ..., 0], expected, atol=1e-5)


def test_conv_stride_and_shapes():
    conv = Conv(3, 8, 3, 2, 1)
    params, _ = conv.init(jax.random.PRNGKey(1))
    y, _ = conv(params, {}, jnp.zeros((2, 16, 20, 3)))
    assert y.shape == (2, 8, 10, 8)


def test_conv_reflect_padding():
    conv = Conv(1, 1, 3, 1, "reflect", use_bias=False)
    params, _ = conv.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 6, 6, 1)), jnp.float32)
    y, _ = conv(params, {}, x)
    assert y.shape == x.shape
    # equals manual reflect-pad + VALID conv
    conv_v = Conv(1, 1, 3, 1, "valid", use_bias=False)
    y2, _ = conv_v(params, {}, reflect_pad(x, 1))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)


def test_batchnorm_train_normalizes():
    bn = BatchNorm(4)
    params, stats = bn.init(jax.random.PRNGKey(4))
    x = jnp.asarray(
        np.random.default_rng(5).normal(3.0, 2.0, (8, 4, 4, 4)), jnp.float32
    )
    y, new_stats = bn(params, stats, x, train=True)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(0, 1, 2))), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.std(y, axis=(0, 1, 2))), 1, atol=1e-3)
    # running stats moved toward batch stats (momentum 0.1)
    np.testing.assert_allclose(
        np.asarray(new_stats["mean"]),
        0.9 * np.asarray(stats["mean"]) + 0.1 * np.asarray(jnp.mean(x, axis=(0, 1, 2))),
        atol=1e-5,
    )


def test_batchnorm_eval_uses_running_stats():
    bn = BatchNorm(2)
    params, stats = bn.init(jax.random.PRNGKey(6))
    stats = {"mean": jnp.asarray([1.0, 2.0]), "var": jnp.asarray([4.0, 9.0])}
    x = jnp.ones((1, 2, 2, 2))
    y, _ = bn(params, stats, x, train=False)
    expected = (1.0 - np.asarray([1.0, 2.0])) / np.sqrt(np.asarray([4.0, 9.0]) + 1e-5)
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0], expected, atol=1e-5)


def test_pools():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    mp = max_pool(x, 2, 2)
    np.testing.assert_array_equal(
        np.asarray(mp)[0, ..., 0], [[5, 7], [13, 15]]
    )
    avg = mean_pool(x, 3, 1)
    assert avg.shape == (1, 2, 2, 1)
    assert float(avg[0, 0, 0, 0]) == pytest.approx(np.mean(np.arange(16).reshape(4, 4)[:3, :3]))


def test_upsample_bilinear_align_corners():
    x = jnp.asarray([[0.0, 1.0]])[None, ..., None]  # (1,1,2,1)
    y = upsample_bilinear(x, size=(1, 5))
    np.testing.assert_allclose(
        np.asarray(y)[0, 0, :, 0], [0, 0.25, 0.5, 0.75, 1.0], atol=1e-6
    )


def test_sequential_composes():
    seq = Sequential((Conv(1, 4, 3, 1, 1), BatchNorm(4, act=jax.nn.relu), Conv(4, 2, 1)))
    params, stats = seq.init(jax.random.PRNGKey(7))
    y, new_stats = seq(params, stats, jnp.zeros((1, 8, 8, 1)), train=True)
    assert y.shape == (1, 8, 8, 2)
    assert set(new_stats.keys()) == {"0", "1", "2"}
