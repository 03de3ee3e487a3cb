"""Model shape-parity tests (SURVEY.md §7.3: shape parity vs documented dims)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodepth2_tpu.models import DepthDecoder, Model, PoseDecoder, ResNetEncoder


@pytest.fixture(scope="module")
def encoder_setup():
    enc = ResNetEncoder(depth=18, in_channels=1)
    params, stats = enc.init(jax.random.PRNGKey(0))
    return enc, params, stats


def test_encoder_stage_shapes(encoder_setup):
    enc, params, stats = encoder_setup
    # 416×128 is the training resolution (reference src/Monodepth.jl:85)
    x = jnp.zeros((2, 128, 416, 1), jnp.float32)
    feats, _ = enc(params, stats, x)
    assert enc.stages == (64, 64, 128, 256, 512)
    expected = [
        (2, 64, 208, 64),
        (2, 32, 104, 64),
        (2, 16, 52, 128),
        (2, 8, 26, 256),
        (2, 4, 13, 512),
    ]
    assert [f.shape for f in feats] == expected


def test_encoder_batchnorm_stats_update(encoder_setup):
    enc, params, stats = encoder_setup
    x = jnp.ones((1, 32, 32, 1), jnp.float32)
    _, new_stats = enc(params, stats, x, train=True)
    # running stats must move in train mode...
    before = stats["stem_bn"]["mean"]
    after = new_stats["stem_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # ...and stay fixed in eval mode
    _, eval_stats = enc(params, stats, x, train=False)
    np.testing.assert_array_equal(
        np.asarray(eval_stats["stem_bn"]["mean"]), np.asarray(before)
    )


def test_depth_decoder_scales(encoder_setup):
    enc, eparams, estats = encoder_setup
    x = jnp.zeros((1, 128, 416, 1), jnp.float32)
    feats, _ = enc(eparams, estats, x)

    dec = DepthDecoder(encoder_channels=enc.stages, scale_levels=(2, 3, 4, 5))
    dparams, _ = dec.init(jax.random.PRNGKey(1))
    disps, _ = dec(dparams, {}, feats)
    # scales 1/8, 1/4, 1/2, 1/1 of 416×128 (reference src/Monodepth.jl:106-107)
    assert [d.shape for d in disps] == [
        (1, 16, 52, 1),
        (1, 32, 104, 1),
        (1, 64, 208, 1),
        (1, 128, 416, 1),
    ]
    for d in disps:  # sigmoid heads
        arr = np.asarray(d)
        assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_depth_decoder_validates_levels():
    with pytest.raises(ValueError):
        DepthDecoder(scale_levels=(0, 1))
    with pytest.raises(ValueError):
        DepthDecoder(scale_levels=(1, 2, 3, 4, 5, 5))


def test_pose_decoder_shapes():
    dec = PoseDecoder(in_channels=512)
    params, _ = dec.init(jax.random.PRNGKey(2))
    f = jnp.ones((3, 4, 13, 512), jnp.float32)
    (rvec, tvec), _ = dec(params, {}, (f, f))
    assert rvec.shape == (3, 3)
    assert tvec.shape == (3, 3, 1)
    # the 1e-2 scaling keeps initial poses tiny (reference src/pose_decoder.jl:31)
    assert np.abs(np.asarray(rvec)).max() < 1.0


def test_pose_decoder_tz_init():
    """Forward-motion prior: zero features -> exactly the configured tz
    (models/pose_decoder.py; symmetry-breaking analog of the reference's
    rvec init at src/simple_depth.jl:12-14)."""
    dec = PoseDecoder(in_channels=512, tz_init=-0.05)
    params, _ = dec.init(jax.random.PRNGKey(2))
    f = jnp.zeros((2, 4, 13, 512), jnp.float32)
    (rvec, tvec), _ = dec(params, {}, (f, f))
    np.testing.assert_allclose(np.asarray(rvec), 0.0, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(tvec[:, 2, 0]), -0.05, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(tvec[:, :2, 0]), 0.0, atol=1e-7)


def test_model_forward():
    model = Model.create(depth=18, in_channels=1, scale_levels=(2, 3, 4, 5))
    params, stats = model.init(jax.random.PRNGKey(3))
    frames = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 3, 64, 96, 1)), jnp.float32
    )
    disps, poses, new_stats = model(params, stats, frames, (0, 2), 1, train=True)
    assert len(disps) == 4
    assert disps[-1].shape == (2, 64, 96, 1)
    assert len(poses) == 2
    assert poses[0][0].shape == (2, 3)
    assert poses[0][1].shape == (2, 3, 1)


def test_model_eval_disparity():
    model = Model.create(depth=18, in_channels=1)
    params, stats = model.init(jax.random.PRNGKey(4))
    x = jnp.zeros((1, 64, 96, 1), jnp.float32)
    disps = model.eval_disparity(params, stats, x)
    assert disps[-1].shape == (1, 64, 96, 1)


def test_model_jit_forward():
    model = Model.create(depth=18, in_channels=1)
    params, stats = model.init(jax.random.PRNGKey(5))
    frames = jnp.zeros((1, 3, 32, 64, 1), jnp.float32)

    @jax.jit
    def fwd(p, s, x):
        return model(p, s, x, (0, 2), 1, train=False)

    disps, poses, _ = fwd(params, stats, frames)
    assert disps[-1].shape == (1, 32, 64, 1)
