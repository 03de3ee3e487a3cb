"""Data-parallel tests on the 8-device CPU mesh (SURVEY.md §4: DP tests under
jax.sharding with simulated devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodepth2_tpu.models import Model
from monodepth2_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    make_shardmap_train_step,
    shard_batch,
)
from monodepth2_tpu.training import (
    TrainConfig,
    TrainContext,
    create_train_state,
    make_train_step,
)


def _setup(batch_size, **kw):
    cfg = TrainConfig(target_size=(64, 32), batch_size=batch_size, **kw)
    model = Model.create(in_channels=1)
    state, tx = create_train_state(model, cfg)
    K = np.asarray([[50.0, 0, 32], [0, 50.0, 16], [0, 0, 1.0]])
    ctx = TrainContext.create(K, 64, 32)
    return cfg, model, state, tx, ctx


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.uniform(size=(cfg.batch_size, 3, cfg.height, cfg.width, 1)), jnp.float32
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.size == 8


def test_gspmd_grads_match_single_device():
    """DP over 8 devices must produce the same loss and gradients as
    single-device on the same global batch (up to float addition order).

    Compared pre-optimizer: Adam's first step is ±lr·sign(grad), which turns
    reduction-order noise in near-zero grads into full-size update flips, so
    post-Adam params are not a meaningful equivalence surface."""
    from monodepth2_tpu.training import train_loss
    from monodepth2_tpu.parallel import batch_sharding, replicated_sharding

    cfg, model, state, tx, ctx = _setup(batch_size=8)
    # float64 makes the equivalence sharp: in fp32, BatchNorm's
    # cancellation-heavy gradient sums absorb ~1% reduction-order noise,
    # which is normal but makes the comparison meaningless.
    to64 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
    )
    params64 = to64(state.params)
    stats64 = to64(state.stats)
    ctx = TrainContext.create(np.asarray(ctx.K), 64, 32, dtype=jnp.float64)
    batch = _batch(cfg).astype(jnp.float64)

    def loss_of(params, frames):
        return train_loss(model, params, stats64, frames, ctx, cfg)[0]

    g_single = jax.jit(jax.grad(loss_of))(params64, batch)
    l_single = float(jax.jit(loss_of)(params64, batch))

    mesh = make_mesh()
    gfn = jax.jit(
        jax.grad(loss_of),
        in_shardings=(replicated_sharding(mesh), batch_sharding(mesh)),
        out_shardings=replicated_sharding(mesh),
    )
    g_par = gfn(params64, shard_batch(batch, mesh))
    l_par = float(
        jax.jit(
            loss_of,
            in_shardings=(replicated_sharding(mesh), batch_sharding(mesh)),
        )(params64, shard_batch(batch, mesh))
    )

    assert l_single == pytest.approx(l_par, rel=1e-9)
    flat1 = jax.tree_util.tree_leaves(g_single)
    flat2 = jax.tree_util.tree_leaves(g_par)
    for a, b in zip(flat1, flat2):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=1e-9 * scale + 1e-12)


def test_shardmap_step_runs_and_reduces():
    cfg, model, state, tx, ctx = _setup(batch_size=8)
    mesh = make_mesh()
    step = make_shardmap_train_step(model, tx, ctx, cfg, mesh)
    batch = shard_batch(_batch(cfg), mesh)
    new_state, metrics, _ = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_global_batch_must_divide():
    cfg, model, state, tx, ctx = _setup(batch_size=6)
    mesh = make_mesh()
    with pytest.raises(ValueError):
        make_parallel_train_step(model, tx, ctx, cfg, mesh)


def test_multi_step_parallel_training_decreases_loss():
    cfg, model, state, tx, ctx = _setup(batch_size=8)
    mesh = make_mesh()
    step = make_parallel_train_step(model, tx, ctx, cfg, mesh, donate=False)
    batch = shard_batch(_batch(cfg), mesh)
    losses = []
    for _ in range(4):
        state, metrics, _ = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
