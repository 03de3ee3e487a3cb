"""Checkpoint/resume tests — the capability the reference lacks entirely
(it can only save the model, never resume; SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monodepth2_tpu.models import Model
from monodepth2_tpu.training import (
    TrainConfig,
    TrainContext,
    create_train_state,
    make_train_step,
)
from monodepth2_tpu.training.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def setup():
    cfg = TrainConfig(target_size=(64, 32), batch_size=2)
    model = Model.create(in_channels=1)
    state, tx = create_train_state(model, cfg)
    K = np.asarray([[50.0, 0, 32], [0, 50.0, 16], [0, 0, 1.0]])
    ctx = TrainContext.create(K, 64, 32)
    return cfg, model, state, tx, ctx


def test_roundtrip(tmp_path, setup):
    cfg, model, state, tx, ctx = setup
    path = str(tmp_path / "ckpt-0")
    save_checkpoint(path, state, metadata={"step": 0})
    restored = load_checkpoint(path, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(tmp_path, setup):
    """Training N steps straight == training k, checkpointing, resuming,
    training N-k more — bit-for-bit (full optimizer state round-trips)."""
    cfg, model, state, tx, ctx = setup
    step = jax.jit(make_train_step(model, tx, ctx, cfg))
    batch = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 3, 32, 64, 1)), jnp.float32
    )

    s = state
    for _ in range(2):
        s, _, _ = step(s, batch)
    path = str(tmp_path / "ckpt-2")
    save_checkpoint(path, s)
    for _ in range(2):
        s, _, _ = step(s, batch)

    r = load_checkpoint(path, state)
    assert int(r.step) == 2
    for _ in range(2):
        r, _, _ = step(r, batch)

    for a, b in zip(jax.tree_util.tree_leaves(s.params), jax.tree_util.tree_leaves(r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shape_mismatch_rejected(tmp_path, setup):
    cfg, model, state, tx, ctx = setup
    path = str(tmp_path / "ckpt-bad")
    save_checkpoint(path, state)
    other = Model.create(in_channels=3)
    other_state, _ = create_train_state(other, cfg)
    with pytest.raises(ValueError):
        load_checkpoint(path, other_state)


def test_latest_checkpoint(tmp_path, setup):
    cfg, model, state, tx, ctx = setup
    assert latest_checkpoint(str(tmp_path)) is None
    for step_n in (5, 20, 100):
        save_checkpoint(str(tmp_path / f"ckpt-{step_n}"), state)
    best = latest_checkpoint(str(tmp_path))
    assert best.endswith("ckpt-100")


def test_treedef_mismatch_rejected(tmp_path):
    """Same leaf count + shapes but different STRUCTURE must refuse to load
    (regression, VERDICT r2 weak #7: swapped same-shape leaves previously
    loaded silently in the wrong order)."""
    s1 = {"a": np.zeros((2, 2)), "b": np.ones((2, 2))}
    s2 = {"a": np.zeros((2, 2)), "c": np.ones((2, 2))}  # same shapes, new key
    path = str(tmp_path / "ckpt-0")
    save_checkpoint(path, s1)
    with pytest.raises(ValueError, match="structure"):
        load_checkpoint(path, s2)


def test_legacy_checkpoint_without_fingerprint_loads(tmp_path):
    """Pre-fingerprint sidecars (no treedef_sha) still load with the
    leaf-count/shape validation."""
    import json
    import os

    s = {"a": np.zeros((2, 2)), "b": np.ones((2, 2))}
    path = str(tmp_path / "ckpt-legacy")
    save_checkpoint(path, s)
    with open(path + ".json") as f:
        meta = json.load(f)
    del meta["treedef_sha"]
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    restored = load_checkpoint(path, s)
    for a, b in zip(
        jax.tree_util.tree_leaves(s), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inference_load_across_optimizer_structure(tmp_path):
    """A checkpoint trained with grad_clip (extra optax chain element) must
    load for inference even when the eval invocation omits it: load_model
    rebuilds its template from the sidecar's recorded training config
    (eval.py load_model), not the caller's cfg."""
    from monodepth2_tpu.eval import load_model
    from monodepth2_tpu.models import Model
    from monodepth2_tpu.training.config import TrainConfig
    from monodepth2_tpu.training.state import create_train_state

    train_cfg = TrainConfig(target_size=(64, 32), grad_clip=1.0)
    model = Model.create(
        depth=train_cfg.encoder_depth,
        in_channels=train_cfg.in_channels,
        scale_levels=train_cfg.scale_levels,
    )
    state, _ = create_train_state(model, train_cfg)
    path = str(tmp_path / "ckpt-7")
    save_checkpoint(
        path, state, metadata={"step": 7, "config": train_cfg.to_json()}
    )

    eval_cfg = TrainConfig(target_size=(64, 32))  # no grad_clip
    m2, params, stats = load_model(eval_cfg, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_migrate_checkpoint_schedule_added(tmp_path, setup):
    """Adding lr_decay_steps to a run that started without them changes the
    optax treedef (adam(callable) carries a schedule count leaf), so resume
    refuses — the exact failure observed resuming runs/ssl_640_smoke with a
    decay schedule. tools/migrate_checkpoint.graft moves the old leaves into
    the new structure and seeds the count at the checkpoint's step."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from migrate_checkpoint import graft

    cfg, model, state, tx, ctx = setup
    step = jax.jit(make_train_step(model, tx, ctx, cfg))
    batch = jnp.asarray(
        np.random.default_rng(1).uniform(size=(2, 3, 32, 64, 1)), jnp.float32
    )
    s = state
    for _ in range(3):
        s, _, _ = step(s, batch)
    path = str(tmp_path / "ckpt-3")
    save_checkpoint(path, s, metadata={"step": 3, "config": cfg.to_json()})

    import dataclasses

    new_cfg = dataclasses.replace(cfg, lr_decay_steps=10, lr_decay_factor=0.1)
    new_state, new_tx = create_train_state(model, new_cfg)

    # resume under the new structure must refuse (structures differ)
    with pytest.raises(ValueError, match="different state structure"):
        load_checkpoint(path, new_state)

    old = load_checkpoint(path, s)
    migrated, copied, fresh, dropped = graft(old, new_state, int(old.step))
    assert dropped == []
    # every fresh leaf is a schedule/clip counter, seeded at the step
    for k in fresh:
        assert k.rsplit(".", 1)[-1].strip("'][ ") == "count", k
    fresh_leaves = {k for k in fresh}
    assert fresh_leaves, "expected at least one new count leaf"

    # params/stats/step/rng round-trip exactly
    for a, b in zip(
        jax.tree_util.tree_leaves((old.params, old.stats, old.step, old.rng)),
        jax.tree_util.tree_leaves(
            (migrated.params, migrated.stats, migrated.step, migrated.rng)
        ),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the migrated state round-trips through save/load under the NEW config
    # template and keeps training without shape/structure complaints
    path2 = str(tmp_path / "ckpt-3-migrated")
    save_checkpoint(path2, migrated, metadata={"step": 3})
    restored = load_checkpoint(path2, new_state)
    step2 = jax.jit(make_train_step(model, new_tx, ctx, new_cfg))
    s2, metrics, _ = step2(restored, batch)
    assert int(s2.step) == 4
    assert np.isfinite(float(metrics["loss"]))
