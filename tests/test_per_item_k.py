"""Per-item camera intrinsics (VERDICT r3 #4).

The reference trains a whole DChain with the FIRST sequence's K
(src/Monodepth.jl:99) even though KITTI's 22 odometry calibrations differ.
Here each batch item can carry its own K (batches become {"frames", "K"}),
and every op downstream — backproject, project, the loss's folded (S·N)
warp — consumes the batched calibration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monodepth2_tpu.data import DataLoader, DChain, SyntheticTriplets
from monodepth2_tpu.models import Model
from monodepth2_tpu.ops.geometry import (
    backproject,
    invert_intrinsics,
    pixel_grid,
    project,
    so3_exp_map,
)
from monodepth2_tpu.training import TrainConfig, TrainContext
from monodepth2_tpu.training.loss import train_loss


def _K(f, w, h):
    return np.asarray([[f, 0, w / 2], [0, f * 1.1, h / 2], [0, 0, 1.0]])


def test_invert_intrinsics_matches_linalg():
    rng = np.random.default_rng(0)
    # pinhole-like plus a fully generic invertible matrix
    Ks = np.stack(
        [_K(480.0, 416, 128), _K(320.0, 416, 128), rng.uniform(1, 2, (3, 3))]
    )
    got = np.asarray(invert_intrinsics(jnp.asarray(Ks)))
    want = np.linalg.inv(Ks)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_backproject_project_batched_K_match_per_item():
    """(N,3,3) K must equal running each item with its own shared (3,3) K."""
    w, h = 16, 8
    grid = pixel_grid(w, h)
    rng = np.random.default_rng(1)
    Ks = np.stack([_K(12.0, w, h), _K(20.0, w, h)])
    depth = jnp.asarray(rng.uniform(1, 10, (2, h * w)))
    R = so3_exp_map(jnp.asarray(rng.normal(size=(2, 3)) * 0.05))
    t = jnp.asarray(rng.normal(size=(2, 3, 1)) * 0.1)

    pts_b = backproject(depth, invert_intrinsics(jnp.asarray(Ks)), grid)
    uv_b = project(pts_b, jnp.asarray(Ks), R, t, w, h)
    for i in range(2):
        pts_i = backproject(
            depth[i : i + 1], jnp.asarray(np.linalg.inv(Ks[i])), grid
        )
        uv_i = project(pts_i, jnp.asarray(Ks[i]), R[i : i + 1], t[i : i + 1], w, h)
        np.testing.assert_allclose(
            np.asarray(pts_b[i]), np.asarray(pts_i[0]), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(uv_b[i]), np.asarray(uv_i[0]), rtol=1e-6, atol=1e-8
        )


def _two_K_chain(target_size, n_each=2):
    a = SyntheticTriplets(n=n_each, target_size=target_size, seed=0)
    b = SyntheticTriplets(n=n_each, target_size=target_size, seed=7)
    # give the second sequence a genuinely different calibration
    b.K = _K(float(a.K[0, 0]) * 0.8, *target_size)
    b.invK = np.linalg.inv(b.K)
    return a, b, DChain([a, b])


def test_dchain_K_of_routes_to_owning_child():
    a, b, chain = _two_K_chain((64, 32))
    assert chain.heterogeneous_K
    np.testing.assert_array_equal(chain.K_of(0), np.asarray(a.K, np.float32))
    np.testing.assert_array_equal(chain.K_of(1), np.asarray(a.K, np.float32))
    np.testing.assert_array_equal(chain.K_of(2), np.asarray(b.K, np.float32))
    np.testing.assert_array_equal(chain.K_of(3), np.asarray(b.K, np.float32))
    # homogeneous chain
    assert not DChain([a, SyntheticTriplets(n=2, target_size=(64, 32))]).heterogeneous_K


class _TaggedDS:
    """Constant-valued frames tag each item with its dataset of origin, so a
    shuffled batch row can be matched back to the calibration it must carry."""

    def __init__(self, tag: float, K: np.ndarray, n: int = 3, size=(64, 32)):
        self.tag, self.K, self.n = tag, K, n
        self.width, self.height = size
        self.target_id, self.source_ids = 1, (0, 2)

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        return np.full((3, self.height, self.width, 1), self.tag, np.float32)


def test_loader_with_K_rows_are_aligned():
    K_a, K_b = _K(100.0, 64, 32), _K(200.0, 64, 32)
    chain = DChain([_TaggedDS(1.0, K_a), _TaggedDS(2.0, K_b)])
    loader = DataLoader(chain, batch_size=2, shuffle=True, seed=3, with_K=True)
    batches = list(iter(loader))
    assert len(batches) == 3
    seen = set()
    for batch in batches:
        assert set(batch) == {"frames", "K"}
        assert batch["frames"].shape[0] == batch["K"].shape[0] == 2
        for row in range(2):
            tag = float(batch["frames"][row, 0, 0, 0, 0])
            want = K_a if tag == 1.0 else K_b
            np.testing.assert_array_equal(
                batch["K"][row], np.asarray(want, np.float32)
            )
            seen.add(tag)
    assert seen == {1.0, 2.0}  # the shuffle mixed both calibrations in


def test_train_loss_uses_each_items_own_K():
    """Loss with per-item K == loss with that K as the global ctx.K, and a
    WRONG global K (the reference's first-child approximation) differs."""
    w, h = 64, 32
    cfg = TrainConfig(target_size=(w, h), batch_size=2, warp_method="gather")
    ds = SyntheticTriplets(n=4, target_size=(w, h))
    frames = jnp.asarray(
        np.stack([ds[0], ds[1]]), jnp.float32
    )  # (2,3,H,W,C)
    K_true = _K(0.58 * w * 2 * 0.8, w, h)  # not the dataset default
    model = Model.create(depth=18, in_channels=1)
    rng = jax.random.PRNGKey(0)
    params, stats = model.init(rng)

    ctx_true = TrainContext.create(K_true, w, h)
    ctx_wrong = TrainContext.create(np.asarray(ds.K), w, h)
    loss_global, _ = train_loss(model, params, stats, frames, ctx_true, cfg)
    Ks = jnp.asarray(np.stack([K_true, K_true]), jnp.float32)
    loss_per_item, _ = train_loss(
        model, params, stats, frames, ctx_wrong, cfg, Ks=Ks
    )
    loss_wrong, _ = train_loss(model, params, stats, frames, ctx_wrong, cfg)
    # per-item K overrides ctx exactly
    np.testing.assert_allclose(
        float(loss_per_item), float(loss_global), rtol=1e-6
    )
    # and genuinely changes the objective vs the first-child approximation
    assert abs(float(loss_per_item) - float(loss_wrong)) > 1e-6


@pytest.mark.slow
def test_fit_per_item_K_end_to_end(tmp_path):
    """fit(per_item_K=True) on a two-calibration chain: trains, groups
    steps_per_call dicts, checkpoints."""
    _, _, chain = _two_K_chain((64, 32))
    cfg = TrainConfig(
        target_size=(64, 32),
        batch_size=2,
        epochs=2,
        steps_per_call=2,
        per_item_K=True,
        log_every=2,
        save_every=0,
        log_dir=str(tmp_path / "logs"),
        save_dir=str(tmp_path / "ckpts"),
    )
    from monodepth2_tpu.training.loop import fit

    state, _ = fit(cfg, chain, max_steps=4, verbose=False)
    assert int(state.step) == 4


def test_per_item_k_config_roundtrip():
    cfg = TrainConfig(per_item_K=True)
    assert TrainConfig.from_json(cfg.to_json()).per_item_K is True


def test_nested_chain_heterogeneity_and_fail_fast():
    """Nested-chain heterogeneity must not be masked by the copied
    first-grandchild K, and a K-less child must fail at loader construction
    (not mid-epoch in a worker thread)."""
    a = _TaggedDS(1.0, _K(100.0, 64, 32))
    b = _TaggedDS(2.0, _K(200.0, 64, 32))
    c = _TaggedDS(3.0, _K(100.0, 64, 32))
    nested = DChain([DChain([a, b]), c])
    assert nested.heterogeneous_K  # inner a!=b counts even though outer Ks match
    assert nested.supports_item_K
    # inner chain owns global 0..5 (a: 0-2, b: 3-5); c owns 6-8
    np.testing.assert_array_equal(nested.K_of(4), np.asarray(b.K, np.float32))
    np.testing.assert_array_equal(nested.K_of(7), np.asarray(c.K, np.float32))

    class _NoK:
        target_id, source_ids = 1, (0, 2)

        def __len__(self):
            return 2

        def __getitem__(self, i, rng=None):
            return np.zeros((3, 32, 64, 1), np.float32)

    broken = DChain([a, _NoK()])
    assert not broken.supports_item_K
    with pytest.raises(ValueError, match="neither"):
        DataLoader(broken, batch_size=2, with_K=True)
    from monodepth2_tpu.parallel import PerHostSampler

    sampler = PerHostSampler(broken, 2, process_id=0, num_processes=1)
    assert not sampler.supports_item_K
    with pytest.raises(ValueError, match="neither"):
        DataLoader(sampler, 2, shuffle=False, with_K=True)


def test_auto_per_item_k_enabling():
    """CLI auto-enable (VERDICT r4 #1): heterogeneous chains turn per_item_K
    on by default; explicit user settings (either direction) always win;
    homogeneous data never flips it."""
    from monodepth2_tpu.cli import _auto_per_item_k

    _, _, chain = _two_K_chain((64, 32))
    homo = SyntheticTriplets(n=2, target_size=(64, 32))
    cfg = TrainConfig(target_size=(64, 32))
    assert not cfg.per_item_K

    assert _auto_per_item_k(cfg, chain, {}).per_item_K is True
    assert _auto_per_item_k(cfg, homo, {}).per_item_K is False
    # explicit off (--no-per-item-k / config file) suppresses the auto-enable
    assert _auto_per_item_k(cfg, chain, {"per_item_K": False}).per_item_K is False
    # explicit on stays on regardless of data
    cfg_on = TrainConfig(target_size=(64, 32), per_item_K=True)
    assert _auto_per_item_k(cfg_on, homo, {"per_item_K": True}).per_item_K is True

    # heterogeneous but NOT per-item-capable (a K-less child): auto-enable
    # must stay off — flipping it would turn a working first-child-K
    # default into a DataLoader(with_K=True) crash at training start
    class _NoK:
        target_id, source_ids = 1, (0, 2)

        def __len__(self):
            return 2

        def __getitem__(self, i, rng=None):
            return np.zeros((3, 32, 64, 1), np.float32)

    a = _TaggedDS(1.0, _K(100.0, 64, 32))
    b = _TaggedDS(2.0, _K(200.0, 64, 32))
    mixed = DChain([DChain([a, b]), _NoK()])
    assert mixed.heterogeneous_K and not mixed.supports_item_K
    assert _auto_per_item_k(cfg, mixed, {}).per_item_K is False
