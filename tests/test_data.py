"""Data-layer tests with synthetic on-disk fixtures (the reference has no
dataset tests at all — SURVEY.md §4)."""

import os

import numpy as np
import pytest
from PIL import Image

from monodepth2_tpu.data import (
    DChain,
    DataLoader,
    Depth10k,
    FlipX,
    KittiDataset,
    SyntheticTriplets,
    find_static,
)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    """Miniature KITTI-odometry tree: 2 sequences × 9 frames of 64×32."""
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.default_rng(0)
    for seq in ("00", "01"):
        seq_dir = root / "sequences" / seq
        img_dir = seq_dir / "image_0"
        img_dir.mkdir(parents=True)
        # P0 line like real calib.txt
        (seq_dir / "calib.txt").write_text(
            "P0: 700.0 0.0 32.0 0.0 0.0 700.0 16.0 0.0 0.0 0.0 1.0 0.0\n"
        )
        for i in range(9):
            arr = (rng.uniform(size=(32, 64)) * 255).astype(np.uint8)
            Image.fromarray(arr, "L").save(img_dir / f"{i:06d}.png")
    return str(root)


@pytest.fixture(scope="module")
def dtk_root(tmp_path_factory):
    """Depth10k-style strips: 1248×128 = 3 frames of 416×128."""
    root = tmp_path_factory.mktemp("dtk")
    rng = np.random.default_rng(1)
    files = []
    for i in range(3):
        if i == 0:  # static triplet: 3 identical frames
            frame = (rng.uniform(size=(128, 416, 3)) * 255).astype(np.uint8)
            strip = np.concatenate([frame] * 3, axis=1)
        else:
            strip = (rng.uniform(size=(128, 1248, 3)) * 255).astype(np.uint8)
        name = f"strip{i}.png"
        Image.fromarray(strip, "RGB").save(root / name)
        files.append(name)
    return str(root), files


def test_kitti_dataset(kitti_root):
    ds = KittiDataset(kitti_root, "00", target_size=(48, 24))
    assert len(ds) == 3  # 9 frames / 3
    x = ds[0]
    assert x.shape == (3, 24, 48, 1)
    assert x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0
    # intrinsics: focal rescaled, principal point at center
    assert ds.K[0, 2] == 24  # W//2
    assert ds.K[1, 2] == 12
    expected_fx = np.mean([24 / 32, 48 / 64]) * 700.0
    assert ds.K[0, 0] == pytest.approx(expected_fx)


def test_kitti_triplets_non_overlapping(kitti_root):
    ds = KittiDataset(kitti_root, "00", target_size=(48, 24))
    x0, x1 = ds[0], ds[1]
    assert not np.allclose(x0, x1)


def test_depth10k_dataset(dtk_root):
    root, files = dtk_root
    ds = Depth10k(root, files)
    assert len(ds) == 3
    x = ds[0]
    assert x.shape == (3, 128, 416, 3)
    ds_gray = Depth10k(root, files, grayscale=True)
    assert ds_gray[0].shape == (3, 128, 416, 1)


def test_depth10k_target_size(dtk_root):
    """Resize path for non-native resolutions (BASELINE.json config 5 trains
    Depth10k at 640×192; the reference only supports 416×128)."""
    root, files = dtk_root
    ds = Depth10k(root, files, target_size=(640, 192))
    x = ds[0]
    assert x.shape == (3, 192, 640, 3)
    assert 0.0 <= x.min() and x.max() <= 1.0
    # intrinsics follow the resize (KittiDataset convention)
    assert ds.K[0, 2] == 320
    assert ds.K[1, 2] == 96
    ratio = np.mean([640 / 416, 192 / 128])
    assert ds.K[0, 0] == pytest.approx((2648.0 / 4.63461538462) * ratio)


def test_resize_bilinear_exact_on_linear_ramp():
    """Bilinear interpolation reproduces linear functions exactly, at any
    target size (align-corners: endpoints map to endpoints)."""
    from monodepth2_tpu.data.augment import resize_bilinear

    h, w = 16, 52
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (2.0 * xx + 3.0 * yy)[..., None]
    out = resize_bilinear(img, 640, 192)
    ys = np.linspace(0, h - 1, 192, dtype=np.float32)
    xs = np.linspace(0, w - 1, 640, dtype=np.float32)
    expect = (2.0 * xs[None, :] + 3.0 * ys[:, None])[..., None]
    np.testing.assert_allclose(out, expect, atol=1e-3)


def test_find_static(dtk_root):
    root, files = dtk_root
    ds = Depth10k(root, files, grayscale=True)
    non_static = find_static(ds, alpha=0.03)
    assert "strip0.png" not in non_static  # the static triplet is filtered
    assert len(non_static) == 2


def test_flipx_consistency():
    rng = np.random.default_rng(2)
    frames = [rng.uniform(size=(8, 12, 1)).astype(np.float32) for _ in range(3)]
    flipped = FlipX(p=1.0)(frames, rng)
    for f, g in zip(frames, flipped):
        np.testing.assert_array_equal(g, f[:, ::-1])
    same = FlipX(p=0.0)(frames, rng)
    for f, g in zip(frames, same):
        np.testing.assert_array_equal(g, f)


def test_dchain(kitti_root):
    d0 = KittiDataset(kitti_root, "00", target_size=(48, 24))
    d1 = KittiDataset(kitti_root, "01", target_size=(48, 24))
    chain = DChain([d0, d1])
    assert len(chain) == 6
    np.testing.assert_array_equal(chain[0], d0[0])
    np.testing.assert_array_equal(chain[3], d1[0])
    np.testing.assert_array_equal(chain[5], d1[2])
    with pytest.raises(IndexError):
        chain[6]


def test_dchain_carries_intrinsics(kitti_root):
    """fit() takes K/frame layout straight from a DChain (the reference uses
    the first child's K for the whole chain, src/Monodepth.jl:99,110-115)."""
    d0 = KittiDataset(kitti_root, "00", target_size=(48, 24))
    d1 = KittiDataset(kitti_root, "01", target_size=(48, 24))
    chain = DChain([d0, d1])
    np.testing.assert_array_equal(chain.K, d0.K)
    np.testing.assert_array_equal(chain.invK, d0.invK)
    assert chain.target_id == d0.target_id
    assert chain.source_ids == d0.source_ids


def test_dataloader_deterministic_across_worker_counts(kitti_root):
    """Same seed must produce identical batches regardless of num_workers —
    augmentation randomness is keyed per (seed, epoch, item), not drawn from
    a shared (thread-unsafe) generator."""
    from monodepth2_tpu.data import FlipX

    def batches(workers):
        ds = KittiDataset(
            kitti_root, "00", target_size=(48, 32), augmentations=FlipX(0.5)
        )
        loader = DataLoader(
            ds, batch_size=2, shuffle=True, seed=7, num_workers=workers
        )
        return [list(loader) for _ in range(2)]  # two epochs

    a, b = batches(1), batches(4)
    assert len(a) == 2 and len(a[0]) == 1  # 3 items, batch 2, drop_last
    for ea, eb in zip(a, b):
        for xa, xb in zip(ea, eb):
            np.testing.assert_array_equal(xa, xb)


def test_dataloader_batching():
    ds = SyntheticTriplets(n=10, target_size=(32, 16))
    loader = DataLoader(ds, batch_size=4, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0].shape == (4, 3, 16, 32, 1)


def test_dataloader_shuffles_per_epoch():
    ds = SyntheticTriplets(n=8, target_size=(16, 8))
    loader = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
    e1 = next(iter(loader))
    e2 = next(iter(loader))
    assert not np.allclose(e1, e2)  # different epoch → different order
    # determinism: fresh loader with same seed reproduces epoch 1
    loader2 = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
    np.testing.assert_array_equal(e1, next(iter(loader2)))


def test_synthetic_dataset_deterministic():
    ds = SyntheticTriplets(n=4, target_size=(32, 16))
    np.testing.assert_array_equal(ds[2], ds[2])
    assert ds[0].shape == (3, 16, 32, 1)


def test_synthetic_driving_geometry():
    """The driving renderer must be pixel-consistent with the training warp:
    warping each source with the GT depth + GT relative pose reconstructs the
    target far better than the identity (same oracle pattern as the
    reference's identity-warp test, SURVEY.md §4)."""
    import jax.numpy as jnp

    from monodepth2_tpu.data.synthetic import SyntheticDriving
    from monodepth2_tpu.ops import pixel_grid, warp_images

    ds = SyntheticDriving(n=1, target_size=(128, 64), seed=3)
    x = jnp.asarray(ds[0][None])
    gt = ds.gt_depth_for(0)
    assert gt.shape == (64, 128)
    assert gt.min() > 1.0 and gt.max() <= ds.wall_depth + 1e-3

    h, w = 64, 128
    min_d, max_d = 0.1, 100.0
    disp = (
        ((1.0 / gt - 1.0 / max_d) / (1.0 / min_d - 1.0 / max_d))
        .reshape(1, h, w, 1)
        .astype(np.float32)
    )
    transforms = [
        (jnp.asarray(R, jnp.float32)[None], jnp.asarray(t, jnp.float32)[None])
        for R, t in ds.gt_poses_for(0)
    ]
    warped = warp_images(
        jnp.asarray(disp), x, transforms,
        jnp.asarray(ds.K, jnp.float32), jnp.asarray(ds.invK, jnp.float32),
        pixel_grid(w, h), (0, 2), min_d, max_d,
    )
    tgt = x[:, 1]
    for sid, wimg in zip((0, 2), warped):
        id_err = float(jnp.mean(jnp.abs(x[:, sid] - tgt)))
        warp_err = float(jnp.mean(jnp.abs(wimg - tgt)))
        assert warp_err < id_err / 2.0


def test_ground_plane_geometry():
    """Rendered triplets must be consistent with the exposed GT depth:
    warping sources with the true depth/pose beats identity by >3x."""
    import jax.numpy as jnp

    from monodepth2_tpu.data.synthetic import SyntheticGroundPlane
    from monodepth2_tpu.ops import pixel_grid, warp_images

    ds = SyntheticGroundPlane(n=1, target_size=(96, 64), tx=0.15)
    assert ds.gt_depth.shape == (64, 96)
    x = jnp.asarray(ds[0][None])
    h, w = 64, 96
    K = jnp.asarray(ds.K, jnp.float32)
    invK = jnp.asarray(ds.invK, jnp.float32)
    grid = pixel_grid(w, h)
    gt = jnp.asarray(ds.gt_depth)
    disp = ((1.0 / gt - 0.01) / (10.0 - 0.01)).reshape(1, h, w, 1).astype(jnp.float32)
    R = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    t_prev = jnp.asarray([[[-0.15], [0.0], [0.0]]], jnp.float32)
    t_next = jnp.asarray([[[0.15], [0.0], [0.0]]], jnp.float32)
    warped = warp_images(
        disp, x, [(R, t_prev), (R, t_next)], K, invK, grid, (0, 2), 0.1, 100.0
    )
    tgt = x[:, 1]
    id_err = float(jnp.mean(jnp.abs(x[:, 0] - tgt)))
    for wimg in warped:
        warp_err = float(jnp.mean(jnp.abs(wimg - tgt)))
        assert warp_err < id_err / 3.0


def test_kitti_cache_decoded_identical_and_hits(kitti_root):
    ds_plain = KittiDataset(kitti_root, "00", target_size=(64, 32))
    ds_cached = KittiDataset(
        kitti_root, "00", target_size=(64, 32), cache_decoded=True
    )
    a1 = ds_cached[0]  # fill pass (also quantized)
    a2 = ds_cached[0]  # cache hit
    np.testing.assert_array_equal(a1, a2)
    # cached pixels match the uncached path to u8 quantization
    np.testing.assert_allclose(a1, ds_plain[0], atol=1 / 510 + 1e-7)
    assert len(ds_cached._cache) == 3  # one triplet's frames cached


def test_dtk_cache_decoded_identical(dtk_root):
    root, files = dtk_root
    ds = Depth10k(root, files, grayscale=True, cache_decoded=True)
    a1 = ds[0]
    a2 = ds[0]
    np.testing.assert_array_equal(a1, a2)
    ds_plain = Depth10k(root, files, grayscale=True)
    np.testing.assert_allclose(a1, ds_plain[0], atol=1 / 510 + 1e-7)


def test_find_static_batched_matches_per_item(dtk_root):
    """The batched find_static (one jitted dispatch per chunk, padded tail)
    must select exactly the triplets the reference's per-item scoring does
    (src/dtk.jl:59-64); exercised with a batch smaller than the dataset so
    both the chunking and the tail padding paths run."""
    import jax.numpy as jnp

    from monodepth2_tpu.ops.losses import automasking_loss

    root, files = dtk_root
    ds = Depth10k(root, files, grayscale=True)
    per_item = {}
    for i in range(len(ds)):
        x = jnp.asarray(ds[i][None])
        per_item[ds.files[i]] = float(
            jnp.mean(automasking_loss(x, x[:, ds.target_id], ds.source_ids))
        )
    for alpha in (0.001, 0.03, 10.0):
        expect = [f for f in files if per_item[f] > alpha]
        got = find_static(ds, alpha, batch_size=2)
        assert got == expect, (alpha, got, expect)


def test_dataloader_abandoned_iterator_no_thread_leak():
    """Regression (VERDICT r2 weak #4): a consumer that stops draining
    mid-epoch (fit(max_steps=...) breaks out of the batch loop) must not
    leave the producer thread blocked forever on a full queue."""
    import threading
    import time

    ds = [np.zeros((3, 8, 8, 1), np.float32)] * 64
    dl = DataLoader(ds, batch_size=2, shuffle=False, prefetch=1, num_workers=1)
    before = threading.active_count()
    it = iter(dl)
    next(it)  # producer now blocks trying to put batch 3 into the full queue
    it.close()  # GeneratorExit -> finally -> stop_evt.set()
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_placement_prefetch_overlaps_ahead_of_use():
    """placement_prefetch must dispatch `size` placements before the first
    yield and exactly one more per batch consumed — the double-buffer window
    that hides H2D under compute on the mesh path (training/loop.py)."""
    from monodepth2_tpu.data import placement_prefetch

    placed = []

    def put(b):
        placed.append(b)
        return b * 10

    it = placement_prefetch(iter([1, 2, 3, 4]), put, size=2)
    got = []
    assert placed == []  # lazy until first pull
    got.append(next(it))
    assert placed == [1, 2, 3]  # 2 ahead + the refill for the one consumed
    got.extend(it)
    assert got == [10, 20, 30, 40]
    assert placed == [1, 2, 3, 4]


def test_placement_prefetch_short_iterator():
    from monodepth2_tpu.data import placement_prefetch

    assert list(placement_prefetch(iter([7]), lambda b: b + 1, size=3)) == [8]
    assert list(placement_prefetch(iter([]), lambda b: b, size=2)) == []


def test_accepts_rng_signature_probe():
    """The rng capability is probed ONCE from the __getitem__ signature
    (data.loader.accepts_rng); (idx, rng), *args, and defaulted-rng datasets
    are rng-capable, classic 1-arg and keyword-only-rng datasets are not."""
    from monodepth2_tpu.data.loader import accepts_rng

    class OneArg:
        def __getitem__(self, i):
            return i

    class TwoArg:
        def __getitem__(self, i, rng):
            return i

    class DefaultRng:
        def __getitem__(self, i, rng=None):
            return i

    class VarArgs:
        def __getitem__(self, *args):
            return args[0]

    class KwOnlyRng:
        def __getitem__(self, i, *, rng=None):
            return i

    assert not accepts_rng(OneArg())
    assert accepts_rng(TwoArg())
    assert accepts_rng(DefaultRng())
    assert accepts_rng(VarArgs())
    assert not accepts_rng(KwOnlyRng())
    assert not accepts_rng([1, 2, 3])  # builtin list: classic 1-arg


def test_loader_propagates_typeerror_from_rng_dataset():
    """Regression: a TypeError raised INSIDE a two-arg __getitem__ (a genuine
    dataset bug) must propagate, not be silently retried without the rng —
    the old `except TypeError` fallback masked it and corrupted the
    reproducibility contract."""

    class Buggy:
        def __len__(self):
            return 4

        def __getitem__(self, i, rng):
            raise TypeError("genuine dataset bug")

    dl = DataLoader(Buggy(), batch_size=2, shuffle=False, num_workers=1)
    with pytest.raises(TypeError, match="genuine dataset bug"):
        next(iter(dl))
