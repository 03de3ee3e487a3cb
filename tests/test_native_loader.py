"""Native C++ decode/resize pipeline vs the PIL reference path."""

import numpy as np
import pytest
from PIL import Image

from monodepth2_tpu.data import KittiDataset, native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def png_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    arr = (rng.uniform(size=(64, 96, 3)) * 255).astype(np.uint8)
    p = str(d / "test.png")
    Image.fromarray(arr, "RGB").save(p)
    return p, arr


def test_decode_rgb_identity_size(png_file):
    p, arr = png_file
    out = native.load_resize(p, 96, 64, 3)
    np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0, atol=1e-6)


def test_decode_grayscale_matches_pil(png_file):
    p, arr = png_file
    out = native.load_resize(p, 96, 64, 1)
    pil = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
    # ITU-R 601 luma: PIL rounds to uint8, native keeps float — tol 1/255
    np.testing.assert_allclose(out[..., 0], pil, atol=1.5 / 255)


def test_resize_matches_pil(png_file):
    p, arr = png_file
    out = native.load_resize(p, 48, 32, 3)
    pil = np.asarray(
        Image.open(p).resize((48, 32), Image.BILINEAR), np.float32
    ) / 255.0
    # PIL's bilinear uses half-pixel centers + uint8 rounding; native uses
    # align-corners float — agree to a couple of gray levels
    assert np.mean(np.abs(out - pil)) < 3.0 / 255


def test_strip_loader(tmp_path):
    rng = np.random.default_rng(1)
    strip = (rng.uniform(size=(128, 1248, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "strip.png")
    Image.fromarray(strip, "RGB").save(p)
    out = native.load_strip(p, 416, 128, 3, 3)
    assert out.shape == (3, 128, 416, 3)
    np.testing.assert_allclose(
        out[1], strip[:, 416:832].astype(np.float32) / 255.0, atol=1e-6
    )


def test_triplet_batch(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    for i in range(6):
        arr = (rng.uniform(size=(32, 48)) * 255).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(arr, "L").save(p)
        paths.append(p)
    out = native.load_triplet_batch(paths, 48, 32, 1, n_threads=2)
    assert out.shape == (2, 3, 32, 48, 1)
    first = native.load_resize(paths[0], 48, 32, 1)
    np.testing.assert_array_equal(out[0, 0], first)


def test_batch_decode_failure_reported(tmp_path):
    with pytest.raises(IOError):
        native.load_triplet_batch(
            [str(tmp_path / "missing.png")] * 3, 8, 8, 1
        )


def test_kitti_uses_native(tmp_path):
    root = tmp_path / "kitti"
    img_dir = root / "sequences" / "00" / "image_0"
    img_dir.mkdir(parents=True)
    (root / "sequences" / "00" / "calib.txt").write_text(
        "P0: 700.0 0.0 32.0 0.0 0.0 700.0 16.0 0.0 0.0 0.0 1.0 0.0\n"
    )
    rng = np.random.default_rng(3)
    for i in range(3):
        arr = (rng.uniform(size=(32, 64)) * 255).astype(np.uint8)
        Image.fromarray(arr, "L").save(img_dir / f"{i:06d}.png")

    ds_native = KittiDataset(str(root), "00", target_size=(48, 24), use_native=True)
    ds_pil = KittiDataset(str(root), "00", target_size=(48, 24), use_native=False)
    assert ds_native._native is not None
    a, b = ds_native[0], ds_pil[0]
    assert a.shape == b.shape == (3, 24, 48, 1)
    assert np.mean(np.abs(a - b)) < 3.0 / 255
