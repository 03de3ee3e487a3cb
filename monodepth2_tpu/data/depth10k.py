"""CommaAI Depth10k triplet dataset + static-scene curation
(reference: src/dtk.jl).

Each file is a 1248-wide strip of 3 horizontally-concatenated 416×128 frames.
Fixed intrinsics: focal 2648/4.63461538462, principal point at center
(reference src/dtk.jl:16-22). `find_static` flags triplets whose identity
automasking loss exceeds α — stationary-camera scenes that would teach the
network infinite depth (reference src/dtk.jl:51-69).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

DTK_WIDTH, DTK_HEIGHT = 416, 128
DTK_FOCAL = 2648.0 / 4.63461538462


class Depth10k:
    def __init__(
        self,
        image_dir: str,
        image_files: Sequence[str],
        augmentations=None,
        grayscale: bool = False,
        use_native: bool = True,
        target_size: Optional[Tuple[int, int]] = None,
        cache_decoded: bool = False,
    ):
        """target_size (width, height) resizes each frame AFTER the strip
        split; the focal is rescaled by the mean target/native ratio with the
        principal point recentered (same convention as KittiDataset /
        src/kitty.jl:27-29). None keeps the native 416×128 (the reference's
        only mode, src/dtk.jl:16-22)."""
        self.dir = image_dir
        self.files = list(image_files)
        self.augmentations = augmentations
        self.grayscale = grayscale
        self.width, self.height = target_size or (DTK_WIDTH, DTK_HEIGHT)

        from . import native as _native

        self._native = _native if (use_native and _native.available()) else None
        ratio = float(
            np.mean([self.width / DTK_WIDTH, self.height / DTK_HEIGHT])
        )
        f = DTK_FOCAL * ratio
        self.K = np.asarray(
            [
                [f, 0, self.width / 2.0],
                [0, f, self.height / 2.0],
                [0, 0, 1.0],
            ],
            np.float64,
        )
        self.invK = np.linalg.inv(self.K)
        self.target_id = 1
        self.source_ids = (0, 2)
        # RAM cache of decoded+resized uint8 triplets (see KittiDataset:
        # host decode is marginal against the chip; epochs after the first
        # run decode-free). u8-quantized on the fill pass too so all epochs
        # see identical pixels.
        import threading

        self._cache = {} if cache_decoded else None
        self._cache_lock = threading.Lock() if cache_decoded else None

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int, rng: Optional[np.random.Generator] = None):
        cached = self._decode_cached(i)
        if self.augmentations is not None:
            rng = rng or np.random.default_rng()
            cached = np.stack(self.augmentations(list(cached), rng), axis=0)
        return cached

    def _decode_cached(self, i: int) -> np.ndarray:
        if self._cache is not None:
            with self._cache_lock:
                hit = self._cache.get(i)
            if hit is not None:
                return hit.astype(np.float32) / 255.0
        frames = self._decode(i)
        out = np.stack(frames, axis=0)  # (3,H,W,C)
        if self._cache is not None:
            u8 = np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)
            with self._cache_lock:
                self._cache[i] = u8
            return u8.astype(np.float32) / 255.0
        return out

    def _decode(self, i: int):
        path = os.path.join(self.dir, self.files[i])
        c = 1 if self.grayscale else 3
        if self._native is not None:
            stacked = self._native.load_strip(path, DTK_WIDTH, DTK_HEIGHT, 3, c)
            frames = [stacked[j] for j in range(3)]
        else:
            with Image.open(path) as im:
                im = im.convert("L" if self.grayscale else "RGB")
                strip = np.asarray(im, np.float32) / 255.0
            if strip.ndim == 2:
                strip = strip[..., None]
            frames = [
                strip[:, j * DTK_WIDTH : (j + 1) * DTK_WIDTH] for j in range(3)
            ]
        if (self.width, self.height) != (DTK_WIDTH, DTK_HEIGHT):
            from .augment import resize_bilinear

            frames = [resize_bilinear(f, self.width, self.height) for f in frames]
        return frames


def find_static(
    dataset, alpha: float, progress: bool = False, batch_size: int = 64
) -> List[str]:
    """Return the filenames of NON-static triplets (identity automasking loss
    above `alpha`) — reference find_static, src/dtk.jl:51-69.

    The reference scores one triplet per call (src/dtk.jl:59-64); here
    triplets are scored `batch_size` at a time in ONE jitted dispatch per
    chunk (the tail chunk is padded to the same shape so exactly one program
    is ever compiled) — a device round-trip per file would cost minutes over
    Depth10k's ~10k files where one batched pass is seconds."""
    import jax
    import jax.numpy as jnp

    from ..ops.losses import automasking_loss

    target_id = dataset.target_id
    source_ids = tuple(dataset.source_ids)

    @jax.jit
    def per_item_loss(x):  # (B,3,H,W,C) -> (B,)
        l = automasking_loss(x, x[:, target_id], source_ids)
        return jnp.mean(l, axis=tuple(range(1, l.ndim)))

    n = len(dataset)
    non_static = []
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        items = [np.asarray(dataset[i]) for i in idx]
        while len(items) < batch_size:  # pad tail; scores discarded below
            items.append(items[-1])
        losses = np.asarray(per_item_loss(jnp.asarray(np.stack(items))))
        for j, i in enumerate(idx):
            if float(losses[j]) > alpha:
                non_static.append(dataset.files[i])
        if progress:
            print(
                f"find_static {idx[-1] + 1}/{n}: kept {len(non_static)}"
            )
    return non_static
