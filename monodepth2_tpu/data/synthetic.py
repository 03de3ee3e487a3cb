"""Deterministic synthetic triplet dataset for tests and benchmarks.

Generates textured scenes rendered at three horizontally-shifted camera
positions — a stand-in for KITTI when no data is on disk (the reference has
no equivalent; its tests never touch data, SURVEY.md §4)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class SyntheticTriplets:
    def __init__(
        self,
        n: int = 64,
        target_size: Tuple[int, int] = (416, 128),
        channels: int = 1,
        shift: int = 2,
        seed: int = 0,
    ):
        self.n = n
        self.width, self.height = target_size
        self.channels = channels
        self.shift = shift
        self.seed = seed
        f = 0.58 * self.width * 2  # KITTI-ish focal after resize
        self.K = np.asarray(
            [[f, 0, self.width / 2], [0, f, self.height / 2], [0, 0, 1.0]],
            np.float64,
        )
        self.invK = np.linalg.inv(self.K)
        self.target_id = 1
        self.source_ids = (0, 2)

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int, rng: Optional[np.random.Generator] = None):
        g = np.random.default_rng(self.seed * 100003 + i)
        h, w, c = self.height, self.width, self.channels
        base = g.uniform(size=(h, w + 2 * self.shift, c)).astype(np.float32)
        # smooth into image-like texture
        for axis in (0, 1):
            base = (
                base
                + np.roll(base, 1, axis=axis)
                + np.roll(base, -1, axis=axis)
            ) / 3.0
        base /= base.max()
        s = self.shift
        frames = [
            base[:, 2 * s : 2 * s + w],
            base[:, s : s + w],
            base[:, 0:w],
        ]
        return np.stack(frames, axis=0)  # (3,H,W,C)
