"""Triplet-consistent augmentations (reference: Augmentations.jl FlipX(0.5)
applied to the whole triplet, src/Monodepth.jl:84 + src/kitty.jl:53-54)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class FlipX:
    """Horizontally flip all frames of a triplet with probability p.

    Flipping all frames together preserves the epipolar geometry of the
    triplet (a per-frame flip would corrupt the pose-learning signal).
    """

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, frames: List[np.ndarray], rng: np.random.Generator):
        """frames: list of (H,W,C) arrays; one coin flip for the whole list."""
        if rng.uniform() < self.p:
            return [np.ascontiguousarray(f[:, ::-1]) for f in frames]
        return frames


class Compose:
    def __init__(self, *transforms):
        self.transforms = transforms

    def __call__(self, frames, rng):
        for t in self.transforms:
            frames = t(frames, rng)
        return frames
