"""Deterministic synthetic triplet datasets for tests and benchmarks.

`SyntheticTriplets`: textured scenes at three horizontally-shifted camera
positions — a fast stand-in for KITTI when no data is on disk (the reference
has no equivalent; its tests never touch data, SURVEY.md §4).

`SyntheticGroundPlane`: geometrically-consistent triplets rendered from a
known depth map (fronto-parallel wall + ground plane) under a known lateral
camera translation, with the ground-truth depth exposed — lets the
AbsRel/δ eval harness validate that training actually learns depth without
any real dataset.
"""

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


class SyntheticGroundPlane:
    """Triplets with exact geometry: a textured scene at known depth
    (ground plane meeting a far wall), viewed from laterally-shifted cameras.

    Rendering inverts the training warp: for each source camera at lateral
    offset ±tx, the source image is the target texture sampled at
    u' = u + fx·tx/depth(v) (pure horizontal parallax). `gt_depth` is the
    (H, W) metric depth of the target view, so eval_depth_accuracy can score
    a trained model with zero external data.
    """

    def __init__(
        self,
        n: int = 64,
        target_size: Tuple[int, int] = (416, 128),
        channels: int = 1,
        tx: float = 0.15,
        horizon: float = 0.45,
        wall_depth: float = 40.0,
        camera_height: float = 1.5,
        seed: int = 0,
    ):
        self.n = n
        self.width, self.height = target_size
        self.channels = channels
        self.tx = tx
        self.seed = seed
        f = 0.58 * self.width * 2
        self.K = np.asarray(
            [[f, 0, self.width / 2], [0, f, self.height / 2], [0, 0, 1.0]],
            np.float64,
        )
        self.invK = np.linalg.inv(self.K)
        self.target_id = 1
        self.source_ids = (0, 2)

        # depth map: rows above the horizon see the far wall; below, a ground
        # plane at camera_height: depth = fy * h_cam / (v - horizon_row)
        h, w = self.height, self.width
        v = np.arange(h, dtype=np.float64)
        horizon_row = horizon * h
        fy = self.K[1, 1]
        ground = fy * camera_height / np.maximum(v - horizon_row, 1e-6)
        depth_rows = np.where(v <= horizon_row, wall_depth, np.minimum(ground, wall_depth))
        self.gt_depth = np.tile(depth_rows[:, None], (1, w)).astype(np.float32)

    def __len__(self) -> int:
        return self.n

    def _texture(self, i: int) -> np.ndarray:
        g = np.random.default_rng(self.seed * 99991 + i)
        h, w, c = self.height, self.width, self.channels
        pad = 64
        tex = g.uniform(size=(h, w + 2 * pad, c)).astype(np.float32)
        for _ in range(2):
            for axis in (0, 1):
                tex = (tex + np.roll(tex, 1, axis) + np.roll(tex, -1, axis)) / 3.0
        tex -= tex.min()
        tex /= max(tex.max(), 1e-6)
        return tex, pad

    def __getitem__(self, i: int, rng: Optional[np.random.Generator] = None):
        tex, pad = self._texture(i)
        h, w = self.height, self.width
        fx = self.K[0, 0]
        target = tex[:, pad : pad + w]
        # per-row horizontal parallax in pixels: fx * tx / depth(v)
        shift = fx * self.tx / self.gt_depth[:, 0]  # (H,)
        xs = np.arange(w, dtype=np.float64)[None, :] + pad

        def render(sign: float) -> np.ndarray:
            # sample texture at u + sign*shift with linear interpolation
            u = xs + sign * shift[:, None]
            u = np.clip(u, 0, tex.shape[1] - 1)
            x0 = np.floor(u).astype(np.int64)
            x1 = np.minimum(x0 + 1, tex.shape[1] - 1)
            wu = (u - x0).astype(np.float32)[..., None]
            rows = np.arange(h)[:, None]
            return tex[rows, x0] * (1 - wu) + tex[rows, x1] * wu

        prev = render(+1.0)   # camera moved -tx: scene appears shifted +
        nxt = render(-1.0)
        return np.stack([prev, target, nxt], axis=0).astype(np.float32)


class SyntheticBlocks(SyntheticGroundPlane):
    """Richer scenes: the ground-plane world plus floating textured blocks at
    random depths, rendered with PER-PIXEL parallax and high-frequency
    texture — a harder, more KITTI-like benchmark than the row-constant
    `SyntheticGroundPlane` (whose weak texture admits degenerate SSL optima,
    see VALIDATION.md). Per-scene `gt_depth_for(i)` exposes the depth map.
    """

    def __init__(self, n: int = 64, target_size: Tuple[int, int] = (416, 128),
                 channels: int = 1, tx: float = 0.15, n_blocks: int = 6,
                 seed: int = 0, **kw):
        super().__init__(n=n, target_size=target_size, channels=channels,
                         tx=tx, seed=seed, **kw)
        self.n_blocks = n_blocks

    def gt_depth_for(self, i: int) -> np.ndarray:
        g = np.random.default_rng(self.seed * 77003 + i)
        depth = self.gt_depth.copy()
        h, w = depth.shape
        for _ in range(self.n_blocks):
            bw = int(g.uniform(0.08, 0.25) * w)
            bh = int(g.uniform(0.15, 0.5) * h)
            x0 = g.integers(0, w - bw)
            y0 = g.integers(0, h - bh)
            d = g.uniform(4.0, 25.0)
            # blocks occlude only what is behind them
            region = depth[y0 : y0 + bh, x0 : x0 + bw]
            depth[y0 : y0 + bh, x0 : x0 + bw] = np.minimum(region, d)
        return depth

    def _texture(self, i: int):
        g = np.random.default_rng(self.seed * 99991 + i)
        h, w, c = self.height, self.width, self.channels
        pad = 64
        low = g.uniform(size=(h, w + 2 * pad, c)).astype(np.float32)
        for _ in range(2):
            for axis in (0, 1):
                low = (low + np.roll(low, 1, axis) + np.roll(low, -1, axis)) / 3.0
        high = g.uniform(size=(h, w + 2 * pad, c)).astype(np.float32)
        tex = 0.7 * low + 0.3 * high  # keep high-frequency energy
        tex -= tex.min()
        tex /= max(tex.max(), 1e-6)
        return tex, pad

    def __getitem__(self, i: int, rng: Optional[np.random.Generator] = None):
        tex, pad = self._texture(i)
        h, w = self.height, self.width
        fx = self.K[0, 0]
        depth = self.gt_depth_for(i)
        target = tex[:, pad : pad + w]
        shift = fx * self.tx / depth  # (H, W) per-pixel parallax
        xs = np.arange(w, dtype=np.float64)[None, :] + pad
        rows = np.arange(h)[:, None]

        def render(sign: float) -> np.ndarray:
            u = np.clip(xs + sign * shift, 0, tex.shape[1] - 1)
            x0 = np.floor(u).astype(np.int64)
            x1 = np.minimum(x0 + 1, tex.shape[1] - 1)
            wu = (u - x0).astype(np.float32)[..., None]
            return tex[rows, x0] * (1 - wu) + tex[rows, x1] * wu

        prev = render(+1.0)
        nxt = render(-1.0)
        return np.stack([prev, target, nxt], axis=0).astype(np.float32)
