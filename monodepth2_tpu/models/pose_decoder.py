"""Axis-angle pose decoder.

Reference: src/pose_decoder.jl — squeeze each of the 2 last-stage feature maps
with a 1×1 conv→256 ReLU, concatenate (512ch), two 3×3 conv-ReLU 256 stages,
1×1 conv→6, global spatial mean, ×1e-2 scaling, split into rotation vector
(N,3) and translation (N,3,1). (The reference's Pose struct exists only to
work around Zygote tuple handling, README.md:53-54 — a plain tuple is fine
under JAX.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Conv, Module

Array = jax.Array


@dataclass(frozen=True)
class PoseDecoder(Module):
    in_channels: int = 512
    n_input_features: int = 2
    # forward-motion prior: initialize the head's z-translation bias so the
    # predicted (earlier→later) transform starts at tz = tz_init instead of 0.
    # Breaks the t≈0 symmetry that locks from-scratch SSL into the far-flat
    # attractor (VALIDATION.md) — the same move as the reference's rvec init
    # (0,0,0.01) in simple_depth (src/simple_depth.jl:12-14). Note the
    # convention: the later camera is AHEAD, so p_later = R·p_earlier + t has
    # tz < 0 for forward motion — pass a negative value.
    tz_init: float = 0.0

    def _parts(self):
        squeeze = Conv(self.in_channels, 256, 1, 1, 0, act=jax.nn.relu)
        p1 = Conv(self.n_input_features * 256, 256, 3, 1, 1, act=jax.nn.relu)
        p2 = Conv(256, 256, 3, 1, 1, act=jax.nn.relu)
        p3 = Conv(256, 6, 1, 1, 0)
        return squeeze, p1, p2, p3

    def init(self, key):
        parts = self._parts()
        names = ["squeeze", "p1", "p2", "p3"]
        keys = jax.random.split(key, 4)
        params = {n: l.init(k)[0] for n, l, k in zip(names, parts, keys)}
        if self.tz_init:
            # undo the ×1e-2 output scaling on the raw bias
            params["p3"]["b"] = (
                params["p3"]["b"].at[5].set(self.tz_init / 1e-2)
            )
        return params, {}

    def __call__(
        self, params, stats, features: Sequence[Array], train: bool = False
    ) -> Tuple[Tuple[Array, Array], dict]:
        """features: 2 maps (N,h,w,C) ordered (earlier frame, later frame).
        Returns ((rvec (N,3), tvec (N,3,1)), stats)."""
        squeeze, p1, p2, p3 = self._parts()
        squeezed = jnp.concatenate(
            [squeeze(params["squeeze"], {}, f)[0] for f in features], axis=-1
        )
        y, _ = p1(params["p1"], {}, squeezed)
        y, _ = p2(params["p2"], {}, y)
        y, _ = p3(params["p3"], {}, y)
        pose = jnp.mean(y, axis=(1, 2)) * 1e-2  # (N,6)
        rvec = pose[:, :3]
        tvec = pose[:, 3:][..., None]  # (N,3,1)
        return (rvec, tvec), stats
