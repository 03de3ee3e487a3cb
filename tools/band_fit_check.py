"""Column-banded warp fallback-rate check at a given resolution.

The Pallas kernel's fast path restricts each Q-point chunk's x-contraction
to a CBAND-column window; one `lax.cond` per call falls back to the exact
full-W kernel when ANY chunk overflows (ops/pallas/grid_sample_kernel.py).
The constants were swept at W=416 (VERDICT r4 missing #2) — this tool
measures, at an arbitrary resolution, how often real training-shaped warps
would take the fallback: it reproduces the training loss's exact folded
(Src·S·N, HW) uv field (training/loss.py) from a checkpoint (or random
init — the worst case, maximal uv spread) and evaluates the kernel's own
`fits` predicate for both chunk sizes (bf16 Q / fp32 Q_PRECISE).

Runs fine on CPU (pure jnp preprocessing; the kernel itself is not run).

    python tools/band_fit_check.py --width 640 --height 192 \
        [--checkpoint runs/x/ckpts/ckpt-1000] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--n-batches", type=int, default=8)
    ap.add_argument("--checkpoint", default=None,
                    help="trained checkpoint; default = random init (worst "
                         "case: untrained disparity/pose → widest uv spread)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from monodepth2_tpu.data import SyntheticDriving
    from monodepth2_tpu.models import Model
    from monodepth2_tpu.ops.geometry import (
        backproject,
        compose_transform,
        disparity_to_depth,
        project,
    )
    from monodepth2_tpu.nn.core import upsample_bilinear
    from monodepth2_tpu.ops.pallas import grid_sample_kernel as kmod
    from monodepth2_tpu.training import TrainConfig, TrainContext, create_train_state

    size = (args.width, args.height)
    w, h = size
    cfg = TrainConfig(target_size=size, batch_size=args.batch_size)
    model = Model.create(depth=cfg.encoder_depth, in_channels=cfg.in_channels,
                         scale_levels=cfg.scale_levels)
    state, _ = create_train_state(model, cfg)
    params, stats = state.params, state.stats
    if args.checkpoint:
        from monodepth2_tpu.eval import load_model

        model, params, stats = load_model(cfg, args.checkpoint)

    ds = SyntheticDriving(
        n=args.batch_size * args.n_batches, target_size=size, seed=args.seed,
    )
    K = np.asarray(ds.K)
    ctx = TrainContext.create(K, w, h)
    S = len(cfg.scales)

    @jax.jit
    def uv_of(frames):
        """The training loss's folded (Src·S·N, HW, 2) uv field
        (training/loss.py:104-135), reproduced for the fits probe."""
        disparities, poses, _ = model(
            params, stats, frames, cfg.source_ids, cfg.target_id, train=False
        )
        transforms = [
            compose_transform(r, t, invert=sid < cfg.target_id)
            for (r, t), sid in zip(poses, cfg.source_ids)
        ]
        n = frames.shape[0]
        disps_full = jnp.stack(
            [
                d if d.shape[1] == h and d.shape[2] == w
                else upsample_bilinear(d, size=(h, w))
                for d in disparities
            ],
            axis=0,
        )
        depth = disparity_to_depth(disps_full, cfg.min_depth, cfg.max_depth)
        points = backproject(depth.reshape(S * n, h * w), ctx.invK, ctx.grid)
        uvs = []
        for R, t in transforms:
            Rt = jnp.tile(R, (S, 1, 1))
            tt = jnp.tile(t, (S, 1, 1))
            uvs.append(project(points, ctx.K, Rt, tt, w, h))
        return jnp.concatenate(uvs, axis=0)

    def fits_of(uv, q):
        """The kernel's own per-call fallback predicate at chunk size q."""
        x0 = kmod._coords((h, w), uv)[0]
        x0 = kmod._to_cm(x0, h, w)
        x0p, _ = kmod._pad_points([x0], uv.shape[1], q, modes=["edge"])
        _, fits, _, _ = kmod._window_info(x0p[0], w, q)
        return bool(fits)

    results = {"config": vars(args), "W": w, "H": h,
               "CBAND": kmod.CBAND, "CSTRIDE": kmod.CSTRIDE,
               "Q": kmod.Q, "Q_PRECISE": kmod.Q_PRECISE}
    counts = {"bf16": 0, "fp32": 0}
    for b in range(args.n_batches):
        frames = jnp.asarray(
            np.stack([
                ds[i] for i in range(b * args.batch_size, (b + 1) * args.batch_size)
            ]),
            jnp.float32,
        )
        uv = uv_of(frames)
        counts["bf16"] += fits_of(uv, kmod.Q)
        counts["fp32"] += fits_of(uv, kmod.Q_PRECISE)
    for k, v in counts.items():
        results[f"fit_rate_{k}"] = v / args.n_batches
    results["fallback_rate_bf16"] = 1.0 - results["fit_rate_bf16"]
    results["fallback_rate_fp32"] = 1.0 - results["fit_rate_fp32"]
    print(json.dumps(results), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
