"""Per-item-intrinsics evidence: heterogeneous-K chain, miscalibrated vs not.

The reference trains a whole DChain with the FIRST sequence's K
(src/Monodepth.jl:99). This experiment quantifies what that approximation
costs and what per_item_K recovers, on honest geometry: two SyntheticDriving
datasets whose cameras genuinely differ (focal_scale renders through a
different calibration — frames, GT depth, and poses all consistent).

Conditions (identical data order, seeds, recipe-C stabilizers):
  A "first-child-K"  — per_item_K=False: every item warps with dataset A's K
                        (the reference's behavior; dataset B is miscalibrated
                        by the focal ratio throughout training)
  B "per-item-K"     — per_item_K=True: each item warps with its own K

Score: median-scaled AbsRel / delta<1.25 on held-out val scenes of EACH
calibration separately. Expectation: B matches A on the A-subset and beats
it on the B-subset.

Usage (TPU):
    python tools/per_item_k_experiment.py --steps 5000 --out runs/pik
Writes <out>/results.json and per-condition checkpoints/logs.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--n-scenes", type=int, default=128, help="per dataset")
    ap.add_argument("--n-val", type=int, default=12, help="per dataset")
    ap.add_argument("--focal-scale", type=float, default=0.7)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--steps-per-call", type=int, default=10)
    ap.add_argument("--out", default="runs/per_item_k")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--conditions", default="first_child_K,per_item_K")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from monodepth2_tpu.data import DChain, SyntheticDriving
    from monodepth2_tpu.eval import eval_depth_accuracy
    from monodepth2_tpu.training import TrainConfig
    from monodepth2_tpu.training.checkpoint import latest_checkpoint
    from monodepth2_tpu.training.loop import fit

    os.makedirs(args.out, exist_ok=True)
    size = (args.width, args.height)

    def make_chain():
        # fresh per condition: the renderer cache would otherwise pin ~150 MB
        a = SyntheticDriving(n=args.n_scenes, target_size=size, seed=0)
        b = SyntheticDriving(
            n=args.n_scenes, target_size=size, seed=5000,
            focal_scale=args.focal_scale,
        )
        return DChain([a, b])

    # held-out val scenes per calibration
    vals = {}
    for tag, seed, fs in (
        ("A", 9999, 1.0),
        ("B", 10999, args.focal_scale),
    ):
        ds = SyntheticDriving(
            n=args.n_val, target_size=size, seed=seed, focal_scale=fs
        )
        vals[tag] = (
            [ds[i][ds.target_id] for i in range(len(ds))],
            [ds.gt_depth_for(i) for i in range(len(ds))],
        )

    base = TrainConfig(
        target_size=size,
        batch_size=args.batch_size,
        epochs=10_000,  # max_steps terminates
        lr=1e-4,
        seed=42,
        # recipe C (VALIDATION.md): the stabilizer set that makes
        # from-scratch SSL converge on these scenes
        min_depth=1.0,
        max_depth=80.0,
        disp_reg=0.01,
        disp_reg_steps=2500,
        compute_dtype="bfloat16",
        steps_per_call=args.steps_per_call,
        log_every=500,
        save_every=0,
    )

    results = {"config": vars(args)}
    for cond in args.conditions.split(","):
        per_item = cond == "per_item_K"
        cdir = os.path.join(args.out, cond)
        cfg = dataclasses.replace(
            base,
            per_item_K=per_item,
            log_dir=os.path.join(cdir, "logs"),
            save_dir=os.path.join(cdir, "ckpts"),
        )
        chain = make_chain()
        t0 = time.time()
        fit(cfg, chain, max_steps=args.steps, verbose=False, progress=False)
        wall = time.time() - t0
        ck = latest_checkpoint(cfg.save_dir)
        scores = {}
        for tag, (images, gts) in vals.items():
            scores[tag] = eval_depth_accuracy(cfg, ck, images, gts)
        results[cond] = {"wall_s": round(wall, 1), "val": scores}
        print(json.dumps({cond: results[cond]}), flush=True)
        with open(os.path.join(args.out, "results.json"), "w") as f:
            json.dump(results, f, indent=2)

    if all(c in results for c in ("first_child_K", "per_item_K")):
        a = results["first_child_K"]["val"]
        b = results["per_item_K"]["val"]
        print(
            json.dumps(
                {
                    "summary": {
                        "A_subset_absrel": [a["A"]["abs_rel"], b["A"]["abs_rel"]],
                        "B_subset_absrel": [a["B"]["abs_rel"], b["B"]["abs_rel"]],
                        "order": ["first_child_K", "per_item_K"],
                    }
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
