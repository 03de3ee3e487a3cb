"""Batch-size throughput scaling on one chip (BASELINE.md table).

Same methodology as bench.py: scanned steps_per_call dispatches chained
through donated state, one float() sync per window, best of two windows.

Run on the real chip:  python tools/batch_scaling_bench.py [--batches 4,16,64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(batch, steps_per_call=10, remat=False, size=(416, 128)):
    import jax
    import jax.numpy as jnp

    from monodepth2_tpu.models import Model
    from monodepth2_tpu.training import (
        TrainConfig,
        TrainContext,
        create_train_state,
        make_scanned_train_step,
    )

    cfg = TrainConfig(
        target_size=size, batch_size=batch, in_channels=1,
        compute_dtype="bfloat16", warp_method="pallas",
        steps_per_call=steps_per_call, remat=remat,
    )
    model = Model.create(depth=18, in_channels=1)
    state, tx = create_train_state(model, cfg)
    K = np.asarray(
        [[482.0, 0, cfg.width / 2], [0, 482.0, cfg.height / 2], [0, 0, 1.0]]
    )
    ctx = TrainContext.create(K, cfg.width, cfg.height)
    step = jax.jit(make_scanned_train_step(model, tx, ctx, cfg), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    stack = jnp.asarray(
        rng.uniform(size=(steps_per_call, batch, 3, cfg.height, cfg.width, 1)),
        jnp.float32,
    )
    for _ in range(2):
        state, metrics, _ = step(state, stack)
        _ = float(metrics["loss"][-1])
    windows = []
    for _ in range(2):
        n_calls = max(2, 20 // steps_per_call)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, metrics, _ = step(state, stack)
        _ = float(metrics["loss"][-1])
        windows.append((time.perf_counter() - t0) / (n_calls * steps_per_call))
    dt = min(windows)
    return {"batch": batch, "remat": remat, "size": list(size), "ms_per_step": round(dt * 1e3, 2),
            "img_per_sec": round(batch / dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,16,64")
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--remat", action="store_true",
                    help="measure every batch with remat (large resolutions)")
    ap.add_argument("--remat64", action="store_true",
                    help="also measure batch 64 with remat")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    rows = []
    size = (args.width, args.height)
    for b in (int(x) for x in args.batches.split(",")):
        r = measure(b, remat=args.remat, size=size)
        rows.append(r)
        print(json.dumps(r), flush=True)
    if args.remat64:
        r = measure(64, remat=True, size=size)
        rows.append(r)
        print(json.dumps(r), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
