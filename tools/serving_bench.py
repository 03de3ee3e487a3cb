"""Serving-path throughput: exported StableHLO artifact vs live jit.

Measures batched disparity+depth inference (the `cli.py eval-*` / serving.py
deployment path) on the current default device. Timing follows CLAUDE.md's
TPU rule: chain a data dependency across iterations and float() the final
result (block_until_ready lies through the remote tunnel).

Usage:
    python tools/serving_bench.py [--batch 64] [--iters 20] [--width 416]
        [--height 128] [--export /tmp/serve.mdtpu]
Benches fp32 AND bf16, live jit and the exported artifact; artifacts are
written to {--export}.fp32 and {--export}.bf16 (not the bare path).
Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--export", default="/tmp/serve_bench.mdtpu")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sync", action="store_true",
                    help="request-response ceiling: host numpy in, host "
                         "numpy out, one blocking call per iteration (what "
                         "an HTTP server must pay), instead of the chained "
                         "on-device loop")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from monodepth2_tpu.models import Model
    from monodepth2_tpu.serving import (
        export_inference,
        load_inference,
        make_inference_fn,
    )
    from monodepth2_tpu.training.config import TrainConfig
    from monodepth2_tpu.training.state import create_train_state

    cfg = TrainConfig(target_size=(args.width, args.height), in_channels=1)
    model = Model.create(depth=18, in_channels=1, scale_levels=cfg.scale_levels)
    state, _ = create_train_state(model, cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(size=(args.batch, cfg.height, cfg.width, 1)), jnp.float32
    )

    x_host = np.asarray(x)

    def timed_sync(tag, call):
        # the ceiling a request-response server can actually reach: every
        # iteration pays host->device input transfer, device compute, and
        # device->host fetch of BOTH outputs (disparity + depth), exactly
        # like one BucketBatcher device call. No chaining, no overlap.
        out = call(x_host)
        _ = {k: np.asarray(v) for k, v in out.items()}
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = call(x_host)
            _ = {k: np.asarray(v) for k, v in out.items()}
        dt = (time.perf_counter() - t0) / args.iters
        print(
            json.dumps(
                {
                    "tag": tag + "_sync",
                    "batch": args.batch,
                    "ms_per_batch": round(dt * 1e3, 3),
                    "img_per_s": round(args.batch / dt, 1),
                }
            ),
            flush=True,
        )

    def timed(tag, call):
        if args.sync:
            return timed_sync(tag, call)
        # warmup/compile, then a chained loop so nothing overlaps the clock.
        # Warm with BOTH input flavors the loop will use (the raw uncommitted
        # x and a committed chained carry): jit specializes on placement for
        # exported modules, and a mid-loop recompile (~15 s remote) poisoned
        # round-4's first serving numbers (865-14400 ms/batch reads).
        out = call(x)
        _ = float(jnp.sum(out["depth"]))
        out = call(x + 0.0 * out["depth"][:, :1, :1, :1].mean())
        _ = float(jnp.sum(out["depth"]))
        t0 = time.perf_counter()
        carry = x
        for _ in range(args.iters):
            out = call(carry)
            # data dependency: next input depends on this output
            carry = x + 0.0 * out["depth"][:, :1, :1, :1].mean()
        _ = float(jnp.sum(out["depth"]))
        dt = (time.perf_counter() - t0) / args.iters
        print(
            json.dumps(
                {
                    "tag": tag,
                    "batch": args.batch,
                    "ms_per_batch": round(dt * 1e3, 3),
                    "img_per_s": round(args.batch / dt, 1),
                }
            ),
            flush=True,
        )

    platform = jax.devices()[0].platform
    platforms = ("cpu",) if platform == "cpu" else ("tpu", "cpu")
    # fp32 and bf16 (eval.py/serving.py compute_dtype knob, VERDICT r3 #5):
    # the published serving number must match a SHIPPED path, both ways
    import dataclasses

    for dtype in ("float32", "bfloat16"):
        dcfg = dataclasses.replace(cfg, compute_dtype=dtype)
        tag = "fp32" if dtype == "float32" else "bf16"
        live = jax.jit(make_inference_fn(model, state.params, state.stats, dcfg))
        timed(f"live_jit_{tag}", live)
        path = f"{args.export}.{tag}"
        export_inference(
            model, state.params, state.stats, dcfg, path, platforms=platforms
        )
        print(f"artifact[{tag}]: {os.path.getsize(path)} bytes", flush=True)
        timed(f"served_artifact_{tag}", load_inference(path))


if __name__ == "__main__":
    main()
