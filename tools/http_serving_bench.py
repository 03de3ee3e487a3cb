"""HTTP serving-path benchmark: requests/s through `cli serve`'s stack.

Measures the full production serving story on the real chip — HTTP parse →
micro-batch coalescing → bucket padding → device call → npz response —
against the raw ServedModel ceiling (tools/serving_bench.py: ~2.8k img/s
bf16 at batch 64). The gap is host-side cost (HTTP + numpy on 1 CPU core);
the point of the sweep is that micro-batching recovers device efficiency
under concurrency: N concurrent single-image clients should share device
calls (batches ≪ requests) instead of paying a batch-1 dispatch each.

Usage (real TPU):
    python tools/http_serving_bench.py --checkpoint models/ckpt-21000 \
        --concurrency 1,8,32 --requests 256
Random weights (throughput identical, no checkpoint needed):
    python tools/http_serving_bench.py --random-weights
Writes one JSON line per concurrency level.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--buckets", default="1,4,16,64")
    ap.add_argument("--linger-ms", type=float, default=2.0)
    ap.add_argument("--concurrency", default="1,8,32")
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--rows-per-request", type=int, default=1)
    ap.add_argument("--workers", type=int, default=2,
                    help="batcher dispatch pipeline depth")
    ap.add_argument("--fields", default=None,
                    help="X-Fields response subset, e.g. 'disparity'")
    ap.add_argument("--dtype", default=None,
                    help="X-Dtype response precision: float16|float32")
    ap.add_argument("--input-dtype", default=None,
                    help="X-Input-Dtype request encoding: uint8|float16")
    ap.add_argument("--artifact", default=None,
                    help="reuse an existing export instead of re-exporting")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from monodepth2_tpu.server import build_server

    artifact = args.artifact
    if artifact is None:
        from monodepth2_tpu.models import Model
        from monodepth2_tpu.serving import export_inference
        from monodepth2_tpu.training.config import TrainConfig
        from monodepth2_tpu.training.state import create_train_state

        cfg = TrainConfig(
            target_size=(args.width, args.height),
            in_channels=1,
            compute_dtype=args.compute_dtype,
        )
        model = Model.create(depth=18, in_channels=1)
        if args.checkpoint:
            from monodepth2_tpu.eval import load_model, sidecar_config

            side = sidecar_config(args.checkpoint)
            if side is not None:
                import dataclasses

                cfg = dataclasses.replace(
                    side, compute_dtype=args.compute_dtype
                )
            model, params, stats = load_model(cfg, args.checkpoint)
        else:
            if not args.random_weights:
                ap.error("pass --checkpoint or --random-weights")
            state, _ = create_train_state(model, cfg)
            params, stats = state.params, state.stats
        artifact = "/tmp/http_bench.mdtpu"
        platform = "cpu" if args.cpu else "tpu"
        export_inference(
            model, params, stats, cfg, artifact, platforms=(platform,)
        )
        print(f"exported {artifact} ({os.path.getsize(artifact)} bytes)",
              flush=True)

    buckets = tuple(int(b) for b in args.buckets.split(","))
    server, batcher = build_server(
        artifact, port=0, buckets=buckets, linger_s=args.linger_ms / 1e3,
        warmup=True, workers=args.workers,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    with urllib.request.urlopen(base + "/meta", timeout=30) as r:
        meta = json.loads(r.read())
    h, w, c = meta["input_shape"][1:]
    n = args.rows_per_request
    rows = np.random.default_rng(0).uniform(size=(n, h, w, c))
    if args.input_dtype == "uint8":
        body = (rows * 255).astype(np.uint8).tobytes()
    elif args.input_dtype == "float16":
        body = rows.astype(np.float16).tobytes()
    else:
        body = rows.astype(np.float32).tobytes()

    def one_request():
        t0 = time.perf_counter()
        req = urllib.request.Request(
            base + "/v1/depth", data=body, method="POST"
        )
        req.add_header("Content-Type", "application/octet-stream")
        req.add_header("X-Shape", f"{n},{h},{w},{c}")
        if args.fields:
            req.add_header("X-Fields", args.fields)
        if args.dtype:
            req.add_header("X-Dtype", args.dtype)
        if args.input_dtype:
            req.add_header("X-Input-Dtype", args.input_dtype)
        with urllib.request.urlopen(req, timeout=300) as r:
            out = np.load(io.BytesIO(r.read()))
            # full read of one returned field (not hardcoded 'disparity':
            # --fields may exclude it)
            _ = float(out[out.files[0]].astype(np.float32).mean())
        return time.perf_counter() - t0

    try:
        one_request()  # connection + response-path warmup
        for conc in (int(x) for x in args.concurrency.split(",")):
            before = dict(batcher.stats)
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=conc) as pool:
                lats = list(
                    pool.map(lambda _: one_request(), range(args.requests))
                )
            dt = time.perf_counter() - t0
            batches = batcher.stats["batches"] - before["batches"]
            padded = batcher.stats["padded_rows"] - before["padded_rows"]
            total_rows = args.requests * n
            print(json.dumps({
                "concurrency": conc,
                "requests": args.requests,
                "rows_per_request": n,
                "workers": args.workers,
                "fields": args.fields or "all",
                "dtype": args.dtype or "float32",
                "input_dtype": args.input_dtype or "float32",
                "img_per_s": round(total_rows / dt, 1),
                "ms_per_request": round(dt / args.requests * 1e3, 2),
                "p50_ms": round(float(np.percentile(lats, 50)) * 1e3, 2),
                "p95_ms": round(float(np.percentile(lats, 95)) * 1e3, 2),
                "device_batches": batches,
                "rows_per_device_call": round(total_rows / max(batches, 1), 1),
                "padded_fraction": round(
                    padded / max(total_rows + padded, 1), 3
                ),
            }), flush=True)
    finally:
        server.shutdown()
        batcher.close()


if __name__ == "__main__":
    main()
