"""Host input-pipeline throughput bench (SURVEY.md §7 hard part (e): keep
the chips fed). Builds a disposable KITTI-style PNG tree at the training
resolution, then measures images/sec through

  - the native C++ decode+resize+batch path (native/mdloader.cpp), and
  - the PIL fallback path,

both via the DataLoader the training loop actually uses. Compare against
the chip's training throughput (bench.py) to see the feed margin.

Run:  python tools/loader_bench.py [--n-triplets 96] [--width 416 --height 128]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_tree(root, n_triplets, width, height):
    from PIL import Image

    rng = np.random.default_rng(0)
    seq_dir = os.path.join(root, "sequences", "00")
    img_dir = os.path.join(seq_dir, "image_0")
    os.makedirs(img_dir)
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        f.write(
            f"P0: 700.0 0.0 {width/2} 0.0 0.0 700.0 {height/2} 0.0 "
            "0.0 0.0 1.0 0.0\n"
        )
    # realistic-entropy frames (smooth gradients + noise compress like road
    # scenes, unlike pure noise which inflates PNG decode cost)
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    base = (
        120 + 60 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
    )
    for i in range(n_triplets * 3):
        arr = np.clip(
            base + 25 * rng.standard_normal((height, width)), 0, 255
        ).astype(np.uint8)
        Image.fromarray(arr, "L").save(os.path.join(img_dir, f"{i:06d}.png"))
    return root


def run_epoch(ds, batch_size, num_workers):
    from monodepth2_tpu.data import DataLoader

    loader = DataLoader(ds, batch_size, shuffle=True, seed=0,
                        num_workers=num_workers)
    n_img = 0
    t0 = time.perf_counter()
    for batch in loader:
        n_img += batch.shape[0] * batch.shape[1]
    dt = time.perf_counter() - t0
    return n_img / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-triplets", type=int, default=96)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from monodepth2_tpu.data import KittiDataset
    from monodepth2_tpu.data import native

    root = tempfile.mkdtemp(prefix="loaderbench-")
    try:
        build_tree(root, args.n_triplets, args.width, args.height)
        rows = []
        for use_native in (True, False):
            if use_native and not native.available():
                print(json.dumps({"path": "native", "error": "unavailable"}))
                continue
            ds = KittiDataset(
                root, "00", target_size=(args.width, args.height),
                use_native=use_native,
            )
            _ = run_epoch(ds, args.batch_size, args.num_workers)  # warm cache
            ips = run_epoch(ds, args.batch_size, args.num_workers)
            row = {
                "path": "native" if use_native else "pil",
                "img_per_sec": round(ips, 1),
                "num_workers": args.num_workers,
                "resolution": f"{args.width}x{args.height}",
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(rows, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
