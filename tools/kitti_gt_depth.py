#!/usr/bin/env python
"""Export Eigen-style ground-truth depth maps from KITTI velodyne scans.

Produces the `.npz` consumed by `python -m monodepth2_tpu.cli eval-depth
--gt out.npz` (arrays: `images` (N,H,W,1) float in [0,1] at model
resolution, `depths` (N,h,w) metric at native camera resolution, 0 = no
return) — the one-command bridge from raw KITTI to the AbsRel/δ harness
(VERDICT r2 #2: the repo must be eval-ready the day KITTI data lands).

The reference never computes depth accuracy at all (it monitors train loss
only, src/Monodepth.jl:196); this follows the standard Monodepth2-paper
protocol instead: project each velodyne scan into the camera with the
sequence calibration, z-buffer to the nearest return per pixel, optional
Garg crop (encoded as zeroed GT, since gt==0 is "invalid" to
utils/metrics.depth_metrics).

Supports the KITTI odometry layout the training pipeline uses
(root/sequences/SS/{calib.txt, velodyne/*.bin, image_0/*.png}; calib P0..P3
+ Tr lines, Tr = velo→cam0 with rectification folded in).

Usage:
    python tools/kitti_gt_depth.py --root /data/kitti --sequence 00 \
        --width 416 --height 128 --stride 10 --out gt_00.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_odometry_calib(path: str):
    """calib.txt -> dict of flat float arrays keyed by calib tag
    ("P0".."P3" are flattened (3,4) cam projections, "Tr" the flattened
    (3,4) velo->cam0 transform); callers reshape."""
    vals = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            vals[k.strip()] = np.array(v.split(), np.float64)
    return vals


def velo_to_depth_map(
    scan: np.ndarray, P: np.ndarray, Tr: np.ndarray, width: int, height: int
) -> np.ndarray:
    """One velodyne scan (N,4 xyz+reflectance) -> (H,W) metric depth map.

    Points are mapped velo->cam0 (Tr), projected with P, and z-buffered:
    where several returns land in one pixel (occlusion boundaries) the
    NEAREST wins, matching the published Monodepth2 eval exporter behavior.
    """
    pts = scan[:, :3]
    hom = np.concatenate([pts, np.ones((pts.shape[0], 1), pts.dtype)], axis=1)
    cam = hom @ Tr.T  # (N,4) in cam0 frame
    cam = cam[cam[:, 2] > 1e-3]  # keep points in front of the camera
    proj = np.concatenate(
        [cam[:, :3], np.ones((cam.shape[0], 1), cam.dtype)], axis=1
    ) @ P.T  # (N,3)
    z = proj[:, 2]
    u = np.round(proj[:, 0] / z).astype(np.int64)
    v = np.round(proj[:, 1] / z).astype(np.int64)
    keep = (u >= 0) & (u < width) & (v >= 0) & (v < height) & (z > 0)
    u, v, z = u[keep], v[keep], z[keep]

    depth = np.zeros((height, width), np.float32)
    # z-buffer: sort by depth DESCENDING so nearer returns overwrite farther
    order = np.argsort(-z)
    depth[v[order], u[order]] = z[order]
    return depth


def garg_crop_mask(height: int, width: int) -> np.ndarray:
    """The Garg et al. evaluation crop used by the Eigen-split protocol."""
    mask = np.zeros((height, width), bool)
    y0, y1 = int(0.40810811 * height), int(0.99189189 * height)
    x0, x1 = int(0.03594771 * width), int(0.96405229 * width)
    mask[y0:y1, x0:x1] = True
    return mask


def export_sequence(
    root: str,
    sequence: str,
    cam: int,
    model_width: int,
    model_height: int,
    stride: int,
    limit: int,
    garg: bool,
    out: str,
) -> int:
    from PIL import Image

    seq_dir = os.path.join(root, "sequences", sequence)
    calib = parse_odometry_calib(os.path.join(seq_dir, "calib.txt"))
    P = calib[f"P{cam}"].reshape(3, 4)
    Tr = np.eye(4)
    Tr[:3, :4] = calib["Tr"].reshape(3, 4)
    # (odometry P2/P3 include the stereo baseline in P[0,3]; the projection
    # handles it via the homogeneous multiply, nothing extra to do)

    img_dir = os.path.join(seq_dir, f"image_{cam}")
    velo_dir = os.path.join(seq_dir, "velodyne")
    frames = sorted(f[:-4] for f in os.listdir(velo_dir) if f.endswith(".bin"))
    frames = frames[::stride]
    if limit:
        frames = frames[:limit]
    if not frames:
        raise FileNotFoundError(f"no velodyne scans under {velo_dir}")

    images, depths = [], []
    native_size = None
    for i, fid in enumerate(frames):
        img_path = os.path.join(img_dir, fid + ".png")
        with Image.open(img_path) as im:
            native_size = im.size  # (W,H)
            gray = im.convert("L").resize(
                (model_width, model_height), Image.BILINEAR
            )
        images.append(np.asarray(gray, np.float32)[..., None] / 255.0)

        scan = np.fromfile(
            os.path.join(velo_dir, fid + ".bin"), np.float32
        ).reshape(-1, 4)
        d = velo_to_depth_map(scan, P, Tr, native_size[0], native_size[1])
        if garg:
            d = d * garg_crop_mask(native_size[1], native_size[0])
        depths.append(d)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(frames)} frames", flush=True)

    np.savez_compressed(
        out,
        images=np.stack(images),
        depths=np.stack(depths),
        meta=np.asarray(
            [f"seq={sequence}", f"cam={cam}", f"garg={garg}"], dtype=object
        ),
    )
    print(f"wrote {len(frames)} frames -> {out}")
    return len(frames)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", required=True, help="KITTI odometry root")
    ap.add_argument("--sequence", default="00")
    ap.add_argument("--cam", type=int, default=0, help="camera index (0=gray left)")
    ap.add_argument("--width", type=int, default=416, help="model input width")
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--stride", type=int, default=1, help="keep every k-th frame")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--garg-crop", action="store_true",
                    help="zero GT outside the Garg evaluation crop")
    ap.add_argument("--out", default="kitti_gt.npz")
    args = ap.parse_args(argv)
    export_sequence(
        args.root, args.sequence, args.cam, args.width, args.height,
        args.stride, args.limit, args.garg_crop, args.out,
    )


if __name__ == "__main__":
    main()
