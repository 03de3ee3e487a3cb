"""Generate the qualitative demo artifact (parity with the reference's
res/depth-kitti.mp4 / simple-depth.gif, which its repo ships but this image
cannot reproduce without KITTI): a camera flythrough of a SyntheticDriving
scene, inferred per-frame by a trained checkpoint, written as side-by-side
input|disparity PNG strip + mp4.

Run:  python tools/make_demo.py --checkpoint <ckpt> --out docs/demo
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", default="docs/demo")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--scene", type=int, default=3)
    ap.add_argument("--fps", type=int, default=8)
    args = ap.parse_args()

    from monodepth2_tpu.data.synthetic import SyntheticDriving, _yaw_matrix
    from monodepth2_tpu.eval import load_model, make_infer_fn
    from monodepth2_tpu.training import TrainConfig
    from monodepth2_tpu.utils.viz import colorize_disparity

    cfg = TrainConfig(
        target_size=(args.width, args.height), in_channels=1,
        min_depth=1.0, max_depth=80.0,
    )
    model, params, stats = load_model(cfg, args.checkpoint)
    infer = make_infer_fn(model, params, stats)

    ds = SyntheticDriving(
        n=max(args.scene + 1, 8), target_size=(args.width, args.height),
        channels=1,
    )
    boxes, banks = ds._scene(args.scene)

    # flythrough: constant forward motion + gentle yaw sweep
    frames = []
    for t in range(args.frames):
        z = 0.35 * t
        yaw = 0.15 * np.sin(2 * np.pi * t / args.frames)
        R = _yaw_matrix(yaw)
        c = np.asarray([0.0, 0.0, z])
        img, _ = ds._render(boxes, banks, R, c)
        frames.append(img)
    x = np.stack(frames)  # (T, H, W, 1)

    disp = np.asarray(infer(x.astype(np.float32)))  # (T, H, W)

    os.makedirs(args.out, exist_ok=True)
    from PIL import Image

    panels = []
    for t in range(args.frames):
        gray = np.repeat((np.clip(x[t], 0, 1) * 255).astype(np.uint8), 3, axis=-1)
        heat = colorize_disparity(disp[t])
        panels.append(np.concatenate([gray, heat], axis=0))  # input over depth

    # contact-sheet strip of every 8th frame
    sheet = np.concatenate(panels[:: max(args.frames // 6, 1)][:6], axis=1)
    Image.fromarray(sheet).save(os.path.join(args.out, "demo-strip.png"))

    try:
        import imageio.v2 as imageio

        imageio.mimwrite(
            os.path.join(args.out, "demo.mp4"), panels, fps=args.fps,
            quality=7,
        )
        print("wrote", os.path.join(args.out, "demo.mp4"))
    except Exception as e:
        # no ffmpeg backend in this image — fall back to an animated GIF,
        # which is also what the reference ships (res/simple-depth.gif)
        print(f"mp4 skipped: {e}")
        gif = os.path.join(args.out, "demo.gif")
        ims = [Image.fromarray(p) for p in panels]
        ims[0].save(
            gif, save_all=True, append_images=ims[1:],
            duration=int(1000 / args.fps), loop=0,
        )
        print("wrote", gif)
    print("wrote", os.path.join(args.out, "demo-strip.png"))


if __name__ == "__main__":
    main()
