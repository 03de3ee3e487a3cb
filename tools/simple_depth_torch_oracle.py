"""Independent torch-CPU oracle for the simple_depth trajectory.

BASELINE.json's "simple_depth bit-for-bit fp32 parity" target is unenforceable
here (Julia is not installed — VALIDATION.md), so this replaces it with an
enforceable committed artifact (VERDICT r1 #9): a from-scratch PyTorch
implementation of the reference's slow_depth loop (src/simple_depth.jl:1-62 —
same math, independent framework, independent autodiff) produces a golden
loss trajectory + final disparity, and tests/test_simple_depth_golden.py pins
the JAX implementation to it within cross-framework fp32 drift tolerances.

Every op mirrors the reference semantics the JAX side implements:
  * disparity→depth: 1/(d·(1/min−1/max)+1/max)         (src/utils.jl:175-179)
  * backproject/project, eps 1e-7, (−1,1) align-corners (src/utils.jl:41-99)
  * SE(3): Rodrigues with θ-clamp 1e-4, invert = (Rᵀ, Rᵀ(−t))
                                                       (src/utils.jl:101-141,181-188)
  * grid_sample: bilinear, border padding, align_corners=True
  * SSIM: reflect-pad 1, 3×3 mean pool, c1=0.01², c2=0.03², clamp((1−s)/2,0,1)
  * loss = mean(min-reprojection photometric) + smooth_loss
  * Adam(3e-4), 500 iters, disp init 0.5, rvec init (0,0,0.01)

Run from the repo root:  python tools/simple_depth_torch_oracle.py
Writes tests/golden/simple_depth_golden.npz (input frames + K + trajectory).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

torch.manual_seed(0)
torch.set_num_threads(1)

# defaults produce the quick-lane golden; --width 416 --height 128 --iters 200
# regenerates the reference-shape golden (VERDICT r2 #7: the reference's
# actual triplet geometry, src/simple_depth.jl:78-92, where border-clamp
# traffic and SSIM windows differ meaningfully from the small proxy)
H, W = 32, 96
ITERS = 500
LOG_EVERY = 5
MIN_DEPTH, MAX_DEPTH = 0.1, 100.0
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "simple_depth_golden.npz")


def make_input():
    """Deterministic triplet + K from the repo's driving renderer (the data
    may come from anywhere — independence matters for the computation)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from monodepth2_tpu.data.synthetic import SyntheticDriving

    ds = SyntheticDriving(n=1, target_size=(W, H), seed=11)
    return ds[0][None].astype(np.float32), np.asarray(ds.K, np.float32)


def so3_exp(rvec: torch.Tensor, eps: float = 1e-4) -> torch.Tensor:
    """(N,3) -> (N,3,3), Rodrigues with the reference's θ clamp."""
    n = rvec.shape[0]
    rx, ry, rz = rvec[:, 0], rvec[:, 1], rvec[:, 2]
    zero = torch.zeros_like(rx)
    K = torch.stack(
        [zero, -rz, ry, rz, zero, -rx, -ry, rx, zero], dim=1
    ).reshape(n, 3, 3)
    theta = torch.sqrt((rvec * rvec).sum(dim=1, keepdim=True))
    ti = 1.0 / torch.clamp(theta, min=eps)
    f1 = (ti * torch.sin(theta)).reshape(n, 1, 1)
    f2 = (ti * ti * (1.0 - torch.cos(theta))).reshape(n, 1, 1)
    return f1 * K + f2 * (K @ K) + torch.eye(3).unsqueeze(0)


def ssim_dist(x: torch.Tensor, y: torch.Tensor) -> torch.Tensor:
    """NCHW -> NCHW SSIM distance."""
    pad = lambda t: F.pad(t, (1, 1, 1, 1), mode="reflect")
    pool = lambda t: F.avg_pool2d(pad(t), 3, 1)
    mx, my = pool(x), pool(y)
    sx = pool(x * x) - mx * mx
    sy = pool(y * y) - my * my
    sxy = pool(x * y) - mx * my
    c1, c2 = 0.01**2, 0.03**2
    n = (2 * mx * my + c1) * (2 * sxy + c2)
    d = (mx * mx + my * my + c1) * (sx + sy + c2)
    return torch.clamp((1 - n / d) * 0.5, 0.0, 1.0)


def photometric(pred: torch.Tensor, tgt: torch.Tensor, alpha=0.85) -> torch.Tensor:
    l1 = (tgt - pred).abs().mean(dim=1, keepdim=True)
    ss = ssim_dist(pred, tgt).mean(dim=1, keepdim=True)
    return alpha * ss + (1 - alpha) * l1


def smooth(disp: torch.Tensor, img: torch.Tensor) -> torch.Tensor:
    """disp (N,H,W), img (N,C,H,W)."""
    ddx = (disp[:, :, :-1] - disp[:, :, 1:]).abs()
    ddy = (disp[:, :-1, :] - disp[:, 1:, :]).abs()
    dix = (img[:, :, :, :-1] - img[:, :, :, 1:]).abs().mean(dim=1)
    diy = (img[:, :, :-1, :] - img[:, :, 1:, :]).abs().mean(dim=1)
    return (ddx * torch.exp(-dix)).mean() + (ddy * torch.exp(-diy)).mean()


def main():
    global H, W, ITERS, OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=W)
    ap.add_argument("--height", type=int, default=H)
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    H, W, ITERS, OUT = args.height, args.width, args.iters, args.out

    frames_np, K_np = make_input()
    frames = torch.from_numpy(frames_np)  # (1,3,H,W,1)
    K = torch.from_numpy(K_np)
    invK = torch.from_numpy(np.linalg.inv(K_np.astype(np.float64)).astype(np.float32))

    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    grid = torch.from_numpy(
        np.stack([xs, ys, np.ones_like(xs)], axis=-1).reshape(H * W, 3)
    )

    target_nchw = frames[:, 1].permute(0, 3, 1, 2)  # (1,1,H,W)
    sources = {sid: frames[:, sid].permute(0, 3, 1, 2) for sid in (0, 2)}

    disp = torch.full((1, H, W, 1), 0.5, requires_grad=True)
    rvec = torch.tensor([[[0.0, 0.0, 0.01]], [[0.0, 0.0, 0.01]]], requires_grad=True)
    tvec = torch.zeros((2, 1, 3, 1), requires_grad=True)
    opt = torch.optim.Adam([disp, rvec, tvec], lr=3e-4)

    def loss_fn():
        depth = 1.0 / (disp * (1.0 / MIN_DEPTH - 1.0 / MAX_DEPTH) + 1.0 / MAX_DEPTH)
        rays = grid @ invK.T  # (HW,3)
        points = depth.reshape(1, H * W, 1) * rays.unsqueeze(0)  # (1,HW,3)
        photo = []
        for i, sid in enumerate((0, 2)):
            R = so3_exp(rvec[i])
            t = tvec[i]
            if sid < 1:  # source before target: inverse transform
                R = R.transpose(-1, -2)
                t = R @ (-t)
            cam = (points @ R.transpose(-1, -2) + t.transpose(-1, -2)) @ K.T
            uv = cam[..., :2] / (cam[..., 2:3] + 1e-7)
            norm = torch.tensor([W - 1.0, H - 1.0])
            uv = (uv / norm) * 2.0 - 1.0  # (1,HW,2)
            sampled = F.grid_sample(
                sources[sid], uv.reshape(1, H, W, 2),
                mode="bilinear", padding_mode="border", align_corners=True,
            )
            photo.append(photometric(sampled, target_nchw))
        warp_l = torch.min(torch.stack(photo), dim=0).values.mean()
        smooth_l = smooth(disp[..., 0], target_nchw)
        return warp_l + smooth_l

    iters, losses = [], []
    for it in range(1, ITERS + 1):
        opt.zero_grad()
        loss = loss_fn()
        loss.backward()
        opt.step()
        if it % LOG_EVERY == 0 or it == 1:
            iters.append(it)
            losses.append(float(loss))
            if it % 100 == 0 or it == 1:
                print(f"iter {it}: loss {float(loss):.6f}", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(
        OUT,
        frames=frames_np,
        K=K_np,
        iters=np.asarray(iters, np.int64),
        losses=np.asarray(losses, np.float64),
        final_disparity=disp.detach().numpy(),
        final_rvec=rvec.detach().numpy(),
        final_tvec=tvec.detach().numpy(),
    )
    print(f"golden written to {os.path.normpath(OUT)}")


if __name__ == "__main__":
    main()
