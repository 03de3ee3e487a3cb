"""Warp-kernel microbenchmark against hardware rooflines (VERDICT r1 #4).

Times grid_sample (forward, and forward+VJP) for every implementation at the
exact batched training shape — (Src·S·N·C)=32 images of 128×416, P=53248
points — and reports bytes moved, FLOPs, and % of the v5e HBM/MXU rooflines.

The one-hot/Pallas formulation trades gathers for MXU contractions, so its
floor is the MXU time of H·W MACs/point — NOT the HBM roofline; this bench
quantifies both bounds so BASELINE.md can state the trade with numbers.

Timing: steps chained through a scalar carry (each iteration's uv depends on
the previous output) and synced with float() — block_until_ready can lie
through the axon tunnel (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e (1 chip): public spec numbers
HBM_GBPS = 819.0
MXU_BF16_TFLOPS = 197.0
MXU_FP32_TFLOPS = 49.0  # fp32 ~ 1/4 of bf16 on v5e MXU


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32, help="folded batch (Src*S*N*C)")
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--methods", default="gather,onehot,pallas,pallas_precise")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monodepth2_tpu.ops.grid_sample import grid_sample
    from monodepth2_tpu.ops.pallas import grid_sample_pallas

    N, H, W = args.n, args.height, args.width
    P = H * W
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(N, H, W, 1)), jnp.float32)
    # a realistic warp field: identity + smooth parallax-scale offsets
    base_u = np.tile(np.linspace(-1, 1, W), (H, 1))
    base_v = np.tile(np.linspace(-1, 1, H)[:, None], (1, W))
    off = 0.08 * rng.standard_normal((N, 1, 1))
    uv = np.stack(
        [np.tile(base_u, (N, 1, 1)) + off, np.tile(base_v, (N, 1, 1))], axis=-1
    ).reshape(N, P, 2)
    uv = jnp.asarray(uv, jnp.float32)

    fns = {
        "gather": lambda im, u: grid_sample(im, u, method="gather"),
        "onehot": lambda im, u: grid_sample(im, u, method="onehot"),
        "pallas": lambda im, u: grid_sample_pallas(im, u, precise=False),
        "pallas_precise": lambda im, u: grid_sample_pallas(im, u, precise=True),
    }

    def timed(f, iters):
        @jax.jit
        def loop(im, u):
            def body(c, _):
                o = f(im, u + c)
                return jnp.float32(jnp.sum(o)) * jnp.float32(1e-20), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        _ = float(loop(img, uv))  # compile + warmup
        t0 = time.perf_counter()
        _ = float(loop(img, uv))
        return (time.perf_counter() - t0) / iters

    def timed_vjp(f, iters):
        def fwd_bwd(im, u, g):
            out, vjp = jax.vjp(lambda a, b: f(a, b), im, u)
            dim, duv = vjp(g)
            return jnp.sum(out) + jnp.sum(dim) + jnp.sum(duv)

        g = jnp.ones((N, P, 1), jnp.float32)

        @jax.jit
        def loop(im, u):
            def body(c, _):
                s = fwd_bwd(im, u + c, g)
                return jnp.float32(s) * jnp.float32(1e-20), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        _ = float(loop(img, uv))
        t0 = time.perf_counter()
        _ = float(loop(img, uv))
        return (time.perf_counter() - t0) / iters

    # roofline accounting (fp32 arrays)
    bytes_fwd = 4 * (N * H * W + N * P * 2 + N * P)
    bytes_bwd = bytes_fwd + 4 * (N * P + N * H * W + N * P * 2)
    t_hbm_fwd = bytes_fwd / (HBM_GBPS * 1e9)
    t_hbm_bwd = bytes_bwd / (HBM_GBPS * 1e9)
    # one-hot/Pallas MXU MACs: fwd img@Wx = H·W per point; bwd adds the
    # d_img contraction and two weight-derivative contractions (≈3× fwd)
    flops_fwd_onehot = 2.0 * N * P * H * W
    flops_bwd_onehot = 4.0 * flops_fwd_onehot

    rows = []
    for name in args.methods.split(","):
        f = fns[name]
        tf = timed(f, args.iters)
        tb = timed_vjp(f, max(args.iters // 3, 5))
        tflops = MXU_FP32_TFLOPS if name.endswith("precise") else MXU_BF16_TFLOPS
        row = {
            "method": name,
            "fwd_ms": round(tf * 1e3, 3),
            "fwd_bwd_ms": round(tb * 1e3, 3),
            "fwd_pct_hbm_roofline": round(100 * t_hbm_fwd / tf, 2),
            "fwd_bwd_pct_hbm_roofline": round(100 * t_hbm_bwd / tb, 2),
        }
        if name != "gather":
            row["fwd_pct_mxu_roofline"] = round(
                100 * (flops_fwd_onehot / (tflops * 1e12)) / tf, 1
            )
            row["fwd_bwd_pct_mxu_roofline"] = round(
                100 * ((flops_fwd_onehot + flops_bwd_onehot) / (tflops * 1e12)) / tb, 1
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    summary = {
        "shape": {"N": N, "H": H, "W": W, "P": P},
        "bytes_fwd_MB": round(bytes_fwd / 1e6, 2),
        "hbm_roofline_fwd_us": round(t_hbm_fwd * 1e6, 1),
        "hbm_roofline_fwd_bwd_us": round(t_hbm_bwd * 1e6, 1),
        "onehot_mxu_floor_fwd_us_bf16": round(
            flops_fwd_onehot / (MXU_BF16_TFLOPS * 1e12) * 1e6, 1
        ),
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
