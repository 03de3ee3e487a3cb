"""Block-level timing breakdown of the train step (VERDICT r1 #3).

Times nested subsets of the step — model forward, model fwd+bwd, full loss
fwd+bwd, optimizer — each as its own jitted program with chained-dependency
float() timing, so differences attribute wall time to blocks. Also reports
XLA cost-analysis FLOPs per block → where the MFU goes.

Run on the real chip:  python tools/profile_breakdown.py [--batch-size 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_BF16_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    ap.add_argument("--warp", default=None, help="warp method override")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from monodepth2_tpu.models import Model
    from monodepth2_tpu.training import (
        TrainConfig,
        TrainContext,
        create_train_state,
        make_train_step,
        train_loss,
    )

    cfg = TrainConfig(
        target_size=(args.width, args.height),
        batch_size=args.batch_size,
        in_channels=1,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        warp_method=args.warp,
    )
    model = Model.create(depth=18, in_channels=1)
    state, tx = create_train_state(model, cfg)
    K = np.asarray(
        [[482.0, 0, cfg.width / 2], [0, 482.0, cfg.height / 2], [0, 0, 1.0]]
    )
    ctx = TrainContext.create(K, cfg.width, cfg.height)
    batch = jnp.asarray(
        np.random.default_rng(0).uniform(
            size=(cfg.batch_size, 3, cfg.height, cfg.width, 1)
        ),
        jnp.float32,
    )

    cast = (lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t)) if args.bf16 else (lambda t: t)

    def model_fwd(params, frames):
        d, p, _ = model(cast(params), cast(state.stats),
                        frames.astype(jnp.bfloat16) if args.bf16 else frames,
                        (0, 2), 1, train=True)
        return (
            sum(jnp.sum(x.astype(jnp.float32)) for x in d)
            + sum(jnp.sum(r.astype(jnp.float32)) + jnp.sum(t.astype(jnp.float32))
                  for r, t in p)
        )

    def model_fwd_bwd(params, frames):
        g = jax.grad(model_fwd)(params, frames)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    def loss_fwd(params, frames):
        return train_loss(model, params, state.stats, frames, ctx, cfg)[0]

    def loss_fwd_bwd(params, frames):
        g = jax.grad(loss_fwd)(params, frames)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    def adam_only(params, frames):
        fake_g = jax.tree_util.tree_map(lambda x: x * 1e-6, params)
        up, _ = tx.update(fake_g, state.opt_state, params)
        newp = optax.apply_updates(params, up)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(newp)) + 0.0 * jnp.sum(frames)

    full_step = make_train_step(model, tx, ctx, cfg)

    def full(params, frames):
        # Keep EVERY new-state leaf live: summing a single leaf (the r2
        # probe) lets XLA dead-code-eliminate most of the Adam update and
        # the backward slices feeding it, under-reporting the step by
        # ~4 ms (see tools/scan_gap_bench.py const_dce vs const_all).
        st = state._replace(params=params)
        new_state, metrics, _ = full_step(st, frames)
        return metrics["loss"] + 1e-20 * sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(
                (new_state.params, new_state.opt_state)
            )
        )

    blocks = [
        ("model_fwd", model_fwd),
        ("model_fwd_bwd", model_fwd_bwd),
        ("loss_fwd", loss_fwd),
        ("loss_fwd_bwd", loss_fwd_bwd),
        ("adam_only", adam_only),
        ("full_step", full),
    ]

    results = {}
    for name, f in blocks:
        @jax.jit
        def loop(params, frames, f=f):
            def body(c, _):
                s = f(params, frames + c)
                return jnp.float32(s) * jnp.float32(1e-20), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=args.iters)
            return c

        _ = float(loop(state.params, batch))
        t0 = time.perf_counter()
        _ = float(loop(state.params, batch))
        dt = (time.perf_counter() - t0) / args.iters

        try:
            cost = jax.jit(f).lower(state.params, batch).compile().cost_analysis()
            gflops = float(cost.get("flops", 0.0)) / 1e9
        except Exception:
            gflops = float("nan")
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "gflops": round(gflops, 2),
            "tflops_per_s": round(gflops / dt / 1e3, 2),
            "mfu_pct": round(100 * gflops / dt / 1e3 / V5E_BF16_TFLOPS, 2),
        }
        print(name, json.dumps(results[name]), flush=True)

    d = results
    derived = {
        "model_bwd_ms": round(d["model_fwd_bwd"]["ms"] - d["model_fwd"]["ms"], 3),
        "warp_loss_fwd_ms": round(d["loss_fwd"]["ms"] - d["model_fwd"]["ms"], 3),
        "warp_loss_bwd_extra_ms": round(
            d["loss_fwd_bwd"]["ms"] - d["model_fwd_bwd"]["ms"], 3
        ),
        "adam_ms": round(d["adam_only"]["ms"], 3),
        "step_overhead_ms": round(
            d["full_step"]["ms"] - d["loss_fwd_bwd"]["ms"] - d["adam_only"]["ms"], 3
        ),
    }
    print("derived:", json.dumps(derived), flush=True)


if __name__ == "__main__":
    main()
