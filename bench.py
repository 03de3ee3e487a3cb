"""Headline benchmark: KITTI-config training throughput (images/sec/chip).

Runs the full self-supervised train step (ResNet-18 + depth/pose decoders +
4-scale warp loss, batch 4, 416×128 grayscale — the reference's exact training
configuration, src/Monodepth.jl:103-107) on the default JAX device and prints
ONE json line.

vs_baseline compares against the reference-CPU proxy measured on this host:
an equivalent torch-CPU train step runs at 1.20 img/s (see BASELINE.md;
the Julia reference itself is unbenchmarked upstream and Julia is not
installed here). North star (BASELINE.json): ≥10× that.
"""

import json
import time

import numpy as np

BASELINE_CPU_IMG_PER_SEC = 1.20  # torch-CPU proxy, this host, BASELINE.md


def main():
    import jax
    import jax.numpy as jnp

    from monodepth2_tpu.models import Model
    from monodepth2_tpu.training import (
        TrainConfig,
        TrainContext,
        create_train_state,
        make_train_step,
    )

    cfg = TrainConfig(
        target_size=(416, 128), batch_size=4, in_channels=1,
        compute_dtype="bfloat16", warp_method="pallas",
    )
    model = Model.create(depth=18, in_channels=1)
    state, tx = create_train_state(model, cfg)
    K = np.asarray(
        [[482.0, 0, cfg.width / 2], [0, 482.0, cfg.height / 2], [0, 0, 1.0]]
    )
    ctx = TrainContext.create(K, cfg.width, cfg.height)
    step = jax.jit(make_train_step(model, tx, ctx, cfg), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.uniform(size=(cfg.batch_size, 3, cfg.height, cfg.width, 1)), jnp.float32
    )

    # warmup/compile; float() forces a real host read through the tunnel
    state, metrics, _ = step(state, batch)
    _ = float(metrics["loss"])

    # XLA's own FLOP count of the whole compiled step → MFU (VERDICT r1 #3);
    # lower() only needs avals, so the donated warmup buffers are fine
    try:
        cost = step.lower(state, batch).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
    except Exception:
        step_flops = 0.0

    # steps chain through the donated state, so the final loss depends on
    # every step; float() is the honest sync (block_until_ready can return
    # before the remote device is actually done — see CLAUDE.md)
    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics, _ = step(state, batch)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps

    ips = cfg.batch_size / dt
    out = {
        "metric": "kitti_416x128_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / BASELINE_CPU_IMG_PER_SEC, 2),
    }
    if step_flops > 0:
        # MFU vs v5e bf16 peak (197 TFLOP/s); XLA counts every op's FLOPs in
        # the compiled step (fwd+bwd+Adam), so this is a conservative bound
        out["mfu_pct"] = round(100.0 * step_flops / dt / 197e12, 2)
        out["step_gflops"] = round(step_flops / 1e9, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
