"""Full self-supervised convergence experiment on SyntheticDriving scenes.

This is the system-level proof the reference claims by existence of its
trained checkpoints (src/Monodepth.jl:207): that the full SSL loop — pose
network in the loop, no ground-truth anything — learns real depth. KITTI is
not available in this image, so the experiment runs on the ray-cast
SyntheticDriving scenes (data/synthetic.py): forward ego-motion + yaw,
per-pixel depth structure, held-out val scenes with GT depth for scoring.

Success criterion (VERDICT r1 #1): median-scaled AbsRel on held-out scenes
well below the constant-disparity baseline, with the mean_disparity
saturation tripwire staying off the 0/1 rails.

Usage (TPU or CPU):
    python tools/ssl_driving_experiment.py --steps 5000 --out runs/ssl_a
Writes <out>/history.json (step, loss, mean_disp, val metrics) and
checkpoints into <out>/ckpts; resumes automatically.
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
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--n-scenes", type=int, default=256)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--grad-clip", type=float, default=0.0)
    ap.add_argument("--lr-warmup", type=int, default=0)
    ap.add_argument("--lr-decay-steps", type=int, default=0)
    ap.add_argument("--lr-decay-factor", type=float, default=0.1)
    ap.add_argument("--smoothness", type=float, default=1e-3)
    ap.add_argument("--min-depth", type=float, default=0.1)
    ap.add_argument("--max-depth", type=float, default=100.0)
    ap.add_argument("--disp-reg", type=float, default=0.0)
    ap.add_argument("--disp-reg-steps", type=int, default=0)
    ap.add_argument("--pose-tz-init", type=float, default=0.0)
    ap.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--out", default="runs/ssl_driving")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from monodepth2_tpu.data import DataLoader, SyntheticDriving, device_prefetch
    from monodepth2_tpu.models import Model
    from monodepth2_tpu.training import (
        TrainConfig,
        TrainContext,
        create_train_state,
        make_train_step,
    )
    from monodepth2_tpu.training.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from monodepth2_tpu.utils.metrics import depth_metrics

    os.makedirs(args.out, exist_ok=True)
    ckpt_dir = os.path.join(args.out, "ckpts")

    cfg = TrainConfig(
        target_size=(args.width, args.height),
        batch_size=args.batch_size,
        lr=args.lr,
        seed=args.seed,
        grad_clip=args.grad_clip,
        lr_warmup_steps=args.lr_warmup,
        lr_decay_steps=args.lr_decay_steps,
        lr_decay_factor=args.lr_decay_factor,
        disparity_smoothness=args.smoothness,
        min_depth=args.min_depth,
        max_depth=args.max_depth,
        disp_reg=args.disp_reg,
        disp_reg_steps=args.disp_reg_steps,
        compute_dtype="float32" if args.fp32 else "bfloat16",
        save_dir=ckpt_dir,
        log_dir=os.path.join(args.out, "logs"),
    )

    train_ds = SyntheticDriving(
        n=args.n_scenes, target_size=cfg.target_size, seed=0
    )
    val_ds = SyntheticDriving(n=args.n_val, target_size=cfg.target_size, seed=9999)

    model = Model.create(depth=18, in_channels=1, pose_tz_init=args.pose_tz_init)
    state, tx = create_train_state(model, cfg)
    ctx = TrainContext.create(np.asarray(train_ds.K), cfg.width, cfg.height)
    step = jax.jit(make_train_step(model, tx, ctx, cfg), donate_argnums=(0,))

    # ---- val harness: batched jitted inference + GT depth/pose -----------
    val_frames = np.stack([val_ds[i] for i in range(len(val_ds))])  # (V,3,H,W,C)
    val_targets = val_frames[:, val_ds.target_id]  # (V,H,W,C)
    val_gt = np.stack([val_ds.gt_depth_for(i) for i in range(len(val_ds))])
    # exact target→source transforms from the renderer's trajectory
    # (data/synthetic.py gt_poses_for); rotation and translation DIRECTION
    # are observable in mono SSL — translation scale is not (VERDICT r2 #4)
    val_gt_poses = [val_ds.gt_poses_for(i) for i in range(len(val_ds))]

    @jax.jit
    def infer(params, stats, x):
        return model.eval_disparity(params, stats, x)[-1]

    from monodepth2_tpu.ops.geometry import compose_transform

    @jax.jit
    def infer_poses(params, stats, frames):
        """Predicted target→source (R, t) per source, composed exactly as
        the training warp does (training/loss.py: invert for sources before
        the target)."""
        _, poses, _ = model(
            params, stats, frames, val_ds.source_ids, val_ds.target_id,
            train=False,
        )
        out = []
        for sid, (rvec, tvec) in zip(val_ds.source_ids, poses):
            R, t = compose_transform(
                rvec.astype(jnp.float32), tvec.astype(jnp.float32),
                invert=sid < val_ds.target_id,
            )
            out.append((R, t))
        return out

    def pose_errors(params, stats):
        """Mean rotation geodesic error (deg) and translation-direction
        angle (deg) over val scenes and both sources."""
        pred = jax.tree_util.tree_map(
            np.asarray, infer_poses(params, stats, jnp.asarray(val_frames))
        )
        rot, tdir = [], []
        for s, (R_p, t_p) in enumerate(pred):
            for i in range(len(val_ds)):
                R_g, t_g = val_gt_poses[i][s]
                cosang = (np.trace(R_p[i] @ R_g.T) - 1.0) / 2.0
                rot.append(np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0))))
                tp, tg = t_p[i].ravel(), t_g.ravel()
                denom = np.linalg.norm(tp) * np.linalg.norm(tg)
                if denom > 1e-12:
                    cosd = float(tp @ tg) / denom
                    tdir.append(np.degrees(np.arccos(np.clip(cosd, -1.0, 1.0))))
        return float(np.mean(rot)), float(np.mean(tdir)) if tdir else float("nan")

    def evaluate(params, stats):
        disp = np.asarray(infer(params, stats, jnp.asarray(val_targets)))[..., 0]
        # exact network depth (median scaling then absorbs the monocular
        # scale ambiguity, standard Monodepth2 eval protocol)
        pred_depth = 1.0 / (
            disp * (1.0 / cfg.min_depth - 1.0 / cfg.max_depth) + 1.0 / cfg.max_depth
        )
        ms = [
            depth_metrics(pred_depth[i], val_gt[i], max_depth=80.0)
            for i in range(disp.shape[0])
        ]
        return {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}

    # constant-disparity baseline: what "learned nothing" scores
    const = {
        k: float(
            np.mean(
                [
                    depth_metrics(np.ones_like(val_gt[i]), val_gt[i], max_depth=80.0)[k]
                    for i in range(len(val_ds))
                ]
            )
        )
        for k in ("abs_rel", "a1", "rmse")
    }

    history_path = os.path.join(args.out, "history.json")
    history = []
    if os.path.exists(history_path):
        with open(history_path) as f:
            history = json.load(f)
    ck = latest_checkpoint(ckpt_dir)
    if ck is not None:
        state = load_checkpoint(ck, state)
        # drop any history rows past the resumed step (written by a run
        # that died after the row but before its next checkpoint)
        history = [r for r in history if r["step"] <= int(state.step)]
        print(f"resumed from {ck} at step {int(state.step)}", flush=True)
    print(f"baseline (constant disparity): {json.dumps(const)}", flush=True)

    loader = DataLoader(train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
                        num_workers=4)
    t0 = time.time()
    done = int(state.step)
    while done < args.steps:
        for batch in device_prefetch(iter(loader), size=2, dtype=jnp.float32):
            state, metrics, _aux = step(state, batch)
            done = int(state.step)
            if done % args.eval_every == 0 or done >= args.steps:
                loss = float(metrics["loss"])
                md = float(metrics["mean_disparity"])
                m = evaluate(state.params, state.stats)
                rot_err, tdir_err = pose_errors(state.params, state.stats)
                rec = {
                    "step": done,
                    "loss": round(loss, 5),
                    "mean_disparity": round(md, 4),
                    "val_abs_rel": round(m["abs_rel"], 4),
                    "val_a1": round(m["a1"], 4),
                    "val_rmse": round(m["rmse"], 3),
                    "scale": round(m["scale"], 4),
                    "rot_err_deg": round(rot_err, 4),
                    "t_dir_err_deg": round(tdir_err, 2),
                    "elapsed_s": round(time.time() - t0, 1),
                }
                # Checkpoint FIRST, then the history row: a kill between
                # the two leaves a checkpoint without its row (harmlessly
                # re-evaluated on resume), never a history row ahead of the
                # newest checkpoint (which a resumed run would duplicate
                # with conflicting metrics).
                save_checkpoint(
                    os.path.join(ckpt_dir, f"ckpt-{done}"), state,
                    metadata={"step": done, "config": cfg.to_json()})
                history.append(rec)
                with open(history_path, "w") as f:
                    json.dump(history, f, indent=1)
                print(json.dumps(rec), flush=True)
                kept = sorted(
                    {p.split(".")[0] for p in os.listdir(ckpt_dir)
                     if p.startswith("ckpt-")},
                    key=lambda p: int(p.split("-")[1]))
                for old in kept[:-2]:
                    for ext in (".npz", ".json"):
                        fp = os.path.join(ckpt_dir, old + ext)
                        if os.path.exists(fp):
                            os.remove(fp)
                # a killed writer can leave a half-written tmp behind (the
                # os.replace promotion never ran — by design it cannot
                # corrupt a real checkpoint); sweep stale ones
                for fn in os.listdir(ckpt_dir):
                    if fn.endswith(".tmp.npz") and not fn.startswith(
                        f"ckpt-{done}"
                    ):
                        os.remove(os.path.join(ckpt_dir, fn))
            if done >= args.steps:
                break

    save_checkpoint(os.path.join(ckpt_dir, f"ckpt-{done}"), state,
                    metadata={"step": done, "config": cfg.to_json()})
    final = history[-1] if history else {}
    print(
        f"DONE step {done}: val_abs_rel {final.get('val_abs_rel')} "
        f"vs baseline {const['abs_rel']:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
