"""Migrate a training checkpoint to a different optimizer/schedule structure.

Why this exists: checkpoints store state leaves in tree order with a treedef
fingerprint (training/checkpoint.py), so resuming with a config whose optax
chain differs STRUCTURALLY from the one that wrote the checkpoint refuses to
load — correctly (leaves would unflatten into the wrong slots). The common
benign case is adding `lr_warmup_steps`/`lr_decay_steps` to a run that
started without them: `optax.adam(callable)` carries a `ScaleByScheduleState
(count)` leaf that the schedule-free state lacks, so even the
MDTPU_CKPT_SKIP_TREEDEF leaf-count fallback cannot help. (The reference
cannot resume training at all — it BSON-dumps only the model,
src/Monodepth.jl:191-193 — so it has no analog of this problem or this fix.)

This tool grafts the old state into the new structure by key path:

    python tools/migrate_checkpoint.py \
        --checkpoint runs/x/ckpts/ckpt-2500 \
        --new-config configs/with_decay.json \
        --out runs/x/ckpts/ckpt-2500

- The OLD config is read from the checkpoint's own JSON sidecar (fit() and
  tools/ssl_driving_experiment.py both store `cfg.to_json()` there).
- Leaves present in both structures copy across by identical key path
  (params, BN stats, Adam moments, RNG, step).
- NEW leaves keep their template initialization, except optimizer `count`
  scalars, which are set to the checkpoint's step so schedules that key on
  the optimizer count resume at the right point in the schedule.
- OLD leaves with no new home are dropped (reported).

The written checkpoint carries the NEW treedef fingerprint, so the next
resume under the new config loads normally.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def keypath_str(path) -> str:
    import jax

    return jax.tree_util.keystr(path)


def graft(old_state, new_tmpl, step: int):
    """Copy `old_state`'s leaves into `new_tmpl`'s structure by key path.

    Returns (migrated_state, copied_keys, fresh_keys, dropped_keys). Leaves
    absent from the new structure are dropped; new leaves keep the template
    init except scalar `count` leaves (optax schedule/clip counters), which
    are set to `step` so step-keyed schedules resume in the right place.
    """
    import jax

    old_leaves = {
        keypath_str(p): l
        for p, l in jax.tree_util.tree_flatten_with_path(old_state)[0]
    }
    new_flat, _ = jax.tree_util.tree_flatten_with_path(new_tmpl)

    copied, fresh = [], []
    out_leaves = []
    for path, tmpl_leaf in new_flat:
        key = keypath_str(path)
        if key in old_leaves and np.shape(old_leaves[key]) == np.shape(tmpl_leaf):
            out_leaves.append(old_leaves.pop(key))
            copied.append(key)
        else:
            leaf = tmpl_leaf
            if key.rsplit(".", 1)[-1].strip("'][ ") == "count" and np.shape(
                tmpl_leaf
            ) == ():
                leaf = jax.numpy.asarray(step, np.asarray(tmpl_leaf).dtype)
            out_leaves.append(leaf)
            fresh.append(key)
    dropped = sorted(old_leaves)
    # tree_flatten_with_path and tree_flatten agree on leaf order
    migrated = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(new_tmpl), out_leaves
    )
    return migrated, copied, fresh, dropped


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--checkpoint", required=True,
                    help="path prefix (no .npz) of the checkpoint to migrate")
    ap.add_argument("--new-config", required=True,
                    help="JSON file with the TrainConfig the run will resume under")
    ap.add_argument("--out", required=True,
                    help="output path prefix; may equal --checkpoint (in-place)")
    ap.add_argument("--cpu", action="store_true", default=True,
                    help="run on CPU (default; migration needs no accelerator)")
    ap.add_argument("--force", action="store_true",
                    help="write the migrated checkpoint even when leaves are "
                         "dropped or non-count leaves are re-initialized "
                         "(positional optax-chain keypaths shifted, e.g. a "
                         "transform added BEFORE adam — Adam moments would "
                         "restart from zero)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from monodepth2_tpu.models import Model
    from monodepth2_tpu.training import TrainConfig, create_train_state
    from monodepth2_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    with open(args.checkpoint + ".json") as f:
        meta = json.load(f)
    if "config" not in meta:
        sys.exit("checkpoint sidecar has no embedded config; pass the old "
                 "config by writing it into the sidecar's 'config' field")
    old_cfg = TrainConfig.from_json(meta["config"])
    with open(args.new_config) as f:
        new_cfg = TrainConfig.from_json(f.read())

    def template(cfg):
        # must mirror training/loop.py's construction exactly: omitting
        # scale_levels/pose_tz_init would rebuild a template whose decoder
        # structure differs from the checkpoint's for non-default configs
        model = Model.create(
            depth=cfg.encoder_depth,
            in_channels=cfg.in_channels,
            scale_levels=cfg.scale_levels,
            pose_tz_init=cfg.pose_tz_init,
        )
        state, _ = create_train_state(model, cfg)
        return state

    old_state = load_checkpoint(args.checkpoint, template(old_cfg))
    new_tmpl = template(new_cfg)
    step = int(old_state.step)
    migrated, copied, fresh, dropped = graft(old_state, new_tmpl, step)

    # keypaths into the optax chain are POSITIONAL: a transform added ahead
    # of adam shifts every moment path, so mu/nu land in dropped and zero-
    # init as fresh. That silent wipe must be a refusal, not a success.
    bad_fresh = [
        k for k in fresh if k.rsplit(".", 1)[-1].strip("'][ ") != "count"
    ]
    if (dropped or bad_fresh) and not args.force:
        sys.exit(
            "refusing to write a lossy migration (re-run with --force to "
            f"accept):\n  dropped (old leaves with no new home): {dropped}\n"
            f"  re-initialized (non-count new leaves): {bad_fresh}\n"
            "Likely cause: the new optax chain re-orders/adds transforms, "
            "shifting positional keypaths. Migrate in two hops (first match "
            "the old chain order) or accept the re-init with --force."
        )

    meta_out = dict(meta)
    meta_out["config"] = new_cfg.to_json()
    meta_out["migrated_from_treedef"] = meta.get("treedef_sha")
    meta_out.pop("treedef_sha", None)  # save_checkpoint re-stamps it
    meta_out.pop("n_leaves", None)
    save_checkpoint(args.out, migrated, metadata=meta_out)

    print(json.dumps({
        "step": step,
        "copied": len(copied),
        "fresh": fresh,
        "dropped": dropped,
        "out": args.out,
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
