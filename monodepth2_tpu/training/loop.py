"""Epoch training driver (reference: train(), src/Monodepth.jl:70-199).

Differences from the reference, all deliberate: resumable (full state
checkpointed at save cadence), throughput metrics (images/sec), optional
data-parallel mesh, device-prefetched input pipeline, and everything driven
by TrainConfig instead of hard-coded paths.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, device_prefetch
from ..models import Model
from ..parallel import (
    PerHostSampler,
    make_mesh,
    make_parallel_train_step,
    shard_batch,
    shard_host_batch,
)
from ..utils.profiler import StepTimer, jit_trace_count
from ..utils.viz import save_disparity, save_warped
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .config import TrainConfig, TrainContext
from .state import create_train_state, make_train_step


def fit(
    cfg: TrainConfig,
    dataset,
    K: Optional[np.ndarray] = None,
    mesh=None,
    resume: bool = True,
    verbose: bool = True,
    max_steps: Optional[int] = None,
    progress: bool = False,
):
    """Train on `dataset` (items (3,H,W,C)); returns the final TrainState.

    K defaults to dataset.K. mesh=None → single device; a Mesh → GSPMD data
    parallelism with the global batch sharded over it.
    """
    if K is None:
        K = getattr(dataset, "K", None)
        if K is None:
            raise ValueError(
                "fit() needs camera intrinsics: pass K= or use a dataset "
                "exposing .K (KittiDataset/Depth10k/DChain all do)"
            )
    ctx = TrainContext.create(np.asarray(K), cfg.width, cfg.height)

    # frame-layout consistency (the reference hard-codes target 2 / sources
    # [1,3] in both TrainCache and the datasets; here both sides are
    # configurable, so mismatches must be caught, not trained through)
    ds_target = getattr(dataset, "target_id", None)
    ds_sources = getattr(dataset, "source_ids", None)
    if ds_target is not None and ds_target != cfg.target_id:
        raise ValueError(
            f"dataset target_id {ds_target} != cfg.target_id {cfg.target_id}"
        )
    if ds_sources is not None and tuple(ds_sources) != tuple(cfg.source_ids):
        raise ValueError(
            f"dataset source_ids {tuple(ds_sources)} != cfg.source_ids "
            f"{tuple(cfg.source_ids)}"
        )

    model = Model.create(
        depth=cfg.encoder_depth,
        in_channels=cfg.in_channels,
        scale_levels=cfg.scale_levels,
        pose_tz_init=cfg.pose_tz_init,
    )
    state, tx = create_train_state(model, cfg)

    start_epoch = 0
    if resume:
        ck = latest_checkpoint(cfg.save_dir)
        if ck is not None:
            state = load_checkpoint(ck, state)
            if verbose:
                print(f"resumed from {ck} at step {int(state.step)}")

    if mesh is not None:
        step = make_parallel_train_step(model, tx, ctx, cfg, mesh)
    else:
        step = jax.jit(make_train_step(model, tx, ctx, cfg), donate_argnums=(0,))

    os.makedirs(cfg.log_dir, exist_ok=True)
    os.makedirs(cfg.save_dir, exist_ok=True)

    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    timer = StepTimer()
    multi_process = jax.process_count() > 1
    if mesh is not None and multi_process:
        # each host loads only its rows of every global batch (SURVEY §2c:
        # "each host feeds its addressable devices"); the sampler owns the
        # global shuffle so it is identical on all processes
        sampler = PerHostSampler(dataset, cfg.batch_size, seed=cfg.seed)
        loader = DataLoader(
            sampler, sampler.per_host, shuffle=False, seed=cfg.seed
        )
    else:
        sampler = None
        loader = DataLoader(
            dataset, cfg.batch_size, shuffle=True, seed=cfg.seed
        )
    steps_per_epoch = len(loader)
    # epoch-position resume: the shuffle is a pure function of (seed, epoch)
    # and step counts batches, so (epoch, batch cursor) is recoverable from
    # step alone — no epoch is retrained and the data order continues exactly
    # where the crashed run stopped (the reference cannot resume at all,
    # src/Monodepth.jl:191-193)
    resumed_step = int(state.step)
    if resumed_step and steps_per_epoch:
        start_epoch = resumed_step // steps_per_epoch
        loader.epoch = start_epoch
        loader.skip_next = resumed_step % steps_per_epoch
    done = False
    for epoch in range(start_epoch, cfg.epochs):
        if done:
            break
        if sampler is not None:
            sampler.set_epoch(epoch)
        if multi_process and mesh is not None:
            # shard_host_batch does the (sharded) host→device placement
            batches = iter(loader)
        else:
            batches = device_prefetch(iter(loader), size=2, dtype=jnp.float32)
        if progress:
            # live loss/throughput bar (reference: ProgressMeter at
            # src/Monodepth.jl:154,196)
            from tqdm import tqdm

            batches = tqdm(
                batches, total=steps_per_epoch,
                desc=f"epoch {epoch + 1}/{cfg.epochs}", leave=False,
            )
        for i, batch in enumerate(batches):
            if mesh is not None:
                batch = (
                    shard_host_batch(np.asarray(batch), mesh)
                    if multi_process
                    else shard_batch(batch, mesh)
                )
            state, metrics, aux = step(state, batch)
            timer.tick()
            global_step = int(state.step)

            # retrace tripwire (SURVEY.md §5: perf-bug guard analog of
            # CUDA.allowscalar(false)) — a growing jit cache means changing
            # batch shapes/dtypes are forcing recompiles every step
            if global_step == 2 or global_step % 100 == 0:
                n_traces = jit_trace_count(step)
                if n_traces is not None and n_traces > 2:
                    print(
                        f"WARNING: train step retraced {n_traces}x — check for "
                        "varying batch shapes/dtypes in the input pipeline"
                    )

            if cfg.log_every and global_step % cfg.log_every == 0:
                loss = float(metrics["loss"])
                ips = timer.images_per_sec(cfg.batch_size)
                if progress and hasattr(batches, "set_postfix"):
                    batches.set_postfix(loss=f"{loss:.4f}", ips=f"{ips:.0f}")
                if verbose and not progress:
                    print(
                        f"epoch {epoch + 1}/{cfg.epochs} step {global_step} "
                        f"loss {loss:.5f} {ips:.1f} img/s"
                    )
                disp = np.asarray(aux["disparity"][0, ..., 0])
                save_disparity(disp, os.path.join(cfg.log_dir, f"disp-{global_step}.png"))
                for sid, w in enumerate(aux["warped"]):
                    save_warped(
                        np.asarray(w[0]),
                        os.path.join(cfg.log_dir, f"warp-{global_step}-{sid}.png"),
                    )

            if cfg.save_every and global_step % cfg.save_every == 0:
                save_checkpoint(
                    os.path.join(cfg.save_dir, f"ckpt-{global_step}"),
                    state,
                    metadata={"step": global_step, "loss": float(metrics["loss"]),
                              "config": cfg.to_json()},
                )

            if max_steps is not None and global_step >= max_steps:
                done = True
                break

    save_checkpoint(
        os.path.join(cfg.save_dir, f"ckpt-{int(state.step)}"),
        state,
        metadata={"step": int(state.step), "config": cfg.to_json()},
    )
    return state, model
