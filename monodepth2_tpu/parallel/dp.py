"""Data-parallel train step over a device mesh.

Two equivalent paths (both tested on an 8-device CPU mesh; both lower the
gradient reduction to an ICI all-reduce on TPU):

* GSPMD (`make_parallel_train_step`): jit with NamedShardings — state
  replicated, batch sharded on its leading axis. The global-batch mean in the
  loss makes XLA insert the all-reduce automatically; BatchNorm statistics are
  likewise global-batch exact. This is the default: simplest and lets the
  compiler overlap the collective with the backward pass.

* shard_map (`make_shardmap_train_step`): explicit per-device step with
  `lax.pmean` on gradients/stats/loss (the step factory's `axis_name` hook,
  training/state.py) — the explicit-collective escape hatch for when manual
  scheduling is needed.

The reference is single-process single-GPU (SURVEY.md §2c); this layer is new
capability scoped by BASELINE.json's north star.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..training.config import TrainConfig, TrainContext
from ..training.state import TrainState, make_train_step


def shard_batch(batch, mesh: Mesh, axis: str = "data", stacked: bool = False):
    """Place a host batch sharded over the mesh's data axis.

    stacked=True for (K, N, ...) steps_per_call stacks: the scan axis K is
    replicated, the batch axis N sharded.
    """
    spec = P(None, axis) if stacked else P(axis)
    return jax.device_put(batch, NamedSharding(mesh, spec))


def make_parallel_train_step(
    model, tx, ctx: TrainContext, cfg: TrainConfig, mesh: Mesh, axis: str = "data",
    donate: bool = True,
) -> Callable:
    """GSPMD data-parallel step: returns jitted (state, batch) -> (state, metrics, aux).

    Batch must be sharded (or shardable) on its leading axis; cfg.batch_size
    is the GLOBAL batch and must divide by mesh size.
    """
    if cfg.batch_size % mesh.size != 0:
        raise ValueError(
            f"global batch {cfg.batch_size} not divisible by mesh size {mesh.size}"
        )
    step_fn = make_train_step(model, tx, ctx, cfg, axis_name=None)
    replicated = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, batch_sh),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_scanned_train_step(
    model, tx, ctx: TrainContext, cfg: TrainConfig, mesh: Mesh, axis: str = "data",
    donate: bool = True,
) -> Callable:
    """GSPMD data-parallel steps_per_call variant: batch stacked (K, N, ...),
    scan axis replicated, batch axis sharded (see training/state.py
    make_scanned_train_step for why K steps ride one dispatch)."""
    from ..training.state import make_scanned_train_step

    if cfg.batch_size % mesh.size != 0:
        raise ValueError(
            f"global batch {cfg.batch_size} not divisible by mesh size {mesh.size}"
        )
    step_fn = make_scanned_train_step(model, tx, ctx, cfg, axis_name=None)
    replicated = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(None, axis))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, batch_sh),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_shardmap_train_step(
    model, tx, ctx: TrainContext, cfg: TrainConfig, mesh: Mesh, axis: str = "data",
) -> Callable:
    """Explicit-collective step via shard_map + lax.pmean."""
    if cfg.batch_size % mesh.size != 0:
        raise ValueError(
            f"global batch {cfg.batch_size} not divisible by mesh size {mesh.size}"
        )
    per_device = make_train_step(model, tx, ctx, cfg, axis_name=axis)

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P(), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
