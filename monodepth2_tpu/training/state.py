"""Train state + jitted train step.

The reference's per-iteration `gradient`+`update!` (src/Monodepth.jl:170-176)
becomes a single donated, jitted function: value_and_grad(train_loss) → optax
update → new state, all on device. The warmup compile the reference does with
a batch-1 pass (src/Monodepth.jl:128-146) is just XLA's first-call trace here.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .config import TrainConfig, TrainContext
from .loss import train_loss
from ..ops.losses import automasking_loss

Array = jax.Array


class TrainState(NamedTuple):
    step: Array  # ()
    params: Any
    stats: Any  # BatchNorm running statistics
    opt_state: Any
    rng: Array  # PRNG key, folded per step


def _lr_schedule(cfg: TrainConfig):
    """Learning rate as a function of step: linear warmup over
    `lr_warmup_steps` (identical to optax.linear_schedule(0, lr, n)),
    then a one-time x`lr_decay_factor` step decay at `lr_decay_steps`.
    Returns the plain float when both knobs are off so the optimizer
    state stays schedule-free (checkpoint-compatible with older runs)."""
    if cfg.lr_warmup_steps == 0 and cfg.lr_decay_steps == 0:
        return cfg.lr

    def schedule(step):
        lr = jnp.asarray(cfg.lr, jnp.float32)
        if cfg.lr_warmup_steps > 0:
            lr = lr * jnp.minimum(
                jnp.asarray(step, jnp.float32) / cfg.lr_warmup_steps, 1.0
            )
        if cfg.lr_decay_steps > 0:
            lr = jnp.where(
                step >= cfg.lr_decay_steps, lr * cfg.lr_decay_factor, lr
            )
        return lr

    return schedule


def create_train_state(model, cfg: TrainConfig, rng: Optional[Array] = None):
    """Initialize params/stats/optimizer. Returns (state, optimizer)."""
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed)
    rng, init_key = jax.random.split(rng)
    params, stats = model.init(init_key)
    schedule = _lr_schedule(cfg)
    chain = []
    if cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(optax.adam(schedule))
    tx = optax.chain(*chain)
    opt_state = tx.init(params)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            stats=stats,
            opt_state=opt_state,
            rng=rng,
        ),
        tx,
    )


def make_train_step(
    model, tx, ctx: TrainContext, cfg: TrainConfig, axis_name: Optional[str] = None
) -> Callable:
    """Build the (un-jitted) train step; caller wraps in jit/shard_map.

    If `axis_name` is set, gradients (and BN stats) are mean-reduced across
    that mesh axis — the data-parallel allreduce that rides ICI
    (SURVEY.md §2c; the reference is single-device and has no analog).
    """

    def step_fn(state: TrainState, batch):
        # batch: frames (N,L,H,W,C), or {"frames": ..., "K": (N,3,3)} when
        # per-item intrinsics ride with the data (config.py per_item_K;
        # the reference trains a whole DChain with one K, src/Monodepth.jl:99)
        if isinstance(batch, dict):
            frames, Ks = batch["frames"], batch["K"]
        else:
            frames, Ks = batch, None
        auto_loss = None
        if cfg.automasking:
            auto_loss = automasking_loss(
                frames, frames[:, cfg.target_id], cfg.source_ids
            )

        disp_reg_weight = None
        if cfg.disp_reg > 0 and cfg.disp_reg_steps > 0:
            frac = jnp.clip(
                1.0 - state.step.astype(jnp.float32) / cfg.disp_reg_steps,
                0.0,
                1.0,
            )
            disp_reg_weight = cfg.disp_reg * frac

        def loss_fn(params):
            loss, aux = train_loss(
                model, params, state.stats, frames, ctx, cfg,
                auto_loss=auto_loss, train=True,
                disp_reg_weight=disp_reg_weight, Ks=Ks,
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_stats = aux["stats"]
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            stats=new_stats,
            opt_state=new_opt_state,
            rng=jax.random.fold_in(state.rng, state.step),
        )
        # mean disparity is the saturation tripwire: pinned at ~0 or ~1 means
        # the sigmoid head collapsed to max/min depth (see VALIDATION.md)
        metrics = {"loss": loss, "mean_disparity": jnp.mean(aux["disparity"])}
        return new_state, metrics, aux

    return step_fn


def make_scanned_train_step(
    model, tx, ctx: TrainContext, cfg: TrainConfig, axis_name: Optional[str] = None
) -> Callable:
    """K train steps per dispatch via lax.scan over a stacked batch.

    Python-dispatching one step at a time costs ~4.3 ms/step of host latency
    through the remote-device tunnel (BASELINE.md block table: 17.9 ms
    dispatched vs 13.6 ms scanned at batch 4) — ~25% of the wall time at the
    reference's training configuration. Scanning K steps inside one jitted
    call amortizes that to ~4.3/K ms. The reference has no analog (its
    per-iteration update is host-driven, src/Monodepth.jl:152-176).

    Takes frames stacked (K, N, L, H, W, C); returns (state, metrics, aux)
    where metrics are (K,)-stacked scalars (metrics["loss"][-1] is the last
    micro-step) and aux (disparity/warped, for viz) is from the last
    micro-step only.
    """
    base = make_train_step(model, tx, ctx, cfg, axis_name)

    def scanned(state: TrainState, frames_stack):
        # frames_stack: (K,N,L,H,W,C) array or a pytree of (K,...)-leading
        # leaves (per-item-K batches); lax.scan handles either natively.
        # first micro-step runs unrolled to shape the aux carry
        index = lambda i: jax.tree_util.tree_map(lambda x: x[i], frames_stack)
        st, m0, aux0 = base(state, index(0))

        def body(carry, frames):
            st, _ = carry
            st2, metrics, aux = base(st, frames)
            return (st2, aux), metrics

        rest = jax.tree_util.tree_map(lambda x: x[1:], frames_stack)
        (final_state, aux), ms = jax.lax.scan(body, (st, aux0), rest)
        metrics = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), m0, ms
        )
        return final_state, metrics, aux

    return scanned
