"""simple_depth: fit a raw per-pixel disparity map + two SE(3) poses to a
single image triplet by gradient descent — no neural network.

Reference: src/simple_depth.jl (slow_depth :1-62, driver :64-97). The
reference's inner call to `warp(...)` is undefined in its codebase (latent
bug, SURVEY.md §3.4); here the warp is the real full-resolution chain
disparity→depth→backproject→SE(3)→project→grid-sample from ops.losses.

The whole optimization is one jitted step function re-invoked 500× — on TPU
the per-iter cost is a single fused XLA program.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .ops.geometry import compose_transform, pixel_grid
from .ops.losses import prediction_loss, smooth_loss, warp_images

Array = jax.Array


def fit_simple_depth(
    frames: Array,
    K: np.ndarray,
    n_iters: int = 500,
    lr: float = 3e-4,
    target_id: int = 1,
    source_ids: Sequence[int] = (0, 2),
    min_depth: float = 0.1,
    max_depth: float = 100.0,
    init_disparity: float = 0.5,
    init_rvec: Sequence[float] = (0.0, 0.0, 0.01),
    log_every: int = 5,
    callback: Optional[Callable] = None,
):
    """frames (1,L,H,W,C) float; K (3,3). Returns dict with the fitted
    disparity (1,H,W,1), poses [(rvec,tvec)], and loss history.

    Matches the reference's initialization (disp 0.5, rvec [0,0,0.01],
    ADAM 3e-4, 500 iters — src/simple_depth.jl:8-22).
    """
    n, l, h, w, c = frames.shape
    dtype = frames.dtype
    K = jnp.asarray(K, dtype)
    invK = jnp.asarray(np.linalg.inv(np.asarray(K, np.float64)), dtype)
    grid = pixel_grid(w, h, dtype)
    target = frames[:, target_id]
    inverse = [sid < target_id for sid in source_ids]

    params = {
        "disp": jnp.full((n, h, w, 1), init_disparity, dtype),
        "rvec": jnp.tile(jnp.asarray(init_rvec, dtype)[None, None], (len(source_ids), n, 1)),
        "tvec": jnp.zeros((len(source_ids), n, 3, 1), dtype),
    }

    def loss_fn(p):
        transforms = [
            compose_transform(p["rvec"][i], p["tvec"][i], invert=inv)
            for i, inv in enumerate(inverse)
        ]
        warped = warp_images(
            p["disp"], frames, transforms, K, invK, grid,
            source_ids, min_depth, max_depth,
        )
        warp_l = jnp.mean(prediction_loss(warped, target))
        smooth_l = smooth_loss(p["disp"][..., 0], target)
        return warp_l + smooth_l, warped

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        (loss, warped), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss, warped

    history = []
    warped = None
    for it in range(1, n_iters + 1):
        params, opt_state, loss, warped = step(params, opt_state)
        if it % log_every == 0 or it == 1:
            history.append((it, float(loss)))
            if callback is not None:
                callback(it, params, float(loss), warped)

    poses = [
        (params["rvec"][i], params["tvec"][i]) for i in range(len(source_ids))
    ]
    return {
        "disparity": params["disp"],
        "poses": poses,
        "history": history,
        "warped": warped,
    }
