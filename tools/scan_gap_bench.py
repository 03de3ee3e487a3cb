"""Root-cause the r2 "state-threaded scan 14.2 ms vs const-params scan
9.6 ms" gap (VERDICT r2 weak #2 / next #2).

Hypothesis under test: the 9.6 ms const-params probe (profile_breakdown.py
`full`) returned `metrics["loss"] + 0·sum(new_params_leaf0)` — which lets
XLA dead-code-eliminate (a) the optimizer update of every leaf but one and
(b) any backward slice feeding only DCE'd updates, and hoist the bf16 param
cast out of the scan. If so, the "gap" is a measurement artifact and the
threaded number is the honest program floor.

Variants (all batch 4, bf16, Pallas warp, K=10-step in-jit scan, chained
float() sync per CLAUDE.md):
  threaded    production make_scanned_train_step, donated state (the real thing)
  const_dce   r2's probe reproduced verbatim (expect ~9.6 — the artifact)
  const_all   const params, but the result depends on EVERY new-state leaf
              (expect ≈ threaded if the DCE hypothesis is right)
  no_unroll   scan all K micro-steps (no unrolled first step shaping aux)
  no_aux      threaded scan that drops aux/metrics except final loss

Run on the real chip:  python tools/scan_gap_bench.py
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
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--calls", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monodepth2_tpu.models import Model
    from monodepth2_tpu.training import (
        TrainConfig,
        TrainContext,
        create_train_state,
        make_scanned_train_step,
        make_train_step,
    )

    K_ = args.k
    cfg = TrainConfig(
        target_size=(416, 128), batch_size=args.batch_size, in_channels=1,
        compute_dtype="bfloat16", warp_method="pallas", steps_per_call=K_,
    )
    model = Model.create(depth=18, in_channels=1)
    state0, tx = create_train_state(model, cfg)
    K = np.asarray(
        [[482.0, 0, cfg.width / 2], [0, 482.0, cfg.height / 2], [0, 0, 1.0]]
    )
    ctx = TrainContext.create(K, cfg.width, cfg.height)
    rng = np.random.default_rng(0)
    stack = jnp.asarray(
        rng.uniform(size=(K_, cfg.batch_size, 3, cfg.height, cfg.width, 1)),
        jnp.float32,
    )
    base = make_train_step(model, tx, ctx, cfg)
    results = {}

    def timeit(name, call, sync, n_calls=args.calls, per_call_steps=K_):
        # warmup/compile x2 with a real host sync
        s = call()
        _ = sync(s)
        s = call()
        _ = sync(s)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n_calls):
                s = call()
            _ = sync(s)
            dt = (time.perf_counter() - t0) / (n_calls * per_call_steps)
            best = dt if best is None else min(best, dt)
        results[name] = round(best * 1e3, 3)
        print(f"{name}: {best * 1e3:.3f} ms/step", flush=True)

    # ---- threaded: the production path ----------------------------------
    step = jax.jit(make_scanned_train_step(model, tx, ctx, cfg), donate_argnums=(0,))
    st = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state0)

    def call_threaded():
        nonlocal st
        st, m, _ = step(st, stack)
        return m

    timeit("threaded", call_threaded, lambda m: float(m["loss"][-1]))

    # ---- const_dce: r2's probe, verbatim semantics ----------------------
    @jax.jit
    def const_dce(params, frames):
        def body(c, _):
            stx = state0._replace(params=params)
            new_state, metrics, _ = base(stx, frames + c)
            s = metrics["loss"] + 0.0 * jnp.sum(
                jax.tree_util.tree_leaves(new_state.params)[0]
            )
            return jnp.float32(s) * jnp.float32(1e-20), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K_)
        return c

    timeit(
        "const_dce",
        lambda: const_dce(state0.params, stack[0]),
        lambda c: float(c),
    )

    # ---- const_all: same shape of probe, but NOTHING is dead ------------
    @jax.jit
    def const_all(params, frames):
        def body(c, _):
            stx = state0._replace(params=params)
            new_state, metrics, _ = base(stx, frames + c)
            s = metrics["loss"] + 1e-20 * sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(
                    (new_state.params, new_state.opt_state)
                )
            )
            return jnp.float32(s) * jnp.float32(1e-20), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K_)
        return c

    timeit(
        "const_all",
        lambda: const_all(state0.params, stack[0]),
        lambda c: float(c),
    )

    # ---- no_unroll: scan all K micro-steps, aux dropped -----------------
    def scanned_no_unroll(state, frames_stack):
        def body(stx, frames):
            st2, metrics, _aux = base(stx, frames)
            return st2, metrics["loss"]

        final, losses = jax.lax.scan(body, state, frames_stack)
        return final, losses

    step_nu = jax.jit(scanned_no_unroll, donate_argnums=(0,))
    st2 = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state0)

    def call_nu():
        nonlocal st2
        st2, losses = step_nu(st2, stack)
        return losses

    timeit("no_unroll", call_nu, lambda l: float(l[-1]))

    # ---- no_aux: production scan but metrics only (aux DCE'd) -----------
    scanned = make_scanned_train_step(model, tx, ctx, cfg)

    def scanned_no_aux(state, frames_stack):
        st3, metrics, _aux = scanned(state, frames_stack)
        return st3, metrics["loss"]

    step_na = jax.jit(scanned_no_aux, donate_argnums=(0,))
    st3 = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), state0)

    def call_na():
        nonlocal st3
        st3, losses = step_na(st3, stack)
        return losses

    timeit("no_aux", call_na, lambda l: float(l[-1]))

    print("RESULTS " + json.dumps(results), flush=True)

    # HLO copy audit of the production program
    try:
        txt = step.lower(st, stack).compile().as_text()
        n_copy = txt.count(" copy(")
        n_fusion = txt.count(" fusion(")
        print(f"hlo: {n_copy} copy ops, {n_fusion} fusions", flush=True)
    except Exception as e:
        print(f"hlo audit failed: {e}", flush=True)


if __name__ == "__main__":
    main()
