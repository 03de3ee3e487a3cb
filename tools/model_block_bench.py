"""Model-layer breakdown + inference throughput on the real chip.

Times (a) encoder / depth decoder / pose decoder forward blocks, (b) the
reflect-pad cost (decoder rebuilt with zero padding — NOT numerically
equivalent, ablation only), and (c) batched jit inference throughput
(`eval_disparity`, the serving path the reference runs frame-at-a-time,
src/Monodepth.jl:213-222).

Run:  python tools/model_block_bench.py [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, iters=30):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(c, _):
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
            return jnp.float32(s) * jnp.float32(1e-20) + c * 0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12,
                    help="images through the encoder (train: 3 frames x 4)")
    ap.add_argument("--infer-batch", type=int, default=64)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monodepth2_tpu.models import Model

    model = Model.create(depth=18, in_channels=1)
    params, stats = model.init(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), t)
    pb, sb = cast(params), cast(stats)

    N, H, W = args.batch, args.height, args.width
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(N, H, W, 1)), jnp.bfloat16
    )

    rows = {}

    enc = lambda: model.encoder(pb["encoder"], sb["encoder"], x, train=False)[0]
    rows["encoder_fwd"] = timed(enc)

    feats = jax.jit(
        lambda: model.encoder(pb["encoder"], sb["encoder"], x, train=False)[0]
    )()

    dd = lambda: model.depth_decoder(
        pb["depth_decoder"], sb["depth_decoder"], feats, train=False
    )[0]
    rows["depth_decoder_fwd"] = timed(dd)

    pd = lambda: model.pose_decoder(
        pb["pose_decoder"], sb["pose_decoder"], (feats[-1], feats[-1])
    )
    rows["pose_decoder_fwd"] = timed(pd)

    # reflect-pad ablation: patch Conv so 'reflect' becomes numeric padding
    # fused into the conv (no materialized pad copy). Numerics differ at the
    # 1-px border - this isolates the pad-materialization cost only.
    import dataclasses as _dc

    import monodepth2_tpu.nn.core as _core

    _orig_call = _core.Conv.__call__

    def _fused_pad_call(self, params, stats, xx, train=False):
        if self.padding == "reflect":
            k = self.kernel if isinstance(self.kernel, int) else self.kernel[0]
            self = _dc.replace(self, padding=(k - 1) // 2)
        return _orig_call(self, params, stats, xx, train)

    _core.Conv.__call__ = _fused_pad_call
    try:
        zfun = lambda: model.depth_decoder(
            pb["depth_decoder"], sb["depth_decoder"], feats, train=False
        )[0]
        rows["depth_decoder_fwd_zeropad_fused"] = timed(zfun)
    finally:
        _core.Conv.__call__ = _orig_call

    for k, v in rows.items():
        if isinstance(v, float):
            rows[k] = round(v * 1e3, 3)
    print(json.dumps({"batch": N, **rows}), flush=True)

    # inference throughput (serving path)
    bi = args.infer_batch
    xi = jnp.asarray(
        np.random.default_rng(1).uniform(size=(bi, H, W, 1)), jnp.float32
    )

    def infer():
        return model.eval_disparity(pb, sb, xi.astype(jnp.bfloat16))[-1]

    dt = timed(infer)
    print(json.dumps({
        "metric": "inference_disparity_images_per_sec",
        "batch": bi,
        "ms_per_batch": round(dt * 1e3, 2),
        "img_per_sec": round(bi / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
