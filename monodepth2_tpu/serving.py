"""AOT-exported serving artifacts (jax.export / StableHLO).

The reference's only deployment story is BSON.load of the whole Flux model
into a fresh Julia session (src/Monodepth.jl:207-208) — inference requires
the full training stack. A TPU-native framework serves from a compiler
artifact instead: `export_inference` ahead-of-time lowers the jitted
disparity+depth inference function to serialized StableHLO with the weights
baked in as constants, producing a single self-contained file that any JAX
process (CPU or TPU, no model code, no checkpoint plumbing) can
`load_inference` and call. The batch dimension is exported symbolically so
one artifact serves any batch size.

Format: `<path>` is a zip with `model.stablehlo` (jax.export bytes) and
`meta.json` (input spec + depth-range metadata for clients).
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import Model
from .ops.geometry import disparity_to_depth
from .training.config import TrainConfig

_ARTIFACT = "model.stablehlo"
_META = "meta.json"


def make_inference_fn(model: Model, params, stats, cfg: TrainConfig):
    """Pure (x) -> {"disparity", "depth"} closing over weights.

    x: (N, H, W, C) float32 in [0, 1]. disparity: (N, H, W, 1) sigmoid
    output at the finest scale; depth: metric-up-to-scale via
    disparity_to_depth (reference src/utils.jl:175-179).

    cfg.compute_dtype="bfloat16" bakes a bf16 network into the artifact
    (fp32 I/O either way): the same mixed-precision recipe as training
    (training/loss.py:55-70), geometry (disparity→depth) kept fp32.
    """
    if cfg.compute_dtype == "bfloat16":
        from .nn.core import cast_tree

        params = cast_tree(params, jnp.bfloat16)
        stats = cast_tree(stats, jnp.bfloat16)

    def infer(x):
        if cfg.compute_dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)
        disp = model.eval_disparity(params, stats, x)[-1].astype(jnp.float32)
        return {
            "disparity": disp,
            "depth": disparity_to_depth(disp, cfg.min_depth, cfg.max_depth),
        }

    return infer


def export_inference(
    model: Model,
    params,
    stats,
    cfg: TrainConfig,
    path: str,
    platforms: Tuple[str, ...] = ("tpu", "cpu"),
    batch_size: Optional[int] = None,
) -> None:
    """Serialize the inference function to `path` (zip: StableHLO + meta).

    `batch_size=None` exports a symbolic batch dimension (one artifact, any
    N at serve time); pass an int to pin it (slightly faster serve-time
    compile, and a fallback if a future op rejects symbolic shapes).
    """
    infer = make_inference_fn(model, params, stats, cfg)
    h, w, c = cfg.height, cfg.width, cfg.in_channels
    if batch_size is None:
        (b,) = jax.export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, h, w, c), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, h, w, c), jnp.float32)
    exported = jax.export.export(jax.jit(infer), platforms=list(platforms))(spec)
    blob = exported.serialize()
    meta = {
        "input_shape": [batch_size, h, w, c],
        "input_dtype": "float32",
        "outputs": ["disparity", "depth"],
        "min_depth": cfg.min_depth,
        "max_depth": cfg.max_depth,
        "platforms": list(platforms),
        "encoder_depth": cfg.encoder_depth,
        "compute_dtype": cfg.compute_dtype,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_ARTIFACT, blob)
        z.writestr(_META, json.dumps(meta, indent=2))
    os.replace(tmp, path)


class ServedModel:
    """A loaded artifact: callable, no model code or checkpoint needed."""

    def __init__(self, exported, meta: dict, device=None):
        self._exported = exported
        self.meta = meta
        self._call = jax.jit(exported.call)
        self._device = device if device is not None else jax.devices()[0]

    def __call__(self, x) -> dict:
        """x: (N, H, W, C) float32 in [0,1] -> dict of device arrays."""
        # Pin the input to one device placement: exported modules embed
        # their in_shardings, so jit(exported.call) specializes on the
        # argument's committed-ness — a caller alternating host arrays /
        # uncommitted outputs / committed eager results would trigger a
        # full recompile (~15 s on the remote compiler) per placement
        # flavor. device_put on an already-placed array is a no-op view.
        # validate BEFORE the device_put: a wrong-resolution batch must be
        # rejected on the host, not after paying a multi-second H2D transfer
        # of ~41 MB over the ~15-20 MB/s tunnel for an input about to raise
        shape = np.shape(x)
        want = self.meta["input_shape"]
        if list(shape[1:]) != want[1:]:
            raise ValueError(
                f"input {shape} incompatible with exported spec "
                f"(N, {want[1]}, {want[2]}, {want[3]})"
            )
        if want[0] is not None and shape[0] != want[0]:
            raise ValueError(
                f"artifact was exported with fixed batch {want[0]}, "
                f"got {shape[0]}"
            )
        x = jax.device_put(jnp.asarray(x, jnp.float32), self._device)
        return self._call(x)


def load_inference(path: str) -> ServedModel:
    """Deserialize an `export_inference` artifact."""
    with zipfile.ZipFile(path) as z:
        blob = z.read(_ARTIFACT)
        meta = json.loads(z.read(_META))
    return ServedModel(jax.export.deserialize(blob), meta)
