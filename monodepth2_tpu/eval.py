"""Inference + evaluation harness.

Reference: eval_image/eval_video (src/Monodepth.jl:201-248) run frame-at-a-
time with a device round-trip per frame; here inference is batched under one
jitted function (the improvement SURVEY.md §3.3 calls for). Also adds the
KITTI AbsRel/δ accuracy evaluation the reference never implements
(BASELINE.md: "stand up a KITTI AbsRel/δ eval harness").
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .models import Model
from .ops.geometry import disparity_to_depth
from .training.checkpoint import load_checkpoint
from .training.config import TrainConfig
from .training.state import create_train_state
from .utils.metrics import depth_metrics
from .utils.viz import save_disparity


def sidecar_config(checkpoint_path: str) -> Optional[TrainConfig]:
    """The training config recorded in the checkpoint's JSON sidecar
    (training/loop.py save_checkpoint metadata), or None for pre-sidecar
    checkpoints. Consumers (export, inference) should derive shapes/model
    architecture from this rather than CLI defaults — omitting
    --in-channels/--encoder-depth at export time must not silently export a
    different architecture than the one trained (ADVICE r3)."""
    import json as _json

    meta_path = checkpoint_path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = _json.load(f)
        if "config" in meta:
            return TrainConfig.from_json(meta["config"])
    return None


def load_model(cfg: TrainConfig, checkpoint_path: str):
    """Rebuild model + restore checkpointed params/stats for inference.

    The TrainState template must match the TRAINING-time structure — the
    optax chain's treedef depends on grad_clip / lr schedules, so an
    inference invocation that omits `--grad-clip` would otherwise build a
    mismatched template and trip the checkpoint fingerprint check. The
    sidecar records the training config (training/loop.py save_checkpoint
    metadata); build the template from it when present and keep the
    caller's cfg for inference-side parameters only.
    """
    tmpl_cfg = sidecar_config(checkpoint_path) or cfg
    model = Model.create(
        depth=tmpl_cfg.encoder_depth,
        in_channels=tmpl_cfg.in_channels,
        scale_levels=tmpl_cfg.scale_levels,
    )
    state, _ = create_train_state(model, tmpl_cfg)
    state = load_checkpoint(checkpoint_path, state)
    return model, state.params, state.stats


def make_infer_fn(model, params, stats, compute_dtype: str = "float32"):
    """Jitted batched disparity inference: (N,H,W,C) -> (N,H,W) finest scale.

    compute_dtype="bfloat16" runs the network on the MXU in bf16 (the same
    mixed-precision recipe as training, training/loss.py:55-70) and returns
    fp32 disparity — ~2x serving throughput at a ~1e-2 max-disparity delta
    (sigmoid output, so bounded; parity pinned in tests/test_eval.py)."""
    if compute_dtype == "bfloat16":
        from .nn.core import cast_tree

        params = cast_tree(params, jnp.bfloat16)
        stats = cast_tree(stats, jnp.bfloat16)

    @jax.jit
    def infer(x):
        if compute_dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)
        disparities = model.eval_disparity(params, stats, x)
        return disparities[-1][..., 0].astype(jnp.float32)

    return infer


def _load_image(path, width: int, height: int, grayscale: bool) -> np.ndarray:
    """Decode + preprocess one image exactly as the training pipeline does
    (data/kitti.py): convert, BILINEAR resize to (W, H), [0,1] float32.
    `path` is a filesystem path or a file-like object (server.py feeds
    request bodies through here so the served path can never silently
    diverge from this preprocessing)."""
    with Image.open(path) as im:
        im = im.convert("L" if grayscale else "RGB")
        im = im.resize((width, height), Image.BILINEAR)
        arr = np.asarray(im, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def _batched(frames: Iterable[np.ndarray], batch_size: int) -> Iterator[np.ndarray]:
    buf: List[np.ndarray] = []
    for f in frames:
        buf.append(f)
        if len(buf) == batch_size:
            yield np.stack(buf)
            buf = []
    if buf:
        yield np.stack(buf)


def eval_images(
    cfg: TrainConfig,
    checkpoint_path: str,
    image_dir: str,
    out_dir: str,
    batch_size: int = 8,
    limit: Optional[int] = None,
) -> int:
    """Directory of frames -> disparity heatmap PNGs (reference eval_image).

    Returns the number of frames processed."""
    model, params, stats = load_model(cfg, checkpoint_path)
    infer = make_infer_fn(model, params, stats, cfg.compute_dtype)
    files = sorted(
        f
        for f in os.listdir(image_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if limit:
        files = files[:limit]
    os.makedirs(out_dir, exist_ok=True)

    frames = (
        _load_image(os.path.join(image_dir, f), cfg.width, cfg.height, cfg.in_channels == 1)
        for f in files
    )
    n = 0
    for batch in _batched(frames, batch_size):
        disp = np.asarray(infer(jnp.asarray(batch)))
        for j in range(disp.shape[0]):
            save_disparity(disp[j], os.path.join(out_dir, f"d-{n + j}.png"))
        n += disp.shape[0]
    return n


def eval_video(
    cfg: TrainConfig,
    checkpoint_path: str,
    video_path: str,
    out_dir: str,
    batch_size: int = 8,
    limit: Optional[int] = None,
) -> int:
    """Video stream -> disparity heatmap PNGs (reference eval_video,
    src/Monodepth.jl:229-248), batched; decodes via OpenCV (imageio-ffmpeg
    fallback when available)."""
    model, params, stats = load_model(cfg, checkpoint_path)
    infer = make_infer_fn(model, params, stats, cfg.compute_dtype)
    os.makedirs(out_dir, exist_ok=True)

    def raw_frames():
        try:
            import cv2

            cap = cv2.VideoCapture(video_path)
            try:
                while True:
                    ok, bgr = cap.read()
                    if not ok:
                        return
                    yield bgr[..., ::-1]  # BGR -> RGB
            finally:
                cap.release()
        except ImportError:
            import imageio.v3 as iio

            yield from iio.imiter(video_path)

    def frames():
        for i, frame in enumerate(raw_frames()):
            if limit and i >= limit:
                return
            im = Image.fromarray(frame).convert("L" if cfg.in_channels == 1 else "RGB")
            im = im.resize((cfg.width, cfg.height), Image.BILINEAR)
            arr = np.asarray(im, np.float32) / 255.0
            yield arr[..., None] if arr.ndim == 2 else arr

    n = 0
    for batch in _batched(frames(), batch_size):
        disp = np.asarray(infer(jnp.asarray(batch)))
        for j in range(disp.shape[0]):
            save_disparity(disp[j], os.path.join(out_dir, f"d-{n + j}.png"))
        n += disp.shape[0]
    return n


def eval_depth_accuracy(
    cfg: TrainConfig,
    checkpoint_path: str,
    images: Sequence[np.ndarray],
    gt_depths: Sequence[np.ndarray],
    batch_size: int = 8,
    min_depth: float = 1e-3,
    max_depth: float = 80.0,
):
    """AbsRel/δ<1.25 etc. against ground-truth depth maps, median-scaled.

    images: (H,W,C) float frames at model resolution; gt_depths at any
    resolution (prediction is resized to match each gt map).
    """
    model, params, stats = load_model(cfg, checkpoint_path)
    infer = make_infer_fn(model, params, stats, cfg.compute_dtype)

    per_image = []
    idx = 0
    for batch in _batched(iter(images), batch_size):
        disp = np.asarray(infer(jnp.asarray(batch)))
        depth = np.asarray(
            disparity_to_depth(jnp.asarray(disp), cfg.min_depth, cfg.max_depth)
        )
        for j in range(depth.shape[0]):
            gt = np.asarray(gt_depths[idx])
            pred = np.asarray(
                Image.fromarray(depth[j]).resize(
                    (gt.shape[1], gt.shape[0]), Image.BILINEAR
                )
            )
            per_image.append(
                depth_metrics(pred, gt, min_depth=min_depth, max_depth=max_depth)
            )
            idx += 1
    keys = per_image[0].keys()
    return {k: float(np.mean([m[k] for m in per_image])) for k in keys}
