"""Serving-artifact tests (serving.py): AOT export -> load -> call parity.

The reference has no deployment artifact (BSON.load of the whole Flux model,
src/Monodepth.jl:207-208); here the contract is that a serialized StableHLO
artifact reproduces live-model inference without model code or checkpoints.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from monodepth2_tpu.models import Model
from monodepth2_tpu.serving import (
    export_inference,
    load_inference,
    make_inference_fn,
)
from monodepth2_tpu.training.config import TrainConfig
from monodepth2_tpu.training.state import create_train_state

pytestmark = pytest.mark.slow  # export AOT-lowers the full encoder (~min on CPU)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """One tiny-model export shared by every test in the module."""
    cfg = TrainConfig(target_size=(64, 32), in_channels=1)
    model = Model.create(depth=18, in_channels=1, scale_levels=cfg.scale_levels)
    state, _ = create_train_state(model, cfg)
    p = str(tmp_path_factory.mktemp("serving") / "depth.mdtpu")
    export_inference(model, state.params, state.stats, cfg, p, platforms=("cpu",))
    return cfg, model, state, p


def test_export_load_roundtrip_symbolic_batch(artifact):
    """One artifact (symbolic batch dim) serves any N; outputs match the
    live model to fp32 fusion tolerance."""
    cfg, model, state, p = artifact
    assert os.path.getsize(p) > 1_000_000  # weights are baked in

    served = load_inference(p)
    assert served.meta["outputs"] == ["disparity", "depth"]
    live = make_inference_fn(model, state.params, state.stats, cfg)
    rng = np.random.default_rng(0)
    for n in (1, 3):
        x = rng.uniform(size=(n, cfg.height, cfg.width, 1)).astype(np.float32)
        out = served(x)
        ref = live(jnp.asarray(x))
        assert out["disparity"].shape == (n, cfg.height, cfg.width, 1)
        for k in ("disparity", "depth"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), rtol=0, atol=1e-5
            )


def test_served_model_rejects_wrong_spatial_shape(artifact):
    cfg, _, _, p = artifact
    served = load_inference(p)
    with pytest.raises(ValueError, match="incompatible"):
        served(np.zeros((1, cfg.height * 2, cfg.width, 1), np.float32))


def test_export_bf16_artifact_parity(artifact, tmp_path):
    """cfg.compute_dtype="bfloat16" bakes a bf16 network into the artifact;
    outputs stay fp32 and track the fp32 artifact within bf16 tolerance."""
    import dataclasses

    cfg, model, state, _ = artifact
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    p16 = str(tmp_path / "depth-bf16.mdtpu")
    export_inference(
        model, state.params, state.stats, cfg16, p16,
        platforms=("cpu",), batch_size=2,
    )
    served16 = load_inference(p16)
    assert served16.meta["compute_dtype"] == "bfloat16"
    live32 = make_inference_fn(model, state.params, state.stats, cfg)
    x = np.random.default_rng(1).uniform(size=(2, cfg.height, cfg.width, 1))
    x = x.astype(np.float32)
    out = served16(x)
    ref = live32(jnp.asarray(x))
    assert np.asarray(out["disparity"]).dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(out["disparity"]), np.asarray(ref["disparity"]),
        rtol=0, atol=3e-2,
    )
    # depth is a smooth monotone map of disparity — relative check
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), rtol=0.1, atol=0
    )


def test_http_server_over_real_artifact(artifact):
    """Glue: `cli serve`'s stack (server.py build_server) in front of the
    REAL exported artifact — one request through HTTP must match the live
    model, including the batcher's bucket padding (rows are padded to
    bucket 4 and sliced back)."""
    import io
    import json as _json
    import threading
    import urllib.request

    from monodepth2_tpu.server import build_server

    cfg, model, state, p = artifact
    server, batcher = build_server(
        p, port=0, buckets=(4,), linger_s=0.0, warmup=False
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/meta", timeout=30) as r:
            assert _json.loads(r.read())["outputs"] == ["disparity", "depth"]
        x = np.random.default_rng(2).uniform(
            size=(2, cfg.height, cfg.width, 1)
        ).astype(np.float32)
        req = urllib.request.Request(
            base + "/v1/depth", data=x.tobytes(), method="POST"
        )
        req.add_header("Content-Type", "application/octet-stream")
        req.add_header("X-Shape", f"2,{cfg.height},{cfg.width},1")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = np.load(io.BytesIO(r.read()))
        live = make_inference_fn(model, state.params, state.stats, cfg)
        ref = live(jnp.asarray(x))
        np.testing.assert_allclose(
            out["disparity"], np.asarray(ref["disparity"]), rtol=0, atol=1e-5
        )
        assert batcher.stats["padded_rows"] == 2  # 2 rows -> bucket 4
    finally:
        server.shutdown()
        batcher.close()
