"""End-to-end training-loop driver tests (fit -> checkpoint -> resume)."""

import os

import numpy as np
import pytest

from monodepth2_tpu.data import SyntheticTriplets
from monodepth2_tpu.training import TrainConfig
from monodepth2_tpu.training.loop import fit


@pytest.fixture()
def cfg(tmp_path):
    return TrainConfig(
        target_size=(64, 32),
        batch_size=2,
        epochs=2,
        log_every=2,
        save_every=0,
        log_dir=str(tmp_path / "logs"),
        save_dir=str(tmp_path / "ckpts"),
    )


def test_fit_trains_and_checkpoints(cfg):
    ds = SyntheticTriplets(n=4, target_size=cfg.target_size)
    state, model = fit(cfg, ds, max_steps=3, verbose=False)
    assert int(state.step) == 3
    # final checkpoint written
    assert os.path.exists(os.path.join(cfg.save_dir, "ckpt-3.npz"))
    # viz PNGs at the log cadence
    assert os.path.exists(os.path.join(cfg.log_dir, "disp-2.png"))
    assert os.path.exists(os.path.join(cfg.log_dir, "warp-2-0.png"))


def test_fit_resumes(cfg):
    ds = SyntheticTriplets(n=4, target_size=cfg.target_size)
    fit(cfg, ds, max_steps=2, verbose=False)
    state, _ = fit(cfg, ds, max_steps=4, resume=True, verbose=False)
    assert int(state.step) == 4
