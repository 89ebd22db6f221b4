"""Sequence runner: resume-after-kill semantics and scaling harness."""

import os

import numpy as np
import pytest

from dis_tpu.config import DISConfig
from dis_tpu.runner import run_sequence


@pytest.fixture
def seq_dir(tmp_path):
    from PIL import Image
    from scipy.signal import convolve2d

    d = tmp_path / "seq"
    d.mkdir()
    r = np.random.default_rng(1)
    big = (r.random((64, 96)) * 255).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25
    big = convolve2d(big, k, "same", "symm")
    for t in range(5):
        fr = np.roll(big, shift=-t, axis=1)[:48, :64]
        Image.fromarray(np.clip(fr, 0, 255).astype(np.uint8)).save(
            str(d / f"frame_{t+1:04d}.png"))
    return str(d)


CFG = DISConfig(iterations=8, coarsest_scale=2, patch_overlap=0.5, mode="fixed")


def test_run_sequence_and_resume(seq_dir, tmp_path):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # Simulate preemption: a first run that dies after 2 pairs.
    killed = {}

    def bomb(i, flow):
        if i >= 2:
            raise KeyboardInterrupt("preempted")

    with pytest.raises(KeyboardInterrupt):
        run_sequence(seq_dir, 1, 5, CFG, out_dir=out, ckpt_dir=ck,
                     on_pair=bomb)
    # pairs 1 and 2 completed and were checkpointed
    assert os.path.exists(os.path.join(out, "frame_0001.png"))
    assert os.path.exists(os.path.join(out, "frame_0002.png"))

    # Rejoin: only the remaining pairs run.
    summary = run_sequence(seq_dir, 1, 5, CFG, out_dir=out, ckpt_dir=ck)
    assert summary["resumed_from"] == 3
    assert summary["pairs_done"] == 2  # pairs 3 and 4
    assert os.path.exists(os.path.join(out, "frame_0004.png"))


def test_run_sequence_fresh(seq_dir, tmp_path):
    out = str(tmp_path / "o2")
    s = run_sequence(seq_dir, 1, 4, CFG, out_dir=out, save_flo=True)
    assert s["pairs_done"] == 3
    assert os.path.exists(os.path.join(out, "frame_0003.flo"))


def test_scaling_report_virtual_devices():
    from dis_tpu.parallel.distributed import scaling_report

    rep = scaling_report(h=32, w=32, device_counts=[1, 2])
    assert rep["rows"][0]["devices"] == 1
    assert rep["rows"][0]["efficiency"] == 1.0
    assert rep["rows"][1]["pairs_per_sec"] > 0
