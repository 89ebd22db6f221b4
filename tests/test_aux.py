"""Tests for auxiliary subsystems: checkpointing, profiling, CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from dis_tpu.config import DISConfig
from dis_tpu.utils.checkpoint import SequenceCheckpoint
from dis_tpu.utils.profiling import PhaseTimer


def test_checkpoint_roundtrip(tmp_path):
    cfg = DISConfig(iterations=4)
    ck = SequenceCheckpoint(str(tmp_path / "ck"), cfg)
    assert ck.resume() == (0, None)
    flow = np.random.default_rng(0).random((6, 8, 2)).astype(np.float32)
    ck.save(5, flow)
    nxt, back = ck.resume()
    assert nxt == 6
    np.testing.assert_array_equal(back, flow)


def test_checkpoint_config_mismatch(tmp_path):
    ck1 = SequenceCheckpoint(str(tmp_path / "ck"), DISConfig(iterations=4))
    ck1.save(3)
    ck2 = SequenceCheckpoint(str(tmp_path / "ck"), DISConfig(iterations=8))
    assert ck2.resume() == (0, None)
    # same config resumes
    ck3 = SequenceCheckpoint(str(tmp_path / "ck"), DISConfig(iterations=4))
    assert ck3.resume()[0] == 4


def test_checkpoint_corrupt_meta(tmp_path):
    cfg = DISConfig()
    ck = SequenceCheckpoint(str(tmp_path / "ck"), cfg)
    ck.save(2)
    with open(ck._meta_path, "w") as f:
        f.write("{not json")
    assert ck.resume() == (0, None)


def test_phase_timer(tmp_path):
    log = str(tmp_path / "log.jsonl")
    t = PhaseTimer(log)
    with t.phase("pyramid"):
        pass
    with t.phase("search", scale=2):
        pass
    with t.phase("search", scale=1):
        pass
    s = t.summary()
    assert set(s) == {"pyramid", "search"}
    lines = [json.loads(l) for l in open(log)]
    assert len(lines) == 3 and lines[1]["scale"] == 2


def test_cli_end_to_end(tmp_path):
    """Drive the reference-style CLI on a tiny synthetic sequence."""
    from PIL import Image
    from dis_tpu.utils.flo import save_flo

    seq = tmp_path / "seq"
    gt = tmp_path / "gt"
    seq.mkdir()
    gt.mkdir()
    r = np.random.default_rng(2)
    from scipy.signal import convolve2d
    big = (r.random((64, 80)) * 255).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25
    big = convolve2d(big, k, "same", "symm")
    for t in range(3):
        fr = np.roll(big, shift=-t, axis=1)[:48, :64]
        Image.fromarray(np.clip(fr, 0, 255).astype(np.uint8)).save(
            str(seq / f"frame_{t+1:04d}.png"))
    # frame t is rolled left by t px, so I_{t+1}(x) = I_t(x + 1) and the
    # flow from t to t+1 is -1 px horizontally.
    g = np.zeros((48, 64, 2), np.float32)
    g[..., 0] = -1.0
    for t in (1, 2):
        save_flo(str(gt / f"frame_{t:04d}.flo"), g)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    log = tmp_path / "run.jsonl"
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from dis_tpu.cli import main; import sys; sys.exit(main(sys.argv[1:]))",
         str(seq), "1", "3", "12", "8", "2", "0", "0.5", "1", "0",
         "--mode", "fixed", "--save-flo", "--gt-dir", str(gt),
         "--json-log", str(log), "--out-dir", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "avg EPE" in r.stdout
    out = tmp_path / "out"
    assert (out / "frame_0001.png").exists()
    assert (out / "frame_0001.flo").exists()
    recs = [json.loads(l) for l in open(log)]
    assert len(recs) == 2 and all("epe" in rec for rec in recs)
    # constant 1-px horizontal roll: EPE should be small
    assert recs[0]["epe"] < 0.5, recs


@pytest.mark.parametrize("n_args", [1, 2, 5, 9])
def test_cli_arity_rejected(capsys, n_args):
    """The reference accepts exactly 0, 3 or 10 positionals and prints a
    usage message otherwise (main.cpp:73-101)."""
    from dis_tpu.cli import main

    rc = main(["arg"] * n_args)
    assert rc == 2
    err = capsys.readouterr().err
    assert "usage" in err and "0, 3 or 10" in err


def test_cli_arity_bad_type(capsys):
    from dis_tpu.cli import main

    rc = main(["folder", "one", "3"])
    assert rc == 2
    assert "invalid value" in capsys.readouterr().err


def test_cli_arity_accepted_counts(tmp_path, capsys, monkeypatch):
    """0- and 3-arity runs get past the arity gate (and then fail on the
    missing image data, like the reference's -1 return)."""
    from dis_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main(["no_such_folder", "1", "2"]) == 1
    assert "No image data" in capsys.readouterr().out
    assert main([]) == 1  # defaults: folder alley_1, also missing


def test_cli_batched_matches_serial(tmp_path):
    """--batch N must change only the dispatch (vmapped pairs), not the
    outputs: .flo files from a batched run equal the serial run's,
    including a tail chunk shorter than N (4 frames, 3 pairs, N=2)."""
    from PIL import Image
    from dis_tpu.cli import main
    from dis_tpu.utils.flo import load_flo
    from scipy.signal import convolve2d

    seq = tmp_path / "seq"
    seq.mkdir()
    r = np.random.default_rng(7)
    big = (r.random((64, 80)) * 255).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25
    big = convolve2d(big, k, "same", "symm")
    for t in range(4):
        fr = np.roll(big, shift=-t, axis=1)[:48, :64]
        Image.fromarray(np.clip(fr, 0, 255).astype(np.uint8)).save(
            str(seq / f"frame_{t+1:04d}.png"))

    base = [str(seq), "1", "4", "6", "8", "2", "0", "0.5", "1", "0",
            "--mode", "fixed", "--save-flo"]
    out_s = tmp_path / "serial"
    out_b = tmp_path / "batched"
    assert main(base + ["--out-dir", str(out_s)]) == 0
    assert main(base + ["--out-dir", str(out_b), "--batch", "2"]) == 0
    for t in (1, 2, 3):
        fs = load_flo(str(out_s / f"frame_{t:04d}.flo"))
        fb = load_flo(str(out_b / f"frame_{t:04d}.flo"))
        np.testing.assert_array_equal(fb, fs)
