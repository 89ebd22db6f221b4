"""Multi-host integration: env plumbing, sequence sharding, and the
SURVEY §5 deliberate-kill / elastic-recovery scenario.

Two worker processes ("hosts") shard a sequence; one is killed mid-run
and relaunched with the same command line; the combined output must
equal the serial pipeline (up to single- vs multi-device XLA fusion
noise).  Runs entirely on CPU — the host axis is process-level, no
device mesh needed.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from dis_tpu.config import DISConfig
from dis_tpu.parallel.distributed import init_multi_host, shard_frame_range

from conftest import synthetic_pair

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = DISConfig(iterations=4, coarsest_scale=2, patch_overlap=0.5,
                early_exit=False)


def test_shard_frame_range_partitions():
    for total in (0, 1, 5, 7, 8):
        start, end = 3, 3 + total
        seen = []
        for hid in range(3):
            lo, hi = shard_frame_range(start, end, 3, hid)
            seen.extend(range(lo, hi))
        assert seen == list(range(start, end))
    with pytest.raises(ValueError):
        shard_frame_range(0, 4, 2, 2)


def test_init_multi_host_env_plumbing(monkeypatch):
    """init_multi_host forwards the standard env vars to
    jax.distributed.initialize, and no-ops without a coordinator."""
    import jax

    calls = []

    def fake_init(**kw):
        calls.append(kw)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    init_multi_host()
    assert calls == []  # single host: no-op

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    init_multi_host()
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 4, "process_id": 2}]
    # explicit args win over env
    init_multi_host("host:1", 8, 7)
    assert calls[-1] == {"coordinator_address": "host:1",
                         "num_processes": 8, "process_id": 7}


_WORKER = """
import os, sys, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from dis_tpu.config import DISConfig
from dis_tpu.parallel.distributed import run_sequence_shard

folder, start, end, ckpt_root, out_dir = sys.argv[1:6]
cfg = DISConfig(iterations=4, coarsest_scale=2, patch_overlap=0.5,
                early_exit=False)
die_after = int(os.environ.get("DIE_AFTER_PAIRS", "0"))
state = {{"n": 0}}

def on_pair(i, flow):
    state["n"] += 1
    if die_after and state["n"] >= die_after:
        os._exit(17)  # simulated preemption

summary = run_sequence_shard(folder, int(start), int(end), cfg, ckpt_root,
                             out_dir=out_dir, save_flo=True,
                             on_pair=on_pair)
print("SUMMARY " + json.dumps(summary))
"""


def _launch(script, args, tmp_path, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO  # drop any accelerator plugin site hooks
    env.pop("XLA_FLAGS", None)  # single virtual device is enough
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, str(script)] + [str(a) for a in args],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))


@pytest.mark.slow
def test_two_hosts_kill_resume_matches_serial(tmp_path):
    from PIL import Image
    from dis_tpu.models.dis import dis_flow
    from dis_tpu.utils.flo import load_flo

    # 8-frame sequence -> pairs 1..7, sharded [1,5) / [5,8)
    seq = tmp_path / "seq"
    seq.mkdir()
    frames = []
    base, _ = synthetic_pair(40, 48, seed=42)
    cur = np.clip(base, 0, 255)
    for t in range(8):
        frames.append(cur.astype(np.uint8))  # what the PNGs will hold
        cur = np.roll(cur, shift=1, axis=1)
    for t, fr in enumerate(frames):
        Image.fromarray(fr).save(str(seq / f"frame_{t + 1:04d}.png"))

    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    ck = tmp_path / "ck"
    out = tmp_path / "out"

    # host 0: completes its shard
    r0 = _launch(script, [seq, 1, 8, ck, out], tmp_path,
                 {"JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": "0"})
    assert r0.returncode == 0, r0.stderr[-2000:]
    s0 = json.loads(r0.stdout.split("SUMMARY ")[1])
    assert s0["shard"] == [1, 5] and s0["pairs_done"] == 4

    # host 1: killed after one pair (post-checkpoint preemption) ...
    r1 = _launch(script, [seq, 1, 8, ck, out], tmp_path,
                 {"JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": "1",
                  "DIE_AFTER_PAIRS": "1"})
    assert r1.returncode == 17
    # ... and relaunched with the SAME command line: resumes and finishes
    r2 = _launch(script, [seq, 1, 8, ck, out], tmp_path,
                 {"JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": "1"})
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.split("SUMMARY ")[1])
    assert s2["shard"] == [5, 8]
    assert s2["resumed_from"] == 6 and s2["pairs_done"] == 2

    # combined output == serial pipeline (the worker process compiles
    # with one CPU device vs the test harness's virtual 8-device mesh,
    # which perturbs XLA fusion by a few ulp — measured <=5e-6)
    for i in range(1, 8):
        got = load_flo(str(out / f"frame_{i:04d}.flo"))
        want = np.asarray(dis_flow(
            jnp.asarray(frames[i - 1].astype(np.float32)),
            jnp.asarray(frames[i].astype(np.float32)), CFG))
        np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"pair {i}")
