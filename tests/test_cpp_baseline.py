"""C++ baseline vs NumPy oracle: independent cross-validation.

``tools/cpp_baseline`` is the perf denominator for bench.py; this test
compiles it (if needed) and checks its flow output against the oracle
spec on a small pair — two independent implementations of the compat
semantics agreeing.
"""

import os
import subprocess

import numpy as np
import pytest

from dis_tpu.config import DISConfig
from dis_tpu.oracle import reference_semantics as spec

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL_DIR = os.path.join(ROOT, "tools", "cpp_baseline")
BIN = os.path.join(TOOL_DIR, "dis_baseline")


@pytest.fixture(scope="module")
def binary():
    if not os.path.exists(BIN):
        r = subprocess.run(["make", "-C", TOOL_DIR], capture_output=True,
                           text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build baseline: {r.stderr[-500:]}")
    return BIN


def test_cpp_matches_oracle(binary, tmp_path, small_pair):
    i1, i2 = small_pair  # 48x64, divisible by 4
    h, w = i1.shape
    cfg = DISConfig(iterations=8, coarsest_scale=2, patch_overlap=0.5)
    p1 = str(tmp_path / "a.f32")
    p2 = str(tmp_path / "b.f32")
    po = str(tmp_path / "flow.f32")
    i1.astype("<f4").tofile(p1)
    i2.astype("<f4").tofile(p2)
    r = subprocess.run(
        [binary, str(w), str(h), str(cfg.iterations), str(cfg.patch_size),
         str(cfg.coarsest_scale), str(cfg.finest_scale),
         str(cfg.patch_overlap), "1", "1", p1, p2, po],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    got = np.fromfile(po, dtype="<f4").reshape(h, w, 2)
    want = spec.dis_flow_oracle(i1, i2, cfg)
    np.testing.assert_allclose(got, want, atol=5e-3)
