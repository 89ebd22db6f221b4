"""Sequence runner: resumable multi-frame flow computation.

Wraps the per-pair pipeline with sequence-progress checkpointing
(SURVEY.md §5 failure-detection gap): progress persists after every
pair, so a preempted/killed worker rejoins where it stopped.  This is
the single-process engine; multi-host runs shard the sequence via
``dis_tpu.parallel.sequence`` and run one checkpointed runner per host
over its local shard.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .config import DISConfig
from .utils import color, flo
from .utils import io as uio
from .utils.checkpoint import SequenceCheckpoint
from .utils.profiling import PhaseTimer


def run_sequence(
    folder: str,
    start: int,
    end: int,
    cfg: DISConfig,
    out_dir: Optional[str] = None,
    ckpt_dir: Optional[str] = None,
    save_flo: bool = False,
    gt_dir: Optional[str] = None,
    frame_pattern: str = "frame_{:04d}.png",
    on_pair=None,
) -> dict:
    """Flow all consecutive pairs [start, end); returns a summary dict.

    With ``ckpt_dir``, previously completed pairs (same config) are
    skipped on restart and progress is recorded after each pair.
    """
    import jax
    import jax.numpy as jnp

    from .models.dis import dis_flow

    out_dir = out_dir or f"OF_{os.path.basename(folder)}"
    os.makedirs(out_dir, exist_ok=True)
    flow_fn = jax.jit(lambda a, b: dis_flow(a, b, cfg))
    from .utils import checks
    if checks.enabled():
        # Device-side sanitizers (DIS_TPU_CHECK=1): run the checkified
        # program so the pipeline's guard sites are live here too, not
        # just under the CLI.
        flow_fn = checks.checked(flow_fn)

    first = start
    ck = None
    if ckpt_dir:
        ck = SequenceCheckpoint(ckpt_dir, cfg)
        resume_idx, _ = ck.resume()
        first = max(start, resume_idx)

    timer = PhaseTimer()
    epes: List[float] = []
    done = 0
    # pair (i, i+1) for i in [start, end) — the reference's loop bounds
    # (main.cpp:102)
    for i in range(first, end):
        p1 = os.path.join(folder, frame_pattern.format(i))
        p2 = os.path.join(folder, frame_pattern.format(i + 1))
        i1 = uio.imread_gray(p1).astype(np.float32)
        i2 = uio.imread_gray(p2).astype(np.float32)
        with timer.phase("pair", frame=i):
            flow = np.asarray(flow_fn(jnp.asarray(i1), jnp.asarray(i2)))
        base = frame_pattern.format(i).rsplit(".", 1)[0]
        uio.imwrite(os.path.join(out_dir, base + ".png"),
                    color.draw_optical_flow(flow))
        if save_flo:
            flo.save_flo(os.path.join(out_dir, base + ".flo"), flow)
        if gt_dir:
            gtp = os.path.join(gt_dir, base + ".flo")
            if os.path.exists(gtp):
                from .utils.metrics import epe
                epes.append(epe(flow, flo.load_flo(gtp)))
        if ck:
            ck.save(i, flow)
        if on_pair:
            on_pair(i, flow)
        done += 1

    secs = [r["seconds"] for r in timer.records]
    return {
        "pairs_done": done,
        "resumed_from": first,
        "mean_seconds": float(np.mean(secs)) if secs else 0.0,
        "avg_epe": float(np.mean(epes)) if epes else None,
    }
