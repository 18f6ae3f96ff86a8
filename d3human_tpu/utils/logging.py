"""Scalar logging + per-step timing.

Replaces the reference's tensorboardX SummaryWriter + printf progress lines
(/root/reference/train.py:622-623, :727-737, :795-807): scalars stream to a
JSONL file (greppable, no deps) and optionally to tensorboardX when present;
timing wraps block_until_ready the way the reference wraps
torch.cuda.synchronize (ref :789-790).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


class ScalarLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "scalars.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(f"Loss/{k}", v, step)

    def flush(self):
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Wall-clock per-iteration timing with device sync
    (ref train.py:789-790, :805-806 averaged log line)."""

    def __init__(self, window: int = 10):
        self.window = window
        self.durations = []
        self._t0 = None

    def start(self):
        self._t0 = time.time()
        self._laps = 0

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.durations.append(time.time() - self._t0)

    # ---- windowed mode: sync the device every K iterations instead of
    # every iteration. A per-iter block_until_ready costs one axon RTT per
    # step AND serializes host work (next_target, dispatch) against device
    # compute; windowing recovers async-dispatch pipelining while keeping
    # the in-flight queue bounded. Per-iter time is the window average.
    def lap(self):
        self._laps = getattr(self, "_laps", 0) + 1

    def flush(self, result=None):
        """Sync + distribute the window's elapsed time over its laps."""
        if self._laps == 0:
            return
        if result is not None:
            jax.block_until_ready(result)
        dt = (time.time() - self._t0) / self._laps
        self.durations.extend([dt] * self._laps)
        self._t0 = time.time()
        self._laps = 0

    @property
    def avg_ms(self) -> float:
        if not self.durations:
            return 0.0
        return float(np.mean(self.durations[-self.window:]) * 1000)

    def eta(self, remaining_iters: int) -> str:
        secs = remaining_iters * (self.avg_ms / 1000)
        m, s = divmod(int(secs), 60)
        h, m = divmod(m, 60)
        return f"{h:d}:{m:02d}:{s:02d}"
