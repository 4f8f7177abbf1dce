"""Training metrics: moving averages, scalar logging, stat.json.

Replaces the Tensorpack monitor stack used by the reference
(SimpleMovingAverage window 100, ScalarPrinter per step, stat.json +
terminal output — run.py:127,133, model.py:218-221).
"""

from __future__ import annotations

import collections
import json
import os
import time
from typing import Dict, Optional


class MovingAverage:
    """Windowed scalar moving average (tensorpack SimpleMovingAverage)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.buffers: Dict[str, collections.deque] = {}

    def update(self, scalars: Dict[str, float]) -> None:
        for k, v in scalars.items():
            self.buffers.setdefault(k, collections.deque(maxlen=self.window)).append(
                float(v)
            )

    def averages(self) -> Dict[str, float]:
        return {k: sum(d) / len(d) for k, d in self.buffers.items() if d}


# per-weight / per-gradient summary scalars (train.loop.param_summary_scalars)
# go to stat.json but are kept off the terminal — the reference likewise sends
# its histogram/RMS summaries to tensorboard only (model.py:218-221,236).
_SUMMARY_PREFIXES = ("w_rms/", "g_norm/")


def _is_summary(key: str) -> bool:
    return key.startswith(_SUMMARY_PREFIXES)


class MetricLogger:
    """Terminal + stat.json scalar logging."""

    def __init__(self, log_dir: Optional[str] = None, print_every: int = 50,
                 quiet: bool = False):
        self.log_dir = log_dir
        self.print_every = print_every
        # quiet: keep the moving averages (the Trainer returns them) but
        # emit no terminal lines — used by non-zero processes on a pod so
        # per-step output isn't duplicated process_count times
        self.quiet = quiet
        self.moving = MovingAverage(100)
        self.history = []
        self._t0 = time.time()
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)

    def log_step(self, step: int, scalars: Dict[str, float]) -> None:
        self.moving.update(scalars)
        if self.quiet:
            return
        if step % self.print_every == 0:
            avg = self.moving.averages()
            parts = " ".join(
                f"{k}={v:.4f}" for k, v in sorted(avg.items()) if not _is_summary(k)
            )
            print(f"[step {step}] {parts}", flush=True)

    def log_epoch(self, epoch: int, scalars: Dict[str, float]) -> None:
        record = {"epoch_num": epoch, "wall_time": time.time() - self._t0}
        record.update(self.moving.averages())
        record.update({k: float(v) for k, v in scalars.items()})
        self.history.append(record)
        if not self.quiet:
            parts = " ".join(
                f"{k}={v:.4f}" for k, v in sorted(record.items())
                if k != "wall_time" and not _is_summary(k)
            )
            print(f"[epoch {epoch}] {parts}", flush=True)
        if self.log_dir:
            with open(os.path.join(self.log_dir, "stat.json"), "w") as f:
                json.dump(self.history, f, indent=1)
