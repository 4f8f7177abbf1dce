"""Checkpoint save/restore with auto-resume.

Replaces the reference's Tensorpack ``ModelSaver`` (every epoch,
run.py:125) + ``AutoResumeTrainConfig`` (run.py:116-117: restart from the
latest checkpoint in the log dir if one exists). Format: flax msgpack
serialization of the full TrainState pytree + a sidecar step marker; the
latest ``keep`` checkpoints are retained.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

from flax import serialization


def checkpoint_path(log_dir: str, step: int) -> str:
    return os.path.join(log_dir, f"checkpoint_{step:010d}.msgpack")


def save_checkpoint(log_dir: str, state: Any, step: int, keep: int = 3) -> str:
    """Serialize ``state`` at ``step``; prune old checkpoints."""
    os.makedirs(log_dir, exist_ok=True)
    path = checkpoint_path(log_dir, step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
    os.replace(tmp, path)  # atomic publish
    existing = sorted(all_checkpoint_steps(log_dir))
    for old in existing[:-keep]:
        os.remove(checkpoint_path(log_dir, old))
    return path


def all_checkpoint_steps(log_dir: str):
    if not os.path.isdir(log_dir):
        return []
    steps = []
    for name in os.listdir(log_dir):
        m = re.fullmatch(r"checkpoint_(\d+)\.msgpack", name)
        if m:
            steps.append(int(m.group(1)))
    return steps


def latest_checkpoint_step(log_dir: str) -> Optional[int]:
    steps = all_checkpoint_steps(log_dir)
    return max(steps) if steps else None


def restore_checkpoint(log_dir: str, target: Any, step: Optional[int] = None):
    """Restore into the structure of ``target``; returns (state, step) or
    (target, None) when nothing to resume from."""
    if step is None:
        step = latest_checkpoint_step(log_dir)
    if step is None:
        return target, None
    with open(checkpoint_path(log_dir, step), "rb") as f:
        return serialization.from_bytes(target, f.read()), step
