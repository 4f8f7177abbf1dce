"""Training subsystem: optimizer, schedules, train state, loop, checkpoints."""

from votenet_tpu.train.optimizer import clip_by_average_norm, make_optimizer, make_lr_schedule
from votenet_tpu.train.state import TrainState, create_train_state
from votenet_tpu.train.loop import Trainer, make_train_step

__all__ = [
    "clip_by_average_norm", "make_optimizer", "make_lr_schedule",
    "TrainState", "create_train_state",
    "Trainer", "make_train_step",
]
