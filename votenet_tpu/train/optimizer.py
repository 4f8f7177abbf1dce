"""Optimizer and LR schedule matching the reference recipe.

The reference optimizes with Adam on a non-trainable ``learning_rate``
variable (init 1e-3) stepped to 1e-4 at epoch 80 and 1e-5 at epoch 120 by a
``ScheduledHyperParamSetter`` (model.py:240-250, run.py:113,126), and maps
every gradient through ``tf.clip_by_average_norm(grad, 0.5)``
(model.py:249).

``tf.clip_by_average_norm(t, c)`` rescales ``t`` by
``min(1, c * num_elements(t) / l2norm(t))`` — i.e. it clips the *average*
L2 norm (l2norm / num_elements) to ``c``, per tensor. That exact transform
is provided here as an optax ``GradientTransformation``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from votenet_tpu.config import Config


def clip_by_average_norm(clip_norm: float) -> optax.GradientTransformation:
    """Per-leaf average-L2-norm clipping (tf.clip_by_average_norm semantics)."""

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            n = jnp.asarray(g.size, g.dtype)
            l2 = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, clip_norm * n / jnp.maximum(l2, 1e-30))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def make_lr_schedule(
    base_lr: float,
    epoch_schedule: Sequence[Tuple[int, float]],
    steps_per_epoch: int,
) -> optax.Schedule:
    """Piecewise-constant LR from the reference's epoch-keyed schedule.

    Tensorpack's ScheduledHyperParamSetter sets the value *after* the keyed
    epoch completes, so (80, 1e-4) takes effect from epoch 81's steps on.
    """
    boundaries = {int(e) * steps_per_epoch: lr / prev for (e, lr), prev in zip(
        epoch_schedule, [base_lr] + [lr for _, lr in epoch_schedule[:-1]]
    )}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(config: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """clip_by_average_norm(0.5) -> Adam(scheduled lr), like model.py:240-250."""
    schedule = make_lr_schedule(config.base_lr, config.lr_schedule, steps_per_epoch)
    return optax.chain(
        clip_by_average_norm(config.grad_clip_avg_norm),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )
