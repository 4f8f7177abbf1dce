"""Train state: params + batch_stats + optimizer state, one pytree.

Replaces the reference's TF graph variables + Tensorpack session state with
an explicit functional state that jit/pjit can thread, donate, shard and
checkpoint.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct
from flax.training import train_state as flax_train_state

from votenet_tpu.config import Config


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = struct.field(default=None)


def create_train_state(
    rng: jax.Array, config: Config, steps_per_epoch: int
) -> TrainState:
    """Initialize model variables and the optimizer."""
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.train.optimizer import make_optimizer

    import jax.numpy as jnp

    model = VoteNet(config)
    dummy = jnp.zeros((1, config.point_num, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    tx = make_optimizer(config, steps_per_epoch)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
