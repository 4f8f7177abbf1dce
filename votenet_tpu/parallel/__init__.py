"""Parallelism: device mesh construction and data-parallel sharding.

The reference is strictly single-GPU (SimpleTrainer, run.py:136; SURVEY
§2.3); its only parallelism is multi-process host data loading over ZMQ.
The TPU-native equivalents here are first-class:

- a ``jax.sharding.Mesh`` over the batch axis; gradients/batch-norm
  statistics all-reduce over ICI via collectives XLA inserts under GSPMD;
- per-host input sharding helpers for multi-host pods;
- everything works identically on a virtual CPU mesh
  (``--xla_force_host_platform_device_count``) for testing.
"""

from votenet_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]
