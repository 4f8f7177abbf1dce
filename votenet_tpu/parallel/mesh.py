"""Device mesh and sharding helpers for data-parallel training."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: 1-D mesh named "data" over all devices (pure DP — the model is
    small, ~1M params; batch is the only profitable sharding axis for
    VoteNet's shapes). ``shape`` allows sub-meshes or nd-meshes (a -1 entry
    is inferred as "all remaining devices", like Config.mesh_shape's
    default); when the shape uses fewer devices than available, the first
    prod(shape) devices are taken.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices).ravel()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    shape = tuple(int(s) for s in shape)
    if -1 in shape:
        if shape.count(-1) != 1:
            raise ValueError(f"at most one -1 in mesh shape {shape}")
        known = int(np.prod([s for s in shape if s != -1]))
        if len(devices) % known != 0:
            # floor division here would silently train on a subset of the
            # pod — make the remainder explicit instead
            raise ValueError(
                f"mesh shape {shape}: {len(devices)} devices not divisible "
                f"by {known}; pass an explicit shape to use a device subset"
            )
        shape = tuple(len(devices) // known if s == -1 else s for s in shape)
    n = int(np.prod(shape))
    if not 0 < n <= len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    return Mesh(devices[:n].reshape(shape), axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for arrays whose leading axis is the global batch."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def host_local_slice(ids: Sequence, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> list:
    """Partition a scene-id list across hosts for multi-host pods.

    Each process loads only its contiguous slice (the per-host input
    pipeline over DCN, SURVEY §2.3); `shard_batch` then places each host's
    examples on its addressable devices. On a single host this is the
    identity.

    Every process MUST receive the same number of ids: the per-epoch step
    count (and therefore the LR schedule and the number of jitted steps
    entering the SPMD collectives) is derived from the local slice length,
    so unequal slices would desynchronize the pod at the epoch boundary.
    When ``len(ids)`` is not divisible by ``process_count`` the list is
    padded by wrapping (the first few ids appear twice per epoch) rather
    than truncated, so no scene is ever dropped from training.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    ids = list(ids)
    per = -(-len(ids) // pc)
    if per * pc != len(ids):
        ids = ids + ids[: per * pc - len(ids)]
    return ids[pi * per : (pi + 1) * per]


def batch_shardings(
    batch: dict, mesh: Mesh, axis: str = "data", point_axis: Optional[str] = None
) -> dict:
    """Per-key shardings for a batch dict: every array batch-sharded over
    ``axis``; with ``point_axis`` set (dp x sp meshes), the "points" cloud
    is additionally sharded over its point dimension."""
    return {
        k: NamedSharding(
            mesh,
            P(axis, point_axis) if (k == "points" and point_axis) else P(axis),
        )
        for k in batch
    }


def shard_batch(
    batch: dict, mesh: Mesh, axis: str = "data", point_axis: Optional[str] = None
) -> dict:
    """Place a host batch on the mesh with the leading axis sharded.

    Single process: a plain sharded ``device_put`` (the global batch is
    scattered across local devices). Multi-process (a pod launched with
    ``run_train.py --distributed``): each process passes only ITS local
    rows — ``global_batch / process_count`` scenes read by its own input
    pipeline — and the rows are assembled into one global array via
    ``jax.make_array_from_process_local_data`` (the per-host DCN input
    path, SURVEY §2.3; exercised by benchmarks/multiprocess_train_smoke.py).

    ``point_axis`` (dp x sp meshes) shards the "points" cloud over its
    point dimension too. On a pod the "data" axis must be the OUTER mesh
    axis so each process's local rows' point-shards land on its own
    addressable devices (run_train's --mesh_shape=<procs>,<local> layout).
    """
    shardings = batch_shardings(batch, mesh, axis, point_axis)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(
                shardings[k], np.asarray(v)
            )
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
