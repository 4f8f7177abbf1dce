"""Ball-query grouping, feature gather, kNN and partial selection.

TPU-native rebuild of the reference CUDA package ``tf_ops/grouping``
(`tf_grouping.py`, `tf_grouping_g.cu`), recast as fixed-shape masked ops.

Parity-critical semantics of ``query_ball_point`` (tf_grouping_g.cu:13-35):

- a dataset point k is a hit iff ``max(dist, 1e-20) < radius`` with *strict*
  comparison on euclidean distance (equivalent to ``dist2 < radius**2`` for
  any radius > 1e-20);
- the output takes the FIRST ``nsample`` hits in dataset index order;
- slots past the last hit are filled with the FIRST hit's index (the CUDA
  kernel pre-fills all slots on the first hit, tf_grouping_g.cu:26-29);
- ``pts_cnt`` counts hits but saturates at ``nsample`` (the scan breaks).

If a query ball is empty the reference leaves the row uninitialized (never
happens in the model: every query point is a member of the dataset cloud, so
it always hits itself). We define the empty case as index 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from votenet_tpu.ops.common import pairwise_sqdist


@functools.partial(jax.jit, static_argnums=(0, 1))
def query_ball_point(radius: float, nsample: int, xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """Fixed-radius neighborhood query.

    Args:
      radius: ball radius (static).
      nsample: max points per ball (static).
      xyz1: (B, N, 3) dataset points.
      xyz2: (B, M, 3) query points.

    Returns:
      idx: (B, M, nsample) int32 indices into N.
      pts_cnt: (B, M) int32 number of hits (saturated at nsample).
    """
    d2 = pairwise_sqdist(xyz2.astype(jnp.float32), xyz1.astype(jnp.float32))
    N = xyz1.shape[1]
    hit = d2 < jnp.float32(radius) ** 2  # (B, M, N), strict
    # first-`nsample`-hits-in-index-order via top_k over negated index keys:
    # hits keep their index, misses get sentinel N; the nsample smallest keys
    # are the first nsample hits (ascending), padded with the sentinel.
    iota = lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    key = jnp.where(hit, iota, N)
    neg_sorted, _ = lax.top_k(-key, nsample)  # descending -key == ascending key
    idx_sorted = -neg_sorted  # (B, M, nsample), sentinel-padded
    first_hit = idx_sorted[..., :1]
    idx = jnp.where(idx_sorted >= N, first_hit, idx_sorted)
    idx = jnp.where(idx >= N, 0, idx)  # fully-empty ball -> 0 (see docstring)
    pts_cnt = jnp.minimum(jnp.sum(hit, axis=-1), nsample).astype(jnp.int32)
    return lax.stop_gradient(idx), lax.stop_gradient(pts_cnt)


def group_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather grouped features: (B, N, C), (B, M, S) -> (B, M, S, C).

    Differentiable w.r.t. ``points``; the VJP is a deterministic segment-sum
    (replacing the reference's atomicAdd scatter, tf_grouping_g.cu:61-78).
    """
    B, M, S = idx.shape
    flat = idx.reshape(B, M * S, 1).astype(jnp.int32)
    out = jnp.take_along_axis(points, flat, axis=1)
    return out.reshape(B, M, S, points.shape[-1])


@functools.partial(jax.jit, static_argnums=0)
def select_top_k(k: int, dist: jnp.ndarray):
    """Partial selection sort of each row (reference tf_grouping.py:22-31).

    Returns (idx, dist_out) of the same (B, M, N) shape where the first k
    entries of each row are the k smallest distances in ascending order (the
    reference leaves the remaining N-k entries in unspecified order; we
    return a full ascending sort, a strict refinement).
    """
    order = jnp.argsort(dist, axis=-1, stable=True).astype(jnp.int32)
    return order, jnp.take_along_axis(dist, order, axis=-1)


@functools.partial(jax.jit, static_argnums=0)
def knn_point(k: int, xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """k nearest neighbors by squared distance (reference tf_grouping.py:48-73).

    xyz1: (B, N, 3) dataset, xyz2: (B, M, 3) queries.
    Returns (dist2, idx) each (B, M, k), ascending. Unused by the VoteNet
    model (it always ball-queries) but part of the reference API surface.
    """
    d2 = pairwise_sqdist(xyz2, xyz1)  # (B, M, N)
    neg, idx = lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)
