"""Shared helpers for the point-cloud ops."""

from __future__ import annotations

import jax.numpy as jnp

# Single large-N gate shared by FPS, ball query and three_nn (SURVEY §5
# point-count scaling): above this the dense paths' O(N) working sets
# (Pallas VMEM planes for FPS, (B,M,N)/(B,N,M) HBM intermediates for the
# queries) stop being comfortable on v5e, and the ops switch to their
# streaming/XLA fallbacks. Retune in ONE place for new TPU generations.
LARGE_N_THRESHOLD = 81920


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact squared euclidean distances between two point sets.

    a: (..., M, 3), b: (..., N, 3) -> (..., M, N).

    Computed as an explicit difference-square-sum (XLA fuses this into a
    single loop, nothing 4-D hits HBM) rather than the matmul expansion
    ``|a|^2+|b|^2-2ab`` — the direct form is exact. Used by the oracle /
    parity paths (query_ball_point_topk, knn_point, three_nn). The
    PRODUCTION ball query deliberately uses the mm expansion instead —
    exactness there measured +41.6% at sa1 for a few-ulp boundary band; see
    the DOCUMENTED DEVIATION note in :mod:`votenet_tpu.ops.grouping`.
    """
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def pairwise_sqdist_mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """MXU-friendly squared distances via the matmul expansion.

    Faster for large M*N but inexact in the last few ulps; used where the
    result feeds a continuous computation, not an index decision.
    """
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    ab = jnp.einsum("...md,...nd->...mn", a, b)
    return a2[..., :, None] + b2[..., None, :] - 2.0 * ab
