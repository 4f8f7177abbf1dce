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


def pairwise_sqdist_mm(a: jnp.ndarray, b: jnp.ndarray, precision=None) -> jnp.ndarray:
    """MXU-friendly squared distances via the matmul expansion.

    ``precision`` is forwarded to the cross-term einsum and MATTERS on TPU:
    at the DEFAULT precision the MXU rounds the f32 coordinate operands to
    bf16 (~0.4% relative — centimeter-scale at room scale), while
    ``lax.Precision.HIGHEST`` splits them into bf16 passes covering the full
    mantissa, leaving only few-ulp reassociation error vs the exact
    difference form. Even HIGHEST is NOT safe for strict index decisions
    (the reassociation band still flips ball-query slots at the larger
    radii — measured on v5e); such callers use :func:`pairwise_sqdist`
    in their exact mode instead (see ``ops.dispatch.bq_precision``).
    """
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    ab = jnp.einsum("...md,...nd->...mn", a, b, precision=precision)
    return a2[..., :, None] + b2[..., None, :] - 2.0 * ab
