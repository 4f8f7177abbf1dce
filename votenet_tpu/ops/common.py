"""Shared helpers for the point-cloud ops."""

from __future__ import annotations

import jax.numpy as jnp

# Point-count scaling gates (SURVEY §5). Two kinds of limits:
#
# 1. LARGE_N_THRESHOLD — VMEM cap of the BATCHED Pallas FPS kernel, whose
#    resident planes cost 8 sublanes x N x 4 surfaces x 4 B = 128*N bytes
#    (~10.5 MB at 81920 against Mosaic's ~12 MB usable scope). The row-wise
#    kernel folds one row over (sublanes, lanes) and only needs ~36*N bytes
#    — see ops/pallas/fps.py ROWWISE_MAX_N.
# 2. DENSE_BYTES_BUDGET — HBM-footprint budget for the dense ball-query /
#    three_nn paths, whose (B, M, N)-shaped intermediates are the O(N)
#    memory. The dispatch is BYTE-based, not N-based: a small batch can run
#    the (9x faster) dense path at point counts where a full batch must
#    stream — measured 163840 pts at B=2: dense 21 ms/scene vs streaming
#    102 ms/scene (benchmarks/large_n_scaling.py). v5e has 16 GB HBM; 10 GB
#    of query intermediates leaves room for the model around them and
#    reproduces the previous N<=81920-at-B=8 dense behavior exactly.
#
# Retune in ONE place for new TPU generations.
LARGE_N_THRESHOLD = 81920
DENSE_BYTES_BUDGET = 10 * 1024**3


def bq_dense_bytes(B: int, M: int, N: int) -> int:
    """Peak HBM bytes of the dense ball query's (B, M, N) intermediates:
    f32 distances (4) + bf16 hit mask (2), conservatively co-resident."""
    return B * M * N * 6


def three_nn_dense_bytes(B: int, N: int, M: int) -> int:
    """Peak HBM bytes of dense three_nn's (B, N, M) f32 distance matrix
    (the masked argmin passes mutate it in place under XLA fusion)."""
    return B * N * M * 4


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact squared euclidean distances between two point sets.

    a: (..., M, 3), b: (..., N, 3) -> (..., M, N).

    Computed as an explicit difference-square-sum (XLA fuses this into a
    single loop, nothing 4-D hits HBM) rather than the matmul expansion
    ``|a|^2+|b|^2-2ab`` — the direct form is exact. Used by the oracle /
    parity paths (query_ball_point_topk, knn_point, three_nn) AND — since
    round 3 made ``bq_precision="exact"`` the default — by the production
    ball query (both the XLA hierarchical twin and the Pallas kernel use
    this same rounding sequence for their hit tests, which is what makes
    them bit-identical to the oracle). The mm expansion remains the opt-in
    "fast_bf16" speed mode; see the RADIUS-BOUNDARY PRECISION note in
    :mod:`votenet_tpu.ops.grouping` (the one authoritative statement).
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
