"""Oriented 3D non-max suppression as a fixed-shape TPU op.

Rebuilds the reference's CPU-only ``NonMaxSuppression3D``
(tf_ops/3d_nms/tf_nms3d.cpp:202-308) with the variable-length output
(SURVEY §3.2 calls this out as the key TPU forcing function) replaced by a
fixed-size keep mask.

Reference semantics matched:

- candidates are boxes whose objectness logit[1] > logit[0] (strict,
  tf_nms3d.cpp:228-234);
- greedy selection in descending score order; a candidate is suppressed if
  any already-selected box *in the same batch element* has 3D IoU strictly
  greater than the threshold (tf_nms3d.cpp:240-264). The reference orders
  its priority queue globally across the batch, but since suppression is
  same-batch-only the greedy outcome is identical per batch element
  (SURVEY §7 "hard parts"), so we run the loop per batch row, in parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from votenet_tpu.ops.iou3d import box3d_iou_matrix


@jax.jit
def nms3d(
    corners: jnp.ndarray,
    scores: jnp.ndarray,
    objectness: jnp.ndarray,
    iou_threshold,
) -> jnp.ndarray:
    """Greedy oriented 3D NMS.

    Args:
      corners: (B, N, 8, 3) box corners (top face = corners 0-3).
      scores: (B, N) ranking scores (the model passes max semantic logit,
        model.py:133).
      objectness: (B, N, 2) objectness logits.
      iou_threshold: scalar.

    Returns:
      keep: (B, N) bool mask of surviving boxes.
    """
    B, N = scores.shape
    cand = objectness[..., 1] > objectness[..., 0]  # (B, N), strict

    iou = box3d_iou_matrix(corners, corners)  # (B, N, N)

    neg_inf = jnp.finfo(scores.dtype).min
    key = jnp.where(cand, scores, neg_inf)
    order = jnp.argsort(-key, axis=-1, stable=True)  # (B, N) descending score

    # permute everything into sorted order
    cand_s = jnp.take_along_axis(cand, order, axis=-1)  # (B, N)
    iou_s = jnp.take_along_axis(iou, order[..., None], axis=1)
    iou_s = jnp.take_along_axis(iou_s, order[:, None, :], axis=2)  # (B, N, N)

    iota = lax.broadcasted_iota(jnp.int32, (B, N), 1)

    def body(i, suppressed):
        alive_i = cand_s[:, i] & ~suppressed[:, i]  # (B,)
        row = iou_s[:, i, :]  # (B, N)
        newly = alive_i[:, None] & (row > iou_threshold) & (iota > i)
        return suppressed | newly

    suppressed = lax.fori_loop(0, N, body, jnp.zeros((B, N), dtype=bool))
    keep_sorted = cand_s & ~suppressed

    # scatter back to original box order
    inv_order = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(keep_sorted, inv_order, axis=-1)


def nms3d_indices(corners, scores, objectness, iou_threshold) -> np.ndarray:
    """Host-side wrapper returning (K, 2) int32 (batch, box) pairs.

    Mirrors the reference op's variable-length output format
    (tf_nms3d.cpp:266-283): pairs ordered by descending score globally across
    the batch, like the reference's single priority queue.
    """
    keep = np.asarray(nms3d(corners, scores, objectness, iou_threshold))
    scores = np.asarray(scores)
    b_idx, n_idx = np.nonzero(keep)
    sel_scores = scores[b_idx, n_idx]
    order = np.argsort(-sel_scores, kind="stable")
    return np.stack([b_idx[order], n_idx[order]], axis=1).astype(np.int32)
