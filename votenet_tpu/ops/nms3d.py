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
    """Greedy oriented 3D NMS (exact, via parallel fixpoint iteration).

    Args:
      corners: (B, N, 8, 3) box corners (top face = corners 0-3).
      scores: (B, N) ranking scores (the model passes max semantic logit,
        model.py:133).
      objectness: (B, N, 2) objectness logits.
      iou_threshold: scalar.

    Returns:
      keep: (B, N) bool mask of surviving boxes.

    The greedy recurrence "keep i iff no higher-priority kept box overlaps
    it" forms a DAG ordered by (score desc, index asc). Instead of an
    N-step sequential loop (N kernel dispatches), we Jacobi-iterate the
    recurrence — each round one batched matmul over the suppression matrix —
    until a fixpoint, reached after at most longest-suppression-chain
    rounds (a handful in practice). The fixpoint is exactly the greedy
    solution, so semantics match the sequential reference
    (tf_nms3d.cpp:240-264). Ties: the reference's priority queue compares
    scores only (tf_nms3d.cpp:222-226), so its equal-score order is
    heap-unspecified; our deterministic lower-index-first rule is a
    *refinement* of that contract (one valid resolution of it), not strict
    parity.
    """
    B, N = scores.shape
    cand = objectness[..., 1] > objectness[..., 0]  # (B, N), strict

    iou = box3d_iou_matrix(corners, corners)  # (B, N, N)

    # priority: score desc, ties by lower index (stable-argsort order)
    iota = lax.broadcasted_iota(jnp.int32, (B, N), 1)
    s_j = scores[:, :, None]
    s_i = scores[:, None, :]
    higher = (s_j > s_i) | ((s_j == s_i) & (iota[:, :, None] < iota[:, None, :]))
    supp = jnp.where(
        higher & (iou > iou_threshold), 1.0, 0.0
    ) * cand[:, :, None].astype(jnp.float32)  # (B, N[j], N[i])

    cand_f = cand.astype(jnp.float32)

    def cond(state):
        kept, changed = state
        return changed

    def body(state):
        kept, _ = state
        blocked = jnp.einsum("bj,bji->bi", kept, supp)  # suppression pressure
        new_kept = cand_f * jnp.where(blocked > 0, 0.0, 1.0)
        return new_kept, jnp.any(new_kept != kept)

    kept, _ = lax.while_loop(cond, body, (cand_f, jnp.bool_(True)))
    return kept > 0


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
