"""Inference decode: proposal head channels -> oriented 3D boxes + NMS.

Rebuilds the reference's in-graph inference branch (model.py:98-139):
size/heading/center decode (model.py:114-126), the in-graph corner-izer
``get_3d_bbox`` (model.py:100-112), and NMS over max-semantic-logit scores
(model.py:133). Output is fixed-shape: (corners, class_scores, keep-mask)
instead of the reference's variable-length gather_nd results; the evaluator
converts to per-scene variable-length lists on the host.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from votenet_tpu.config import Config
from votenet_tpu.data.geometry import CLASS_MEAN_SIZE
from votenet_tpu.ops import nms3d


def get_3d_bbox(box_size: jnp.ndarray, heading_angle: jnp.ndarray, center: jnp.ndarray) -> jnp.ndarray:
    """Batched corner-izer (reference model.py:100-112).

    box_size (..., 3) in l,w,h (x,z,y extents); heading (...,); center (..., 3).
    Returns (..., 8, 3); corners 0-3 top face (+h/2), 4-7 bottom.
    """
    c, s = jnp.cos(heading_angle), jnp.sin(heading_angle)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    R = jnp.stack([c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1).reshape(
        heading_angle.shape + (3, 3)
    )
    l, w, h = box_size[..., 0], box_size[..., 1], box_size[..., 2]
    x = jnp.stack([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2], -1)
    y = jnp.stack([h / 2, h / 2, h / 2, h / 2, -h / 2, -h / 2, -h / 2, -h / 2], -1)
    z = jnp.stack([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2], -1)
    corners = jnp.stack([x, y, z], axis=-2)  # (..., 3, 8)
    rotated = jnp.einsum("...kl,...lm->...mk", R, corners)  # (..., 8, 3)
    return rotated + center[..., None, :]


def decode_proposals(end_points: Dict[str, Any], config: Config) -> Dict[str, jnp.ndarray]:
    """Head channels -> boxes (reference model.py:114-129)."""
    cfg = config
    NH, NS, NC = cfg.num_heading_bin, cfg.num_size_cluster, cfg.num_class
    out = end_points["proposals_output"]  # (B, P, 79)
    proposals_xyz = end_points["proposals_xyz"]

    size_cls = jnp.argmax(out[..., 5 + 2 * NH : 5 + 2 * NH + NS], axis=-1)  # (B, P)
    size_res_all = out[..., 5 + 2 * NH + NS : 5 + 2 * NH + 4 * NS]
    B, P = size_cls.shape
    size_res = jnp.take_along_axis(
        size_res_all.reshape(B, P, NS, 3), size_cls[..., None, None].repeat(3, -1), axis=-2
    )[..., 0, :]
    mean_size = jnp.asarray(CLASS_MEAN_SIZE)[size_cls]  # (B, P, 3)
    # decode guards tiny/negative sizes with the 1e-6 floor (model.py:119)
    size_pred = mean_size * jnp.maximum(1.0 + size_res, 1e-6)

    center_pred = proposals_xyz + out[..., 2:5]

    heading_cls = jnp.argmax(out[..., 5 : 5 + NH], axis=-1)
    heading_res = jnp.take_along_axis(
        out[..., 5 + NH : 5 + 2 * NH], heading_cls[..., None], axis=-1
    )[..., 0]
    heading_pred = jnp.mod(
        (heading_cls.astype(jnp.float32) * 2 + heading_res) * (np.pi / NH), 2 * np.pi
    )

    corners = get_3d_bbox(size_pred, heading_pred, center_pred)  # (B, P, 8, 3)
    class_scores = out[..., -NC:]
    return {
        "bboxes": corners,
        "class_scores": class_scores,
        "objectness": out[..., :2],
        "nms_scores": jnp.max(class_scores, axis=-1),
        "center_pred": center_pred,
        "size_pred": size_pred,
        "heading_pred": heading_pred,
        "size_cls": size_cls,
        "heading_cls": heading_cls,
    }


def predict_boxes(end_points: Dict[str, Any], config: Config, nms_iou: float | None = None):
    """Decode + NMS (reference model.py:129-137), fixed-shape.

    Returns dict with ``bboxes`` (B,P,8,3), ``class_scores`` (B,P,NC) and a
    boolean ``keep`` (B,P); the reference's variable-length
    ``bboxes_pred``/``class_scores_pred``/``batch_idx`` are recoverable as
    ``bboxes[keep]`` etc. on the host.
    """
    decoded = decode_proposals(end_points, config)
    iou = config.nms_iou if nms_iou is None else nms_iou
    keep = nms3d(decoded["bboxes"], decoded["nms_scores"], decoded["objectness"], iou)
    if config.max_detections < keep.shape[-1]:
        # static cap on survivors: keep the max_detections highest-scoring
        # boxes among the NMS keeps (fixed-shape top-k by rank; the
        # reference has no cap — the default 256 = proposal_num is a no-op)
        score = jnp.where(keep, decoded["nms_scores"], -jnp.inf)
        order = jnp.argsort(-score, axis=-1)
        rank = jnp.argsort(order, axis=-1)
        keep = keep & (rank < config.max_detections)
    decoded["keep"] = keep
    return decoded
