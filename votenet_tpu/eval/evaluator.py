"""Batched mAP evaluator.

Rebuilds the reference's ``Evaluator`` callback (evaluator.py:208-233) as a
framework-independent class. Differences by design (SURVEY §7 step 6):

- inference runs in fixed-size batches (the reference feeds batch-1 per val
  scene, evaluator.py:222), with the last batch padded by repetition and the
  padding masked out of the results;
- predictions come back as fixed-shape (boxes, scores, keep-mask) arrays and
  are converted to per-scene variable-length lists on the host;
- returns plain lists/dicts (the reference stored a one-shot ``zip``,
  evaluator.py:231 — a quirk noted in SURVEY §7).

Per-scene decode matches the reference: class = argmax of semantic logits,
confidence = that max logit (evaluator.py:224-226).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Tuple

import numpy as np

from votenet_tpu.config import Config
from votenet_tpu.data.geometry import CLASS2TYPE
from votenet_tpu.eval.ap import eval_det


class Evaluator:
    """Runs batched VoteNet inference over a scene set and computes mAP."""

    def __init__(
        self,
        config: Config,
        gt_all: Dict,
        ovthresh: float = 0.25,
        batch_size: int = 8,
        pipeline_depth: int = 4,
    ):
        self.config = config
        self.gt_all = gt_all
        self.pipeline_depth = pipeline_depth
        self.ovthresh = ovthresh
        self.batch_size = batch_size

    def predictions_for_scenes(
        self,
        predict_fn: Callable[[np.ndarray], Dict[str, np.ndarray]],
        scenes: Iterable[Tuple[int, np.ndarray]],
    ) -> Dict[int, List[Tuple[str, np.ndarray, float]]]:
        """Run batched inference; returns {img_id: [(classname, bbox, score)]}.

        Batches are kept in flight (JAX async dispatch) up to
        ``self.pipeline_depth`` deep, so device compute, device->host result
        fetches and host-side decoding of earlier batches overlap — at the
        5050-scene reference val-split scale the serial fetch-then-decode
        loop was host-bound, not device-bound (benchmarks/eval_scale.py).
        """
        from collections import deque

        scenes = list(scenes)
        pred_all: Dict[int, List] = {}
        B = self.batch_size
        pending: deque = deque()

        def drain(n_keep: int):
            while len(pending) > n_keep:
                chunk, n_real, out = pending.popleft()
                bboxes = np.asarray(out["bboxes"])
                class_scores = np.asarray(out["class_scores"])
                keep = np.asarray(out["keep"])
                cls_idx = np.argmax(class_scores, axis=-1)  # (B, P)
                best = np.take_along_axis(
                    class_scores, cls_idx[..., None], axis=-1
                )[..., 0]
                for bi in range(n_real):
                    img_id = chunk[bi][0]
                    dets = []
                    for pi in np.nonzero(keep[bi])[0]:
                        dets.append((
                            CLASS2TYPE[int(cls_idx[bi, pi])],
                            bboxes[bi, pi],
                            float(best[bi, pi]),
                        ))
                    pred_all[img_id] = dets

        for start in range(0, len(scenes), B):
            chunk = scenes[start : start + B]
            n_real = len(chunk)
            while len(chunk) < B:  # pad last batch by repeating
                chunk.append(chunk[-1])
            points = np.stack([c[1] for c in chunk]).astype(np.float32)
            pending.append((chunk, n_real, predict_fn(points)))
            drain(self.pipeline_depth)
        drain(0)
        return pred_all

    def evaluate(
        self,
        predict_fn: Callable[[np.ndarray], Dict[str, np.ndarray]],
        scenes: Iterable[Tuple[int, np.ndarray]],
    ) -> Dict:
        """Full evaluation: returns {'mAP': float, 'ap': {cls: float}, ...}."""
        pred_all = self.predictions_for_scenes(predict_fn, scenes)
        rec, prec, ap = eval_det(pred_all, self.gt_all, self.ovthresh)
        mAP = float(np.mean([ap[c] for c in ap])) if ap else 0.0
        return {"mAP": mAP, "ap": ap, "rec": rec, "prec": prec}


def make_predict_fn(model, variables, config: Config):
    """Build a jitted points -> {bboxes, class_scores, keep} function."""
    import jax

    from votenet_tpu.models.decode import predict_boxes

    @jax.jit
    def _predict(points):
        end_points = model.apply(variables, points, train=False)
        pred = predict_boxes(end_points, config)
        return {
            "bboxes": pred["bboxes"],
            "class_scores": pred["class_scores"],
            "keep": pred["keep"],
        }

    return _predict


def gt_dict_from_labels(scene_labels: Dict[int, Dict]) -> Dict[int, List]:
    """Build the eval GT structure from dataflow label dicts.

    scene_labels: {img_id: {'bboxes_xyz','bboxes_lwh','bboxes_roty',
    'semantic_labels'}} -> {img_id: [(classname, corners (8,3))]}.
    A convenience the reference lacks (it loads frustum-pointnets GT dumps,
    utils.py:249-263 — see :mod:`votenet_tpu.eval.gt_loader` for that format).
    """
    from votenet_tpu.data.geometry import box_corners_votenet

    gt_all: Dict[int, List] = {}
    for img_id, lab in scene_labels.items():
        entries = []
        for j in range(len(lab["bboxes_xyz"])):
            corners = box_corners_votenet(
                lab["bboxes_lwh"][j], lab["bboxes_roty"][j], lab["bboxes_xyz"][j]
            )
            entries.append((CLASS2TYPE[int(lab["semantic_labels"][j])], corners))
        gt_all[img_id] = entries
    return gt_all
