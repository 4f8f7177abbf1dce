"""High-level inference API.

The working equivalent of Tensorpack's ``OfflinePredictor(PredictConfig(...))``
used (in dead code) by the reference (evaluator.py:239-243) and of the
trainer-attached predictor (evaluator.py:215): loads a checkpoint, jits the
full forward + decode + NMS path once, and serves batched or single-scene
requests with fixed shapes (padding internally).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from votenet_tpu.config import Config, default_config
from votenet_tpu.data.geometry import CLASS2TYPE


class VoteNetPredictor:
    """Checkpoint -> callable detector.

    Note: ``config.use_pallas`` is applied through the PROCESS-GLOBAL
    dispatch gate (``ops.dispatch.set_use_pallas``) and ops consult it at
    trace time only. Constructing predictors with conflicting
    ``use_pallas`` values in one process leaves the gate at the last
    constructor's value for any *new* shape traced afterwards; already-
    traced shapes keep the executable they compiled with. Both
    implementations are semantically identical (oracle-tested), so this
    affects only which backend runs — use one setting per process.
    """

    def __init__(
        self,
        config: Optional[Config] = None,
        log_dir: Optional[str] = None,
        variables: Optional[Dict] = None,
        batch_size: int = 8,
        nms_iou: Optional[float] = None,
    ):
        from votenet_tpu.models.decode import predict_boxes
        from votenet_tpu.models.votenet import VoteNet
        from votenet_tpu.ops.dispatch import apply_config

        self.config = config or default_config()
        apply_config(self.config)
        self.batch_size = batch_size
        model = VoteNet(self.config)

        if variables is None:
            from votenet_tpu.train.state import create_train_state
            from votenet_tpu.utils import checkpoint as ckpt

            state = create_train_state(jax.random.PRNGKey(0), self.config, 1)
            if log_dir is not None:
                state, step = ckpt.restore_checkpoint(log_dir, state)
                self.restored_step = step
            else:
                self.restored_step = None
            variables = {"params": state.params, "batch_stats": state.batch_stats}

        cfg = self.config
        iou = cfg.nms_iou if nms_iou is None else nms_iou

        @jax.jit
        def _predict(points):
            end_points = model.apply(variables, points, train=False)
            pred = predict_boxes(end_points, cfg, nms_iou=iou)
            return {
                "bboxes": pred["bboxes"],
                "class_scores": pred["class_scores"],
                "keep": pred["keep"],
                "objectness": pred["objectness"],
            }

        self._predict = _predict

    def __call__(self, points: np.ndarray) -> Dict[str, np.ndarray]:
        """Raw fixed-shape prediction for a (B, N, 3) batch."""
        return self._predict(points.astype(np.float32))

    def detect(self, points: np.ndarray) -> List[Tuple[str, np.ndarray, float]]:
        """Single scene (N, 3) -> [(classname, corners (8,3), score)].

        Matches the reference evaluator's per-scene decode: class = argmax
        semantic logit, confidence = that logit (evaluator.py:224-226).
        """
        batch = np.broadcast_to(points[None], (1,) + points.shape)
        out = {k: np.asarray(v) for k, v in self._predict(batch.astype(np.float32)).items()}
        dets = []
        for pi in np.nonzero(out["keep"][0])[0]:
            cls_idx = int(np.argmax(out["class_scores"][0, pi]))
            dets.append(
                (
                    CLASS2TYPE[cls_idx],
                    out["bboxes"][0, pi],
                    float(out["class_scores"][0, pi, cls_idx]),
                )
            )
        return dets

    def detect_batch(self, scenes: List[np.ndarray]) -> List[List[Tuple[str, np.ndarray, float]]]:
        """Many scenes, padded to the predictor batch size internally."""
        results = []
        B = self.batch_size
        for start in range(0, len(scenes), B):
            chunk = scenes[start : start + B]
            n_real = len(chunk)
            while len(chunk) < B:
                chunk.append(chunk[-1])
            out = {k: np.asarray(v) for k, v in self(np.stack(chunk)).items()}
            for bi in range(n_real):
                dets = []
                for pi in np.nonzero(out["keep"][bi])[0]:
                    cls_idx = int(np.argmax(out["class_scores"][bi, pi]))
                    dets.append(
                        (
                            CLASS2TYPE[cls_idx],
                            out["bboxes"][bi, pi],
                            float(out["class_scores"][bi, pi, cls_idx]),
                        )
                    )
                results.append(dets)
        return results
