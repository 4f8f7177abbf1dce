"""Evaluation subsystem: 3D IoU, VOC AP, batched mAP evaluator."""

from votenet_tpu.eval.ap import voc_ap, eval_det, eval_det_cls
from votenet_tpu.eval.iou import iou_3d
from votenet_tpu.eval.evaluator import Evaluator

__all__ = ["voc_ap", "eval_det", "eval_det_cls", "iou_3d", "Evaluator"]
