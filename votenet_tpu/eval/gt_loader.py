"""Loader for frustum-pointnets ground-truth box dumps.

Rebuilds the reference's eval-GT ingestion (utils.py:204-263): per-class
``%s_gt_boxes.dat`` / ``%s_gt_imgids.txt`` files whose 10-float rows are
(4 x/z top-face corner pairs, zmin, zmax) in upright-depth coordinates, with
inconsistent polygon winding that must be normalized, flipped into upright
camera coordinates, and top/bottom faces swapped (utils.py:220-246).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from votenet_tpu.data.geometry import flip_axis_to_camera, is_clockwise


def box_conversion(bbox: np.ndarray) -> np.ndarray:
    """10-float dump row -> (8,3) corners in upright depth coords
    (utils.py:220-237), normalizing winding to counter-clockwise."""
    bbox3d = np.zeros((8, 3))
    xy = np.reshape(bbox[0:8], (4, 2))
    if is_clockwise(xy):
        bbox3d[0:4, 0:2] = xy
        bbox3d[4:, 0:2] = xy
    else:
        bbox3d[0:4, 0:2] = xy[::-1, :]
        bbox3d[4:, 0:2] = xy[::-1, :]
    bbox3d[0:4, 2] = bbox[9]  # zmax
    bbox3d[4:, 2] = bbox[8]  # zmin
    return bbox3d


def wrapper(bbox: np.ndarray) -> np.ndarray:
    """Dump row -> (8,3) corners in upright camera coords with the top face
    first (utils.py:240-246)."""
    bbox3d = flip_axis_to_camera(box_conversion(bbox))
    flipped = np.copy(bbox3d)
    flipped[0:4, :] = bbox3d[4:, :]
    flipped[4:, :] = bbox3d[0:4, :]
    return flipped


def get_gt_cls(gt_boxes_dir: str, classname: str) -> Dict[float, List[np.ndarray]]:
    """Load one class's GT boxes keyed by image id (utils.py:249-263)."""
    gt: Dict[float, List[np.ndarray]] = {}
    gt_boxes = np.loadtxt(os.path.join(gt_boxes_dir, f"{classname}_gt_boxes.dat"))
    gt_imgids = np.loadtxt(os.path.join(gt_boxes_dir, f"{classname}_gt_imgids.txt"))
    gt_boxes = np.atleast_2d(gt_boxes)
    gt_imgids = np.atleast_1d(gt_imgids)
    for i in range(len(gt_imgids)):
        gt.setdefault(gt_imgids[i], []).append(wrapper(gt_boxes[i]))
    return gt


def load_gt_all(gt_boxes_dir: str, classnames) -> Dict:
    """Aggregate all classes into {img_id: [(classname, corners)]}
    (the run.py:102-110 assembly)."""
    gt_all: Dict = {}
    for classname in classnames:
        per_cls = get_gt_cls(gt_boxes_dir, classname)
        for img_id, boxes in per_cls.items():
            for box in boxes:
                gt_all.setdefault(img_id, []).append((classname, box))
    return gt_all
