"""Synthetic SUN RGB-D-like scene generator.

The reference has no synthetic data path at all (its only end-to-end signal
is real-data training, SURVEY §4); this module provides deterministic random
scenes with the exact example schema of the real pipeline, enabling:

- end-to-end tests (forward + loss + decode + NMS + AP) without the dataset;
- overfit smoke-training (the bench and CI sanity checks);
- throughput benchmarking with realistic shapes.

Scenes contain box-shaped point clusters on a uniform background; labels are
produced with the same codecs as the real pipeline so codec round-trips are
exercised.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from votenet_tpu.config import Config
from votenet_tpu.data.geometry import (
    CLASS2TYPE,
    TYPE_MEAN_SIZE,
    angle2class,
    box_corners_votenet,
    size2class,
)


def synthetic_scene(
    rng: np.random.RandomState, config: Config, num_boxes: int | None = None
) -> Dict[str, np.ndarray]:
    """One synthetic example with the schema of dataflow.process_scene."""
    if num_boxes is None:
        num_boxes = int(rng.randint(1, min(8, config.max_gt_boxes) + 1))
    classes = rng.randint(0, config.num_class, num_boxes)
    centers = np.stack(
        [
            rng.uniform(-3, 3, num_boxes),
            rng.uniform(-0.5, 1.5, num_boxes),
            rng.uniform(1, 6, num_boxes),
        ],
        axis=-1,
    )
    headings = rng.uniform(-np.pi, np.pi, num_boxes)
    sizes = np.stack(
        [TYPE_MEAN_SIZE[CLASS2TYPE[int(c)]] * rng.uniform(0.85, 1.15, 3) for c in classes]
    )

    # points: uniform room background + per-box clusters
    n_bg = config.point_num // 2
    bg = np.stack(
        [
            rng.uniform(-4, 4, n_bg),
            rng.uniform(-1, 2, n_bg),
            rng.uniform(0, 7, n_bg),
        ],
        axis=-1,
    )
    n_fg = config.point_num - n_bg
    per_box = np.full(num_boxes, n_fg // num_boxes)
    per_box[: n_fg - per_box.sum()] += 1
    fg: List[np.ndarray] = []
    for j in range(num_boxes):
        local = rng.uniform(-0.5, 0.5, (per_box[j], 3)) * sizes[j]
        c, s = np.cos(headings[j]), np.sin(headings[j])
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        fg.append(local @ R.T + centers[j])
    points = np.concatenate([bg] + fg, axis=0).astype(np.float32)
    rng.shuffle(points)

    heading_labels, heading_residuals = [], []
    size_labels, size_residuals = [], []
    for j in range(num_boxes):
        hc, hr = angle2class(headings[j] % (2 * np.pi), config.num_heading_bin)
        heading_labels.append(hc)
        heading_residuals.append(hr / (np.pi / config.num_heading_bin))
        sc, sr = size2class(sizes[j], CLASS2TYPE[int(classes[j])])
        size_labels.append(sc)
        size_residuals.append(sr / TYPE_MEAN_SIZE[CLASS2TYPE[int(classes[j])]])

    return {
        "data_idx": np.int32(rng.randint(1 << 30)),
        "points": points,
        "bboxes_xyz": centers.astype(np.float32),
        "bboxes_lwh": sizes.astype(np.float32),
        "bboxes_roty": headings.astype(np.float32),
        "semantic_labels": classes.astype(np.int32),
        "heading_labels": np.array(heading_labels, dtype=np.int32),
        "heading_residuals": np.array(heading_residuals, dtype=np.float32),
        "size_labels": np.array(size_labels, dtype=np.int32),
        "size_residuals": np.array(size_residuals, dtype=np.float32),
    }


def synthetic_scenes(seed: int, config: Config, count: int):
    """Deterministic list of synthetic scenes."""
    rng = np.random.RandomState(seed)
    return [synthetic_scene(rng, config) for _ in range(count)]


def synthetic_gt_all(scenes) -> Dict:
    """Eval GT structure {img_id: [(classname, corners)]} for the scenes."""
    gt_all: Dict = {}
    for sc in scenes:
        entries = []
        for j in range(len(sc["bboxes_xyz"])):
            corners = box_corners_votenet(
                sc["bboxes_lwh"][j], sc["bboxes_roty"][j], sc["bboxes_xyz"][j]
            )
            entries.append((CLASS2TYPE[int(sc["semantic_labels"][j])], corners))
        gt_all[int(sc["data_idx"])] = entries
    return gt_all
