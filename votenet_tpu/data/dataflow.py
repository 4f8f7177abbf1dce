"""Scene processing, augmentation, caching and fixed-shape batching.

Rebuilds the reference input pipeline (dataset.py:155-318, run.py:14-92)
without Tensorpack:

- :func:`process_scene` — one (scene, augmentation) -> training example:
  subsample to POINT_NUM, transform to upright camera, frustum point counts,
  flip/rotate/scale augmentation, class/residual targets. Matches the
  reference ordering: point-count rejection uses the *unaugmented* cloud
  (dataset.py:257,282), boxes are augmented during the object loop, points
  at the end (dataset.py:303-308). The rejection criterion itself follows
  ``config.reject_mode`` — "frustum" (parity: the reference's
  ``len(inds) < 5`` counts the 2D-frustum points, dataset.py:282) or
  "in_box" (corrected: <5 points inside the 3D box).
- :class:`SunRGBDDataFlow` — iterator with per-epoch shuffling and an
  npz-file cache keyed (scene, augment-id), AUGMENT_X variants per training
  scene (dataset.py:177-214).
- :func:`batch_scenes` — fixed-shape batching: GT arrays edge-padded (the
  last real box replicated) to a static ``max_gt_boxes`` with a ``gt_count``
  so the loss can reproduce the reference's per-batch-max padding semantics
  (run.py:62-64) exactly. Scenes whose points are consumed by jit all have
  identical shapes — no recompilation across batches.
"""

from __future__ import annotations

import os
import pickle
import warnings
from typing import Dict, Iterator, List, Optional

import numpy as np

from votenet_tpu.config import Config
from votenet_tpu.data.geometry import (
    TYPE2CLASS,
    TYPE_MEAN_SIZE,
    TYPE_WHITELIST,
    angle2class,
    extract_pc_in_box3d,
    roty,
    size2class,
)
from votenet_tpu.data.sunrgbd import SunRGBDObjectDataset, compute_box_3d

SCENE_KEYS = (
    "bboxes_xyz", "bboxes_lwh", "bboxes_roty", "semantic_labels",
    "heading_labels", "heading_residuals", "size_labels", "size_residuals",
)


def process_scene(
    dataset: SunRGBDObjectDataset,
    idx: int,
    rng: np.random.RandomState,
    training: bool,
    config: Config,
) -> Optional[Dict[str, np.ndarray]]:
    """One scene -> example dict, or None if no usable objects."""
    objects = dataset.get_label_objects(idx)
    if not objects:
        return None
    calib = dataset.get_calibration(idx)
    pc_upright_depth = dataset.get_depth(idx)
    if pc_upright_depth.shape[0] < config.point_num:
        # The reference crashes here (np.random.choice replace=False with
        # n < point_num, dataset.py:186); we skip the scene, loudly.
        warnings.warn(
            f"scene {idx}: only {pc_upright_depth.shape[0]} points "
            f"(< point_num={config.point_num}); skipping scene"
        )
        return None
    choice = rng.choice(pc_upright_depth.shape[0], config.point_num, replace=False)
    pc_upright_depth = pc_upright_depth[choice, :]
    pc_upright_camera = np.zeros_like(pc_upright_depth)
    pc_upright_camera[:, 0:3] = calib.project_upright_depth_to_upright_camera(
        pc_upright_depth[:, 0:3]
    )
    pc_upright_camera[:, 3:] = pc_upright_depth[:, 3:]
    pc_image_coord, _ = calib.project_upright_depth_to_image(pc_upright_depth)

    if training:
        flip_x = rng.rand() > 0.5
        flip_z = rng.rand() > 0.5
        rand_roty_angle = (rng.rand() * 2 - 1.0) * 5.0 / 180 * np.pi
        rand_scale = (rng.rand() * 2 - 1.0) * 0.1 + 1.0

    rows: Dict[str, List] = {k: [] for k in SCENE_KEYS}
    for obj in objects:
        if obj.classname not in TYPE_WHITELIST:
            continue
        xmin, ymin, xmax, ymax = obj.box2d
        fov_inds = (
            (pc_image_coord[:, 0] < xmax)
            & (pc_image_coord[:, 0] >= xmin)
            & (pc_image_coord[:, 1] < ymax)
            & (pc_image_coord[:, 1] >= ymin)
        )
        pc_in_box_fov = pc_upright_camera[fov_inds, :]
        _, box3d_pts_3d = compute_box_3d(obj, calib)
        box3d_pts_3d = calib.project_upright_depth_to_upright_camera(box3d_pts_3d)
        if np.max(box3d_pts_3d[:, 1]) - np.min(box3d_pts_3d[:, 1]) < 1e-7:
            continue  # degenerate SUN RGB-D annotation (dataset.py:255)
        if config.reject_mode == "frustum":
            # Parity: reference dataset.py:282 tests len(inds) < 5 where
            # inds has one boolean per frustum point, i.e. the criterion is
            # "<5 points in the 2D-box frustum". The in-hull result is never
            # otherwise used, so we skip the Delaunay entirely.
            support = pc_in_box_fov.shape[0]
        elif config.reject_mode == "in_box":
            # <5 points inside the 3D box (stricter, corrected)
            if pc_in_box_fov.shape[0] == 0:
                continue
            _, inds = extract_pc_in_box3d(pc_in_box_fov, box3d_pts_3d)
            support = int(np.sum(inds))
        else:
            raise ValueError(
                f"unknown reject_mode {config.reject_mode!r} "
                "(expected 'frustum' or 'in_box')"
            )

        box3d_size = np.array([2 * obj.l, 2 * obj.w, 2 * obj.h])
        box3d_center = (box3d_pts_3d[0, :] + box3d_pts_3d[6, :]) / 2
        heading_angle = obj.heading_angle

        if training:
            if flip_x:
                box3d_center[0] = -box3d_center[0]
                heading_angle = np.pi - heading_angle
            if flip_z:
                box3d_center[2] = -box3d_center[2]
                heading_angle = -heading_angle
            box3d_center = (roty(rand_roty_angle) @ box3d_center.T).T
            heading_angle += rand_roty_angle
            box3d_center = box3d_center * rand_scale
            box3d_size = box3d_size * rand_scale

        size_class, size_residual = size2class(box3d_size, obj.classname)
        angle_class, angle_residual = angle2class(heading_angle, config.num_heading_bin)

        if support < 5:
            continue  # too few supporting points (dataset.py:281-283)

        rows["bboxes_xyz"].append(box3d_center)
        rows["bboxes_lwh"].append(box3d_size)
        rows["bboxes_roty"].append(heading_angle)
        rows["semantic_labels"].append(TYPE2CLASS[obj.classname])
        rows["heading_labels"].append(angle_class)
        rows["heading_residuals"].append(
            angle_residual / (np.pi / config.num_heading_bin)
        )
        rows["size_labels"].append(size_class)
        rows["size_residuals"].append(size_residual / TYPE_MEAN_SIZE[obj.classname])

    if not rows["bboxes_xyz"]:
        return None

    if training:
        if flip_x:
            pc_upright_camera[..., 0] = -pc_upright_camera[..., 0]
        if flip_z:
            pc_upright_camera[..., 2] = -pc_upright_camera[..., 2]
        pc_upright_camera[:, :3] = (roty(rand_roty_angle) @ pc_upright_camera[:, :3].T).T
        pc_upright_camera[:, :3] = pc_upright_camera[:, :3] * rand_scale

    return {
        "data_idx": np.int32(idx),
        "points": pc_upright_camera[:, :3].astype(np.float32),
        "bboxes_xyz": np.array(rows["bboxes_xyz"], dtype=np.float32),
        "bboxes_lwh": np.array(rows["bboxes_lwh"], dtype=np.float32),
        "bboxes_roty": np.array(rows["bboxes_roty"], dtype=np.float32),
        "semantic_labels": np.array(rows["semantic_labels"], dtype=np.int32),
        "heading_labels": np.array(rows["heading_labels"], dtype=np.int32),
        "heading_residuals": np.array(rows["heading_residuals"], dtype=np.float32),
        "size_labels": np.array(rows["size_labels"], dtype=np.int32),
        "size_residuals": np.array(rows["size_residuals"], dtype=np.float32),
    }


class SunRGBDDataFlow:
    """Cached, shuffled scene iterator (reference MyDataFlow, dataset.py:155-318)."""

    def __init__(
        self,
        root: str,
        split: str,
        training: bool,
        config: Config,
        idx_list: Optional[List[int]] = None,
        cache_dir: Optional[str] = None,
        seed: int = 0,
    ):
        self.dataset = SunRGBDObjectDataset(root, split, idx_list)
        self.training = training
        self.config = config
        self.cache_dir = cache_dir
        self.rng = np.random.RandomState(seed)
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)

    def __len__(self) -> int:
        return len(self.dataset)

    def _cache_path(self, idx: int, augment: int) -> str:
        # the cache key must include every config knob that changes the
        # processed scene — otherwise flipping e.g. --reject_mode silently
        # replays stale pickles (the reference cache had no knobs at all,
        # dataset.py:177-214)
        cfg_key = (
            f"p{self.config.point_num}_h{self.config.num_heading_bin}_"
            f"{self.config.reject_mode}"
        )
        return os.path.join(self.cache_dir, f"data{idx}_{augment}_{cfg_key}.pkl")

    def _pick_augment(self, idx: int) -> int:
        """Fill uncached augmentation slots first (dataset.py:192-204)."""
        if not self.training:
            return 0
        if self.cache_dir is None:
            return int(self.rng.randint(self.config.augment_x))
        missing = [
            a
            for a in range(self.config.augment_x)
            if not os.path.exists(self._cache_path(idx, a))
        ]
        if not missing:
            return int(self.rng.randint(self.config.augment_x))
        return missing[0]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        samples = list(self.dataset.samples)
        if self.training:
            self.rng.shuffle(samples)
        for idx in samples:
            augment = self._pick_augment(idx)
            if self.cache_dir is not None:
                path = self._cache_path(idx, augment)
                if os.path.exists(path):
                    with open(path, "rb") as f:
                        scene = pickle.load(f)
                    if scene:  # empty-scene sentinel (dataset.py:317-318)
                        yield scene
                    continue
            scene = process_scene(
                self.dataset, idx, self.rng, self.training, self.config
            )
            if self.cache_dir is not None:
                with open(self._cache_path(idx, augment), "wb") as f:
                    pickle.dump(scene if scene else {}, f)
            if scene:
                yield scene


class GTOverflowError(ValueError):
    """A scene's GT-box count exceeds the static ``max_gt_boxes`` cap."""


def pad_gt_to_static(
    scene: Dict[str, np.ndarray], max_gt: int, on_overflow: str = "raise"
) -> Dict[str, np.ndarray]:
    """Edge-pad per-box arrays to a static length (replicating the last box,
    the reference's np.pad mode='edge', run.py:14-24) + gt_count.

    The reference pads to the per-batch max with no cap (run.py:62-64); our
    static shapes need a bound. A scene exceeding it would silently change
    training/eval targets, so ``on_overflow`` defaults to "raise"
    (:class:`GTOverflowError` naming the scene — raise ``max_gt_boxes``,
    e.g. ``--max_gt_boxes=128``, to keep the boxes). ``on_overflow=
    "truncate"`` keeps the old warn-and-drop behavior as an explicit opt-in.
    Run ``python run_train.py --scan_gt`` to measure a split's box-count
    distribution before a long run (see :func:`scan_gt_counts`).
    """
    out = dict(scene)
    n = scene["bboxes_xyz"].shape[0]
    if n > max_gt:
        msg = (
            f"scene {scene.get('data_idx', '?')}: {n} GT boxes exceed "
            f"max_gt_boxes={max_gt}. Raise Config.max_gt_boxes to keep them"
            f" (use --scan_gt to size it for the split)."
        )
        if on_overflow == "raise":
            raise GTOverflowError(msg)
        warnings.warn(msg + f" Truncating {n - max_gt} boxes.")
        for k in SCENE_KEYS:
            out[k] = scene[k][:max_gt]
        n = max_gt
    elif n < max_gt:
        sel = np.minimum(np.arange(max_gt), n - 1)
        for k in SCENE_KEYS:
            out[k] = scene[k][sel]
    out["gt_count"] = np.int32(n)
    return out


def batch_scenes(
    scenes: Iterator[Dict[str, np.ndarray]],
    batch_size: int,
    max_gt: int,
    drop_remainder: bool = True,
    on_overflow: str = "raise",
) -> Iterator[Dict[str, np.ndarray]]:
    """Stack fixed-shape examples into batches (reference BatchData2Biggest,
    run.py:27-92, made static-shape). Scenes whose GT-box count exceeds
    ``max_gt`` raise :class:`GTOverflowError` by default (``on_overflow`` —
    see :func:`pad_gt_to_static`)."""
    holder: List[Dict[str, np.ndarray]] = []
    for scene in scenes:
        holder.append(pad_gt_to_static(scene, max_gt, on_overflow))
        if len(holder) == batch_size:
            yield {k: np.stack([h[k] for h in holder]) for k in holder[0]}
            holder = []
    if holder and not drop_remainder:
        while len(holder) < batch_size:  # repeat-pad the final partial batch
            holder.append(holder[-1])
        yield {k: np.stack([h[k] for h in holder]) for k in holder[0]}


def scan_gt_counts(scenes: Iterator[Dict[str, np.ndarray]]) -> Dict[str, object]:
    """Measure the whitelisted-GT-box count distribution of a scene stream.

    The reference pads each batch to its own max with no global bound
    (run.py:62-64), so any static ``max_gt_boxes`` cap is a guess until the
    split is scanned. Returns ``{n_scenes, max, p50, p95, p99, histogram}``
    where histogram maps box-count -> #scenes. Feed any scene iterator —
    ``SunRGBDDataFlow`` over the real split when mounted, the mini fixture
    or synthetic scenes otherwise. Used by ``run_train.py --scan_gt``.
    """
    counts: List[int] = []
    for scene in scenes:
        counts.append(int(scene["bboxes_xyz"].shape[0]))
    if not counts:
        return {"n_scenes": 0, "max": 0, "p50": 0, "p95": 0, "p99": 0,
                "histogram": {}}
    arr = np.asarray(counts)
    hist: Dict[int, int] = {}
    for c in counts:
        hist[c] = hist.get(c, 0) + 1
    return {
        "n_scenes": len(counts),
        "max": int(arr.max()),
        "p50": int(np.percentile(arr, 50)),
        "p95": int(np.percentile(arr, 95)),
        "p99": int(np.percentile(arr, 99)),
        "histogram": dict(sorted(hist.items())),
    }
