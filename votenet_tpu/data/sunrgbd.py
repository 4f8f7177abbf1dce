"""SUN RGB-D dataset IO: labels, calibration, depth point clouds.

Rebuilds the reference readers (sunutils.py:10-121, dataset.py:111-152):
file-per-index layout ``<root>/<split>/{image,calib,depth,label_dimension}``
with 17-float label lines, column-major Rtilt/K calibration, and depth
points stored as whitespace text in upright-depth coordinates.

cv2/mayavi are NOT imported here (the reference's dataset module hard-imports
both, making viz a mandatory dependency — SURVEY §2 P4); image loading is
optional and gated.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from votenet_tpu.data.geometry import flip_axis_to_camera, flip_axis_to_depth, rotz


class SUNObject3d:
    """One 17-float label line (reference sunutils.py:10-34).

    Fields: classname, 2D box (xmin,ymin,w,h -> corners), centroid,
    half-sizes (w,l,h), in-plane orientation basis; heading =
    -atan2(ori_y, ori_x).
    """

    def __init__(self, line: str):
        data = line.split(" ")
        vals = [float(x) for x in data[1:]]
        self.classname = data[0]
        self.xmin, self.ymin = vals[0], vals[1]
        self.xmax, self.ymax = vals[0] + vals[2], vals[1] + vals[3]
        self.box2d = np.array([self.xmin, self.ymin, self.xmax, self.ymax])
        self.centroid = np.array(vals[4:7])
        self.w, self.l, self.h = vals[7], vals[8], vals[9]
        self.orientation = np.array([vals[14], vals[15], 0.0])
        self.heading_angle = -1 * np.arctan2(self.orientation[1], self.orientation[0])


def read_sunrgbd_label(label_filename: str) -> List[SUNObject3d]:
    with open(label_filename) as f:
        lines = [line.rstrip() for line in f if line.strip()]
    return [SUNObject3d(line) for line in lines]


def load_depth_points(depth_filename: str) -> np.ndarray:
    """Depth .txt -> (N, 6) float array (xyz + rgb), reference sunutils.py:178-180.

    Uses np.fromstring-style fast parsing instead of np.loadtxt (the
    reference's loadtxt is the data-pipeline hot spot for 20k+ point files).
    """
    with open(depth_filename) as f:
        first = f.readline()
        ncol = len(first.split())
        if ncol == 0:
            return np.zeros((0, 6))
        text = first + f.read()
    from votenet_tpu import native

    flat = (
        native.parse_floats(text)
        if native.available()
        else np.array(text.split(), dtype=np.float64)
    )
    return flat.reshape(-1, ncol)


class SUNRGBDCalibration:
    """Rtilt/K calibration and the five SUN RGB-D coordinate systems
    (reference sunutils.py:37-121)."""

    def __init__(self, calib_filepath: str):
        with open(calib_filepath) as f:
            lines = [line.rstrip() for line in f]
        self.Rtilt = np.reshape(
            np.array([float(x) for x in lines[0].split(" ")]), (3, 3), order="F"
        )
        self.K = np.reshape(
            np.array([float(x) for x in lines[1].split(" ")]), (3, 3), order="F"
        )
        self.f_u, self.f_v = self.K[0, 0], self.K[1, 1]
        self.c_u, self.c_v = self.K[0, 2], self.K[1, 2]

    def project_upright_depth_to_camera(self, pc: np.ndarray) -> np.ndarray:
        pc2 = np.dot(np.transpose(self.Rtilt), np.transpose(pc[:, 0:3]))
        return flip_axis_to_camera(np.transpose(pc2))

    def project_upright_depth_to_image(self, pc: np.ndarray):
        pc2 = self.project_upright_depth_to_camera(pc)
        uv = np.dot(pc2, np.transpose(self.K))
        uv[:, 0] /= uv[:, 2]
        uv[:, 1] /= uv[:, 2]
        return uv[:, 0:2], pc2[:, 2]

    def project_upright_depth_to_upright_camera(self, pc: np.ndarray) -> np.ndarray:
        return flip_axis_to_camera(pc)

    def project_upright_camera_to_upright_depth(self, pc: np.ndarray) -> np.ndarray:
        return flip_axis_to_depth(pc)

    def project_image_to_camera(self, uv_depth: np.ndarray) -> np.ndarray:
        x = ((uv_depth[:, 0] - self.c_u) * uv_depth[:, 2]) / self.f_u
        y = ((uv_depth[:, 1] - self.c_v) * uv_depth[:, 2]) / self.f_v
        out = np.zeros((uv_depth.shape[0], 3))
        out[:, 0], out[:, 1], out[:, 2] = x, y, uv_depth[:, 2]
        return out

    def project_image_to_upright_camera(self, uv_depth: np.ndarray) -> np.ndarray:
        pts_cam = self.project_image_to_camera(uv_depth)
        pts_depth = flip_axis_to_depth(pts_cam)
        pts_upright_depth = np.transpose(np.dot(self.Rtilt, np.transpose(pts_depth)))
        return self.project_upright_depth_to_upright_camera(pts_upright_depth)


def transform_from_rot_trans(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """4x4 homogeneous transform from R (3,3) and t (3,) (sunutils.py:151-155)."""
    R = R.reshape(3, 3)
    t = t.reshape(3, 1)
    return np.vstack((np.hstack([R, t]), [0, 0, 0, 1]))


def inverse_rigid_trans(Tr: np.ndarray) -> np.ndarray:
    """Invert a (3,4) [R|t] rigid transform (sunutils.py:158-165)."""
    inv = np.zeros_like(Tr)
    inv[0:3, 0:3] = np.transpose(Tr[0:3, 0:3])
    inv[0:3, 3] = np.dot(-np.transpose(Tr[0:3, 0:3]), Tr[0:3, 3])
    return inv


def random_shift_box2d(box2d: np.ndarray, shift_ratio: float = 0.1, rng=None) -> np.ndarray:
    """Randomly shift/scale a 2D box (sunutils.py:183-196); takes an
    explicit RNG instead of global numpy state."""
    rng = rng or np.random
    r = shift_ratio
    xmin, ymin, xmax, ymax = box2d
    h, w = ymax - ymin, xmax - xmin
    cx, cy = (xmin + xmax) / 2.0, (ymin + ymax) / 2.0
    cx2 = cx + w * r * (rng.random() * 2 - 1)
    cy2 = cy + h * r * (rng.random() * 2 - 1)
    h2 = h * (1 + rng.random() * 2 * r - r)
    w2 = w * (1 + rng.random() * 2 * r - r)
    return np.array([cx2 - w2 / 2.0, cy2 - h2 / 2.0, cx2 + w2 / 2.0, cy2 + h2 / 2.0])


def compute_orientation_3d(obj: SUNObject3d, calib: SUNRGBDCalibration):
    """Project the object's orientation arrow into the image
    (sunutils.py:246-264). Returns ((2,2) image pts, (2,3) 3D pts)."""
    ori = obj.orientation
    orientation_3d = np.array([[0.0, ori[0]], [0.0, ori[1]], [0.0, 0.0]])
    orientation_3d += obj.centroid.reshape(3, 1)
    orientation_2d, _ = calib.project_upright_depth_to_image(np.transpose(orientation_3d))
    return orientation_2d, np.transpose(orientation_3d)


def save_zipped_pickle(obj, filename: str, protocol: int = -1) -> None:
    """gzip-pickle writer (sunutils.py:297-299)."""
    import gzip
    import pickle

    with gzip.open(filename, "wb") as f:
        pickle.dump(obj, f, protocol)


def load_zipped_pickle(filename: str):
    """gzip-pickle reader (sunutils.py:302-305)."""
    import gzip
    import pickle

    with gzip.open(filename, "rb") as f:
        return pickle.load(f)


def compute_box_3d(obj: SUNObject3d, calib: SUNRGBDCalibration):
    """Label -> 8 corners in upright depth + 2D projection
    (reference sunutils.py:212-243). Extents are doubled half-sizes."""
    R = rotz(-1 * obj.heading_angle)
    l, w, h = obj.l, obj.w, obj.h
    x = [-l, l, l, -l, -l, l, l, -l]
    y = [w, w, -w, -w, w, w, -w, -w]
    z = [h, h, h, h, -h, -h, -h, -h]
    corners = np.dot(R, np.vstack([x, y, z]))
    corners += obj.centroid.reshape(3, 1)
    corners_2d, _ = calib.project_upright_depth_to_image(np.transpose(corners))
    return corners_2d, np.transpose(corners)


class SunRGBDObjectDataset:
    """File-per-index SUN RGB-D reader (reference dataset.py:111-152)."""

    def __init__(self, root_dir: str, split: str = "training", idx_list: Optional[list] = None):
        self.root_dir = root_dir
        self.split = split
        self.split_dir = os.path.join(root_dir, split)
        self.samples = (
            list(idx_list)
            if idx_list is not None
            else list(range(1, 10336 if split == "training" else 2861))
        )
        self.image_dir = os.path.join(self.split_dir, "image")
        self.calib_dir = os.path.join(self.split_dir, "calib")
        self.depth_dir = os.path.join(self.split_dir, "depth")
        self.label_dir = os.path.join(self.split_dir, "label_dimension")

    def __len__(self) -> int:
        return len(self.samples)

    def get_depth(self, idx: int) -> np.ndarray:
        return load_depth_points(os.path.join(self.depth_dir, "%06d.txt" % idx))

    def get_calibration(self, idx: int) -> SUNRGBDCalibration:
        return SUNRGBDCalibration(os.path.join(self.calib_dir, "%06d.txt" % idx))

    def get_label_objects(self, idx: int) -> List[SUNObject3d]:
        return read_sunrgbd_label(os.path.join(self.label_dir, "%06d.txt" % idx))

    def get_image(self, idx: int):
        import cv2  # optional dependency, only for viz paths

        return cv2.imread(os.path.join(self.image_dir, "%06d.jpg" % idx))
