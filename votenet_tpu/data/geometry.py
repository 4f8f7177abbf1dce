"""Host-side geometry and label codecs for SUN RGB-D.

Rebuilds the pure-numpy helpers of the reference's ``dataset.py`` /
``sunutils.py``: rotation matrices (sunutils.py:124-148), the corner-izer
(dataset.py:93-108), the heading-angle and size class/residual codecs
(dataset.py:52-90), point-in-hull tests (sunutils.py:199-209), and the SUN
RGB-D class taxonomy with per-class mean sizes (dataset.py:31-49).

These run on the host in the input pipeline; device-side equivalents (where
needed inside jit) live in :mod:`votenet_tpu.models.decode` (corner-izer,
size/heading decode) and :mod:`votenet_tpu.models.losses`.
"""

from __future__ import annotations

import numpy as np

# --- Class taxonomy (reference dataset.py:31-49) ---

TYPE2CLASS = {
    "bed": 0, "table": 1, "sofa": 2, "chair": 3, "toilet": 4,
    "desk": 5, "dresser": 6, "night_stand": 7, "bookshelf": 8, "bathtub": 9,
}
CLASS2TYPE = {v: k for k, v in TYPE2CLASS.items()}
TYPE_WHITELIST = (
    "bed", "table", "sofa", "chair", "toilet",
    "desk", "dresser", "night_stand", "bookshelf", "bathtub",
)

TYPE_MEAN_SIZE = {
    "bathtub": np.array([0.765840, 1.398258, 0.472728]),
    "bed": np.array([2.114256, 1.620300, 0.927272]),
    "bookshelf": np.array([0.404671, 1.071108, 1.688889]),
    "chair": np.array([0.591958, 0.552978, 0.827272]),
    "desk": np.array([0.695190, 1.346299, 0.736364]),
    "dresser": np.array([0.528526, 1.002642, 1.172878]),
    "night_stand": np.array([0.500618, 0.632163, 0.683424]),
    "sofa": np.array([0.923508, 1.867419, 0.845495]),
    "table": np.array([0.791118, 1.279516, 0.718182]),
    "toilet": np.array([0.699104, 0.454178, 0.756250]),
}

CLASS_MEAN_SIZE = np.zeros((len(TYPE2CLASS), 3), dtype=np.float32)
for _t, _idx in TYPE2CLASS.items():
    CLASS_MEAN_SIZE[_idx] = TYPE_MEAN_SIZE[_t]


# --- Rotations (reference sunutils.py:124-148) ---

def rotx(t: float) -> np.ndarray:
    """Rotation about the x-axis."""
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def roty(t: float) -> np.ndarray:
    """Rotation about the y-axis."""
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rotz(t: float) -> np.ndarray:
    """Rotation about the z-axis."""
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


# --- Heading / size codecs (reference dataset.py:52-90) ---

def angle2class(angle: float, num_class: int):
    """Continuous angle -> (bin class, residual).

    Bin centers at ``i*(2pi/N)``; residual in ``±pi/N``. Mirrors
    dataset.py:52-67 exactly, including the half-bin shift.
    """
    angle = angle % (2 * np.pi)
    assert 0 <= angle <= 2 * np.pi
    angle_per_class = 2 * np.pi / float(num_class)
    shifted_angle = (angle + angle_per_class / 2) % (2 * np.pi)
    class_id = int(shifted_angle / angle_per_class)
    residual_angle = shifted_angle - (class_id * angle_per_class + angle_per_class / 2)
    return class_id, residual_angle


def class2angle(pred_cls: int, residual: float, num_class: int, to_label_format: bool = True) -> float:
    """Inverse of :func:`angle2class` (dataset.py:70-77)."""
    angle_per_class = 2 * np.pi / float(num_class)
    angle = pred_cls * angle_per_class + residual
    if to_label_format and angle > np.pi:
        angle = angle - 2 * np.pi
    return angle


def size2class(size: np.ndarray, type_name: str):
    """3D box size (l,w,h) -> (size class, residual) (dataset.py:80-84)."""
    return TYPE2CLASS[type_name], size - TYPE_MEAN_SIZE[type_name]


def class2size(pred_cls: int, residual: np.ndarray) -> np.ndarray:
    """Inverse of :func:`size2class` (dataset.py:87-90)."""
    return TYPE_MEAN_SIZE[CLASS2TYPE[pred_cls]] + residual


# --- Box corner-izers ---

def get_3d_box(box_size, heading_angle, center) -> np.ndarray:
    """(l,w,h), heading, center -> (8,3) corners; reference dataset.py:93-108.

    Heading is clockwise from +x about the y (up in camera coords) axis.
    Corner order: 0-3 top face (+h/2), 4-7 bottom face, matching the
    reference exactly (required by the IoU code which reads corners 0..3 as
    the top-face x/z quad and corners 0/4 for the y extent).
    """
    R = roty(heading_angle)
    l, w, h = box_size
    x_corners = [l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2]
    y_corners = [h / 2, h / 2, h / 2, h / 2, -h / 2, -h / 2, -h / 2, -h / 2]
    z_corners = [w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2]
    corners = np.dot(R, np.vstack([x_corners, y_corners, z_corners]))
    corners += np.asarray(center, dtype=np.float64).reshape(3, 1)
    return corners.T


def box_corners_votenet(size, heading, center) -> np.ndarray:
    """Batched numpy corner-izer matching the in-graph layout (model.py:100-112).

    ``size``: (..., 3) in l,w,h order; ``heading``: (...,); ``center``: (..., 3).
    Returns (..., 8, 3). Identical math to :func:`get_3d_box`, vectorized.
    """
    size = np.asarray(size, dtype=np.float64)
    heading = np.asarray(heading, dtype=np.float64)
    center = np.asarray(center, dtype=np.float64)
    c, s = np.cos(heading), np.sin(heading)
    zeros, ones = np.zeros_like(c), np.ones_like(c)
    R = np.stack(
        [c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1
    ).reshape(heading.shape + (3, 3))
    l, w, h = size[..., 0], size[..., 1], size[..., 2]
    x = np.stack([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2], -1)
    y = np.stack([h / 2, h / 2, h / 2, h / 2, -h / 2, -h / 2, -h / 2, -h / 2], -1)
    z = np.stack([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2], -1)
    corners = np.stack([x, y, z], axis=-2)  # (..., 3, 8)
    rotated = np.einsum("...ij,...jk->...ki", R, corners)  # (..., 8, 3)
    return rotated + center[..., None, :]


# --- Point-in-box tests (reference sunutils.py:199-209) ---

def in_hull(p: np.ndarray, hull) -> np.ndarray:
    """Boolean mask of points inside the convex hull of ``hull`` vertices."""
    from scipy.spatial import Delaunay

    if not isinstance(hull, Delaunay):
        hull = Delaunay(hull)
    return hull.find_simplex(p) >= 0


def extract_pc_in_box3d(pc: np.ndarray, box3d: np.ndarray):
    """pc: (N,3+); box3d: (8,3). Returns (points inside, bool mask)."""
    inds = in_hull(pc[:, 0:3], box3d)
    return pc[inds, :], inds


def flip_axis_to_camera(pc: np.ndarray) -> np.ndarray:
    """X-right,Y-forward,Z-up -> X-right,Y-down,Z-forward (sunutils.py:70-77)."""
    pc2 = np.copy(pc)
    pc2[:, [0, 1, 2]] = pc2[:, [0, 2, 1]]
    pc2[:, 1] *= -1
    return pc2


def flip_axis_to_depth(pc: np.ndarray) -> np.ndarray:
    """Inverse of :func:`flip_axis_to_camera` (sunutils.py:79-83)."""
    pc2 = np.copy(pc)
    pc2[:, [0, 1, 2]] = pc2[:, [0, 2, 1]]
    pc2[:, 2] *= -1
    return pc2


def is_clockwise(p: np.ndarray) -> bool:
    """Signed-area orientation test of a 2D polygon (utils.py:214-217)."""
    x, y = p[:, 0], p[:, 1]
    return np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)) > 0
