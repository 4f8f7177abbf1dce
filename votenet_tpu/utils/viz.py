"""Point-cloud / box visualization (debug only; never in the train path).

Rebuilds the reference viz layer (viz_utils.py:13-137 draw_lidar/
draw_gt_boxes3d, sunutils.py:267-290 draw_projected_box3d,
tf_ops/3d_interpolation/visu_interpolation.py) on matplotlib instead of
mayavi (not available here), rendering to image files rather than
interactive windows. All imports are lazy so the module never makes viz a
hard dependency of the data path (the reference's dataset.py hard-imports
mayavi at module scope — an anti-pattern SURVEY §2 flags).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

_BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),  # top face
    (4, 5), (5, 6), (6, 7), (7, 4),  # bottom face
    (0, 4), (1, 5), (2, 6), (3, 7),  # verticals
]


def _ax3d():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 8))
    return fig, fig.add_subplot(111, projection="3d")


def draw_lidar(
    pc: np.ndarray,
    color: Optional[np.ndarray] = None,
    out_path: Optional[str] = None,
    boxes3d: Optional[Sequence[np.ndarray]] = None,
    max_points: int = 20000,
):
    """Scatter a point cloud (+ optional boxes); save to ``out_path``.

    Equivalent of viz_utils.py:35-92 (mayavi draw_lidar), with the axis
    triad and optional intensity coloring.
    """
    fig, ax = _ax3d()
    if pc.shape[0] > max_points:
        sel = np.random.RandomState(0).choice(pc.shape[0], max_points, replace=False)
        pc = pc[sel]
        color = color[sel] if color is not None else None
    c = color if color is not None else pc[:, 2]
    ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], c=c, s=0.3, cmap="viridis")
    if boxes3d is not None:
        _draw_boxes(ax, boxes3d, color="r")
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    if out_path:
        fig.savefig(out_path, dpi=120)
        import matplotlib.pyplot as plt

        plt.close(fig)
    return fig


def draw_lidar_simple(pc: np.ndarray, out_path: Optional[str] = None):
    """Minimal z-colored scatter (viz_utils.py:13-32)."""
    return draw_lidar(pc, out_path=out_path)


def _draw_boxes(ax, boxes: Sequence[np.ndarray], color="r"):
    for corners in boxes:
        for i, j in _BOX_EDGES:
            ax.plot(
                [corners[i, 0], corners[j, 0]],
                [corners[i, 1], corners[j, 1]],
                [corners[i, 2], corners[j, 2]],
                c=color, linewidth=1.0,
            )


def draw_gt_boxes3d(
    gt_boxes3d: Sequence[np.ndarray],
    pc: Optional[np.ndarray] = None,
    out_path: Optional[str] = None,
    color="r",
):
    """Wireframe 3D boxes, optionally over a cloud (viz_utils.py:95-137)."""
    fig, ax = _ax3d()
    if pc is not None:
        ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], c=pc[:, 2], s=0.3, cmap="viridis")
    _draw_boxes(ax, gt_boxes3d, color=color)
    if out_path:
        fig.savefig(out_path, dpi=120)
        import matplotlib.pyplot as plt

        plt.close(fig)
    return fig


def draw_projected_box3d(image: np.ndarray, qs: np.ndarray, color=(255, 255, 255), thickness: int = 2):
    """Draw a projected 3D box onto an image array (sunutils.py:267-290).

    qs: (8, 2) projected corner pixels, reference corner order. Uses cv2
    when available, else a simple numpy line rasterizer.
    """
    qs = qs.astype(np.int32)
    try:
        import cv2

        for k in range(4):
            for (i, j) in ((k, (k + 1) % 4), (k + 4, (k + 1) % 4 + 4), (k, k + 4)):
                cv2.line(image, tuple(qs[i]), tuple(qs[j]), color, thickness, cv2.LINE_AA)
        return image
    except ImportError:
        for k in range(4):
            for (i, j) in ((k, (k + 1) % 4), (k + 4, (k + 1) % 4 + 4), (k, k + 4)):
                _draw_line(image, qs[i], qs[j], color)
        return image


def _draw_line(img: np.ndarray, p0, p1, color):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    xs = np.linspace(p0[0], p1[0], n + 1).astype(int)
    ys = np.linspace(p0[1], p1[1], n + 1).astype(int)
    ok = (ys >= 0) & (ys < img.shape[0]) & (xs >= 0) & (xs < img.shape[1])
    img[ys[ok], xs[ok]] = color


def visualize_interpolation(xyz1: np.ndarray, xyz2: np.ndarray, out_path: Optional[str] = None):
    """3-NN interpolation weight visualization — the role of the reference's
    visu_interpolation.py: colors each dense point by its interpolated value
    from a sparse cloud carrying a scalar field."""
    from votenet_tpu.ops import three_nn, three_interpolate
    import jax.numpy as jnp

    field = np.linalg.norm(xyz2, axis=-1, keepdims=True).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(xyz1[None]), jnp.asarray(xyz2[None]))
    dist = jnp.maximum(dist, 1e-10)
    w = (1.0 / dist) / jnp.sum(1.0 / dist, axis=2, keepdims=True)
    interp = np.asarray(three_interpolate(jnp.asarray(field[None]), idx, w))[0, :, 0]
    return draw_lidar(xyz1, color=interp, out_path=out_path)
