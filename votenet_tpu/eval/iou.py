"""Host-side exact oriented 3D IoU.

Drop-in equivalent of the reference's shapely-based ``iou_3d``
(evaluator.py:26-39) without the shapely dependency: the top-face x/z quad
intersection is computed with a Sutherland–Hodgman convex clip. The device
path (:mod:`votenet_tpu.ops.iou3d`) computes the same quantity with a
different algorithm (masked angular-sort shoelace); the two cross-validate
each other in tests.
"""

from __future__ import annotations

import numpy as np


def _signed_area(xy: np.ndarray) -> float:
    x, y = xy[:, 0], xy[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def convex_clip_area(subject: np.ndarray, clip: np.ndarray) -> float:
    """|area| of the intersection of two convex polygons ((K,2) arrays)."""
    if _signed_area(clip) < 0:
        clip = clip[::-1]
    out = [p for p in subject.astype(np.float64)]
    for i in range(len(clip)):
        if not out:
            return 0.0
        a = clip[i]
        b = clip[(i + 1) % len(clip)]
        e = b - a
        inp, out = out, []
        for j in range(len(inp)):
            p, q = inp[j], inp[(j + 1) % len(inp)]
            pin = e[0] * (p[1] - a[1]) - e[1] * (p[0] - a[0]) >= 0
            qin = e[0] * (q[1] - a[1]) - e[1] * (q[0] - a[0]) >= 0
            if pin:
                out.append(p)
            if pin != qin:
                d = q - p
                denom = e[0] * d[1] - e[1] * d[0]
                if denom != 0:
                    t = (e[0] * (a[1] - p[1]) - e[1] * (a[0] - p[0])) / denom
                    out.append(p + t * d)
    if len(out) < 3:
        return 0.0
    return abs(_signed_area(np.asarray(out)))


def iou_3d(bbox1: np.ndarray, bbox2: np.ndarray) -> float:
    """3D IoU of two (8,3) corner boxes (reference evaluator.py:26-39).

    Requires corner layout top face = corners 0-3 (the reference asserts
    ``bbox[0,1] > bbox[4,1]``, evaluator.py:33).
    """
    assert bbox1[0, 1] > bbox1[4, 1] and bbox2[0, 1] > bbox2[4, 1]
    poly1 = np.stack([bbox1[:4, 0], bbox1[:4, 2]], -1)
    poly2 = np.stack([bbox2[:4, 0], bbox2[:4, 2]], -1)
    a1 = abs(_signed_area(poly1))
    a2 = abs(_signed_area(poly2))
    inter_area = convex_clip_area(poly1, poly2)
    y_overlap = max(0.0, min(bbox1[0, 1], bbox2[0, 1]) - max(bbox1[4, 1], bbox2[4, 1]))
    inter_vol = inter_area * y_overlap
    union = (
        a1 * (bbox1[0, 1] - bbox1[4, 1]) + a2 * (bbox2[0, 1] - bbox2[4, 1]) - inter_vol
    )
    return inter_vol / union if union > 0 else 0.0
