"""Data subsystem: geometry, codecs, SUN RGB-D IO, augmentation, batching."""

from votenet_tpu.data.geometry import (
    rotx,
    roty,
    rotz,
    get_3d_box,
    box_corners_votenet,
    angle2class,
    class2angle,
    size2class,
    class2size,
    in_hull,
    extract_pc_in_box3d,
    TYPE2CLASS,
    CLASS2TYPE,
    TYPE_MEAN_SIZE,
    CLASS_MEAN_SIZE,
    TYPE_WHITELIST,
)

__all__ = [
    "rotx", "roty", "rotz", "get_3d_box", "box_corners_votenet",
    "angle2class", "class2angle", "size2class", "class2size",
    "in_hull", "extract_pc_in_box3d",
    "TYPE2CLASS", "CLASS2TYPE", "TYPE_MEAN_SIZE", "CLASS_MEAN_SIZE",
    "TYPE_WHITELIST",
]
