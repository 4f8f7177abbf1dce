"""Smoke tests for the visualization module (renders to files)."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from votenet_tpu.utils import viz
from tests import oracles


class TestViz:
    def test_draw_lidar(self, tmp_path, rng):
        pc = rng.randn(500, 3)
        out = str(tmp_path / "cloud.png")
        viz.draw_lidar(pc, out_path=out)
        assert os.path.getsize(out) > 0

    def test_draw_gt_boxes3d(self, tmp_path, rng):
        boxes = oracles.random_boxes(rng, (3,))
        pc = rng.randn(200, 3)
        out = str(tmp_path / "boxes.png")
        viz.draw_gt_boxes3d(list(boxes), pc=pc, out_path=out)
        assert os.path.getsize(out) > 0

    def test_draw_projected_box3d_numpy_fallback(self, rng):
        img = np.zeros((64, 64, 3), np.uint8)
        qs = rng.uniform(5, 55, (8, 2))
        out = viz.draw_projected_box3d(img, qs, color=(255, 0, 0), thickness=1)
        assert out.sum() > 0  # some pixels drawn

    def test_visualize_interpolation(self, tmp_path, rng):
        dense = rng.randn(200, 3).astype(np.float32)
        sparse = rng.randn(40, 3).astype(np.float32)
        out = str(tmp_path / "interp.png")
        viz.visualize_interpolation(dense, sparse, out_path=out)
        assert os.path.getsize(out) > 0
