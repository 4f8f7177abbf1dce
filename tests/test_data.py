"""Tests for codecs, geometry, synthetic data, and batching."""

import numpy as np
import pytest

from votenet_tpu.config import Config
from votenet_tpu.data.geometry import (
    angle2class,
    class2angle,
    class2size,
    size2class,
    CLASS2TYPE,
    TYPE_MEAN_SIZE,
    box_corners_votenet,
    get_3d_box,
    roty,
)
from votenet_tpu.data.dataflow import batch_scenes, pad_gt_to_static
from votenet_tpu.data.synthetic import synthetic_scenes


class TestCodecs:
    def test_angle_roundtrip(self, rng):
        """The dataset.py:321-349 round-trip check, as a real assertion."""
        for _ in range(100):
            angle = rng.uniform(0, 2 * np.pi)
            cls, res = angle2class(angle, 12)
            rec = class2angle(cls, res, 12) % (2 * np.pi)
            np.testing.assert_allclose(rec, angle % (2 * np.pi), atol=1e-9)

    def test_angle_residual_bounds(self, rng):
        for _ in range(100):
            _, res = angle2class(rng.uniform(0, 2 * np.pi), 12)
            assert abs(res) <= np.pi / 12 + 1e-9

    def test_size_roundtrip(self, rng):
        for cls_id, name in CLASS2TYPE.items():
            size = TYPE_MEAN_SIZE[name] * rng.uniform(0.8, 1.2, 3)
            c, r = size2class(size, name)
            assert c == cls_id
            np.testing.assert_allclose(class2size(c, r), size)


class TestCorners:
    def test_get_3d_box_matches_batched(self, rng):
        size = rng.uniform(0.5, 2, 3)
        heading = rng.uniform(0, 2 * np.pi)
        center = rng.randn(3)
        a = get_3d_box(size, heading, center)
        b = box_corners_votenet(size, heading, center)
        np.testing.assert_allclose(a, b, atol=1e-12)

    def test_top_face_above_bottom(self, rng):
        c = box_corners_votenet(rng.uniform(0.5, 2, (5, 3)), rng.rand(5), rng.randn(5, 3))
        assert (c[:, 0, 1] > c[:, 4, 1]).all()

    def test_center_recovery(self, rng):
        """(corner0 + corner6)/2 == center (the dataset's center convention,
        dataset.py:260)."""
        center = rng.randn(3)
        c = box_corners_votenet(rng.uniform(0.5, 2, 3), rng.rand(), center)
        np.testing.assert_allclose((c[0] + c[6]) / 2, center, atol=1e-12)

    def test_roty_orthonormal(self):
        R = roty(0.7)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


class TestSynthetic:
    def test_deterministic(self):
        cfg = Config(point_num=256, max_gt_boxes=8)
        a = synthetic_scenes(7, cfg, 3)
        b = synthetic_scenes(7, cfg, 3)
        for s1, s2 in zip(a, b):
            np.testing.assert_array_equal(s1["points"], s2["points"])

    def test_schema(self):
        cfg = Config(point_num=256, max_gt_boxes=8)
        s = synthetic_scenes(0, cfg, 1)[0]
        n = s["bboxes_xyz"].shape[0]
        assert s["points"].shape == (256, 3)
        assert s["bboxes_lwh"].shape == (n, 3)
        assert s["heading_labels"].dtype == np.int32
        assert (s["heading_labels"] >= 0).all() and (s["heading_labels"] < 12).all()
        assert (np.abs(s["heading_residuals"]) <= 1.0 + 1e-6).all()


class TestBatching:
    def test_pad_gt_edge_replicates(self):
        cfg = Config(point_num=64, max_gt_boxes=6)
        s = synthetic_scenes(1, cfg, 1)[0]
        n = s["bboxes_xyz"].shape[0]
        padded = pad_gt_to_static(s, 6)
        assert padded["bboxes_xyz"].shape == (6, 3)
        assert padded["gt_count"] == n
        for j in range(n, 6):  # padded slots replicate the last real box
            np.testing.assert_array_equal(padded["bboxes_xyz"][j], s["bboxes_xyz"][n - 1])

    def test_batch_shapes_static(self):
        cfg = Config(point_num=64, max_gt_boxes=6)
        scenes = synthetic_scenes(2, cfg, 5)
        batches = list(batch_scenes(iter(scenes), batch_size=2, max_gt=6))
        assert len(batches) == 2  # drop_remainder
        for b in batches:
            assert b["points"].shape == (2, 64, 3)
            assert b["bboxes_xyz"].shape == (2, 6, 3)
            assert b["gt_count"].shape == (2,)

    def test_batch_keep_remainder(self):
        cfg = Config(point_num=64, max_gt_boxes=6)
        scenes = synthetic_scenes(2, cfg, 5)
        batches = list(
            batch_scenes(iter(scenes), batch_size=2, max_gt=6, drop_remainder=False)
        )
        assert len(batches) == 3
        last = batches[-1]
        np.testing.assert_array_equal(last["points"][0], last["points"][1])  # repeated


class TestGTOverflow:
    def test_overflow_raises_by_default(self):
        from votenet_tpu.data.dataflow import GTOverflowError

        cfg = Config(point_num=64, max_gt_boxes=8)
        s = synthetic_scenes(3, cfg, 1)[0]
        n = s["bboxes_xyz"].shape[0]
        with pytest.raises(GTOverflowError):
            pad_gt_to_static(s, n - 1)

    def test_overflow_truncate_optin_warns(self):
        cfg = Config(point_num=64, max_gt_boxes=8)
        s = synthetic_scenes(3, cfg, 1)[0]
        n = s["bboxes_xyz"].shape[0]
        with pytest.warns(UserWarning, match="GT boxes exceed"):
            out = pad_gt_to_static(s, n - 1, on_overflow="truncate")
        assert out["bboxes_xyz"].shape == (n - 1, 3)
        assert out["gt_count"] == n - 1

    def test_scan_gt_counts(self):
        from votenet_tpu.data.dataflow import scan_gt_counts

        cfg = Config(point_num=64, max_gt_boxes=8)
        scenes = synthetic_scenes(2, cfg, 6)
        report = scan_gt_counts(iter(scenes))
        counts = [s["bboxes_xyz"].shape[0] for s in scenes]
        assert report["n_scenes"] == 6
        assert report["max"] == max(counts)
        assert sum(report["histogram"].values()) == 6
        assert report["p50"] <= report["p95"] <= report["p99"] <= report["max"]

    def test_scan_gt_counts_empty(self):
        from votenet_tpu.data.dataflow import scan_gt_counts

        assert scan_gt_counts(iter([]))["n_scenes"] == 0
