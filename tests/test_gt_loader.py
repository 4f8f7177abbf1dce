"""Tests for the frustum-pointnets GT dump loader (eval/gt_loader)."""

import numpy as np

from votenet_tpu.eval.gt_loader import box_conversion, get_gt_cls, load_gt_all, wrapper


def _dump_row(cx, cz, half_l, half_w, zmin, zmax, clockwise):
    """Build a 10-float dump row: 4 (x,y) top-face corners + zmin + zmax in
    upright depth coords (z up)."""
    corners = np.array(
        [[-half_l, -half_w], [half_l, -half_w], [half_l, half_w], [-half_l, half_w]]
    )
    if clockwise:
        corners = corners[::-1]
    corners = corners + [cx, cz]
    return np.concatenate([corners.reshape(-1), [zmin, zmax]])


class TestBoxConversion:
    def test_winding_normalized(self):
        row_ccw = _dump_row(1.0, 2.0, 0.5, 0.4, 0.0, 1.0, clockwise=False)
        row_cw = _dump_row(1.0, 2.0, 0.5, 0.4, 0.0, 1.0, clockwise=True)
        b1 = box_conversion(row_ccw)
        b2 = box_conversion(row_cw)
        # same vertex set after normalization
        assert set(map(tuple, np.round(b1[:4, :2], 6))) == set(
            map(tuple, np.round(b2[:4, :2], 6))
        )
        np.testing.assert_allclose(b1[0:4, 2], 1.0)  # zmax on first face
        np.testing.assert_allclose(b1[4:, 2], 0.0)

    def test_wrapper_top_face_first(self):
        row = _dump_row(0.0, 3.0, 0.5, 0.5, 0.2, 1.4, clockwise=False)
        b = wrapper(row)
        # upright camera coords: y is up-negated depth-z; top face rows 0-3
        assert (b[0:4, 1] > b[4:, 1]).all()


class TestGTLoading:
    def test_roundtrip_files(self, tmp_path):
        rows = np.stack(
            [_dump_row(0, 2, 0.5, 0.4, 0, 1, False), _dump_row(1, 3, 0.3, 0.3, 0, 2, True)]
        )
        np.savetxt(tmp_path / "chair_gt_boxes.dat", rows)
        np.savetxt(tmp_path / "chair_gt_imgids.txt", np.array([7.0, 7.0]))
        gt = get_gt_cls(str(tmp_path), "chair")
        assert list(gt.keys()) == [7.0]
        assert len(gt[7.0]) == 2
        assert gt[7.0][0].shape == (8, 3)

    def test_load_gt_all(self, tmp_path):
        row = _dump_row(0, 2, 0.5, 0.4, 0, 1, False)
        np.savetxt(tmp_path / "bed_gt_boxes.dat", row[None])
        np.savetxt(tmp_path / "bed_gt_imgids.txt", np.array([3.0]))
        np.savetxt(tmp_path / "sofa_gt_boxes.dat", row[None])
        np.savetxt(tmp_path / "sofa_gt_imgids.txt", np.array([3.0]))
        gt_all = load_gt_all(str(tmp_path), ["bed", "sofa"])
        assert len(gt_all[3.0]) == 2
        assert {c for c, _ in gt_all[3.0]} == {"bed", "sofa"}
