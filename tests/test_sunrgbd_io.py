"""Tests of the real-data path against a generated mini SUN RGB-D tree.

Builds an on-disk dataset in the reference layout
(<root>/training/{calib,depth,label_dimension}/%06d.txt, sunutils.py /
dataset.py conventions) and runs the full loader + scene-processing +
caching pipeline over it.
"""

import os

import numpy as np
import pytest

from votenet_tpu.config import Config
from votenet_tpu.data.dataflow import SunRGBDDataFlow, process_scene
from votenet_tpu.data.geometry import TYPE2CLASS, roty
from votenet_tpu.data.sunrgbd import (
    SUNRGBDCalibration,
    SunRGBDObjectDataset,
    load_depth_points,
    read_sunrgbd_label,
)


# the fixture generator lives in the package now (it also powers the
# miniature real-path rehearsal, see votenet_tpu/data/mini_fixture.py);
# re-exported here because every test class below uses it
from votenet_tpu.data.mini_fixture import make_fake_sunrgbd  # noqa: E402


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sunrgbd"))
    rng = np.random.RandomState(0)
    make_fake_sunrgbd(root, [1, 2, 3], rng)
    return root


def small_cfg():
    return Config(point_num=1024, max_gt_boxes=8)


class TestReaders:
    def test_label_parse(self, fake_root):
        objs = read_sunrgbd_label(
            os.path.join(fake_root, "training", "label_dimension", "000001.txt")
        )
        assert len(objs) == 2
        assert objs[0].classname == "chair"
        assert np.isfinite(objs[0].heading_angle)
        # heading round-trips through the orientation encoding
        assert objs[0].box2d.shape == (4,)

    def test_depth_load(self, fake_root):
        d = load_depth_points(
            os.path.join(fake_root, "training", "depth", "000001.txt")
        )
        assert d.shape[1] == 6
        assert d.shape[0] >= 1024

    def test_calibration_projections(self, fake_root):
        calib = SUNRGBDCalibration(
            os.path.join(fake_root, "training", "calib", "000001.txt")
        )
        pts = np.array([[0.5, 3.0, 0.5], [-0.5, 4.0, 0.2]])
        uv, depth = calib.project_upright_depth_to_image(pts)
        assert uv.shape == (2, 2)
        assert (depth > 0).all()
        # upright depth -> upright camera is the axis flip; invertible
        cam = calib.project_upright_depth_to_upright_camera(pts)
        back = calib.project_upright_camera_to_upright_depth(cam)
        np.testing.assert_allclose(back, pts, atol=1e-12)


class TestProcessScene:
    def test_schema_and_targets(self, fake_root):
        cfg = small_cfg()
        ds = SunRGBDObjectDataset(fake_root, "training", [1])
        scene = process_scene(ds, 1, np.random.RandomState(0), training=False, config=cfg)
        assert scene is not None
        assert scene["points"].shape == (cfg.point_num, 3)
        n = scene["bboxes_xyz"].shape[0]
        assert 1 <= n <= 2
        assert scene["semantic_labels"].dtype == np.int32
        assert set(scene["semantic_labels"]).issubset(
            {TYPE2CLASS["chair"], TYPE2CLASS["table"]}
        )
        assert (np.abs(scene["heading_residuals"]) <= 1.0 + 1e-6).all()
        # size: full extents = 2 * half-sizes * (no aug) ~ [1.0, 0.8, 0.9]
        assert (scene["bboxes_lwh"] > 0.5).all() and (scene["bboxes_lwh"] < 1.5).all()

    def test_training_augmentation_changes_scene(self, fake_root):
        cfg = small_cfg()
        ds = SunRGBDObjectDataset(fake_root, "training", [1])
        a = process_scene(ds, 1, np.random.RandomState(1), training=True, config=cfg)
        b = process_scene(ds, 1, np.random.RandomState(2), training=True, config=cfg)
        assert a is not None and b is not None
        assert not np.allclose(a["points"], b["points"])


class TestDataFlow:
    def test_iteration_and_cache(self, fake_root, tmp_path):
        cfg = small_cfg()
        cache = str(tmp_path / "cache")
        flow = SunRGBDDataFlow(
            fake_root, "training", training=False, config=cfg,
            idx_list=[1, 2, 3], cache_dir=cache, seed=0,
        )
        scenes1 = list(flow)
        assert len(scenes1) == 3
        assert len(os.listdir(cache)) == 3  # one cache file per scene
        scenes2 = list(flow)  # second pass reads the cache
        np.testing.assert_array_equal(scenes1[0]["points"], scenes2[0]["points"])

    def test_train_flow_shuffles_and_augments(self, fake_root, tmp_path):
        cfg = small_cfg()
        flow = SunRGBDDataFlow(
            fake_root, "training", training=True, config=cfg,
            idx_list=[1, 2, 3], cache_dir=str(tmp_path / "c2"), seed=0,
        )
        scenes = list(flow)
        assert len(scenes) == 3


class TestSmallHelpers:
    def test_rigid_transform_roundtrip(self, rng=np.random.RandomState(0)):
        from votenet_tpu.data.geometry import roty
        from votenet_tpu.data.sunrgbd import inverse_rigid_trans, transform_from_rot_trans

        R = roty(0.4)
        t = rng.randn(3)
        T = transform_from_rot_trans(R, t)  # (4,4)
        inv = inverse_rigid_trans(T[:3, :])  # (3,4)
        p = rng.randn(3)
        q = T[:3, :3] @ p + T[:3, 3]
        back = inv[:, :3] @ q + inv[:, 3]
        np.testing.assert_allclose(back, p, atol=1e-12)

    def test_random_shift_box2d_bounds(self):
        from votenet_tpu.data.sunrgbd import random_shift_box2d

        rng = np.random.RandomState(0)
        box = np.array([10.0, 20.0, 110.0, 80.0])
        for _ in range(20):
            out = random_shift_box2d(box, 0.1, rng)
            assert out[2] > out[0] and out[3] > out[1]
            # center moves at most 10% of extent
            assert abs((out[0] + out[2]) / 2 - 60) <= 10 + 1e-9
            assert abs((out[1] + out[3]) / 2 - 50) <= 6 + 1e-9

    def test_zipped_pickle_roundtrip(self, tmp_path):
        from votenet_tpu.data.sunrgbd import load_zipped_pickle, save_zipped_pickle

        obj = {"a": np.arange(5), "b": "hello"}
        p = str(tmp_path / "x.pkl.gz")
        save_zipped_pickle(obj, p)
        back = load_zipped_pickle(p)
        np.testing.assert_array_equal(back["a"], obj["a"])
        assert back["b"] == "hello"

    def test_compute_orientation_3d(self, fake_root):
        from votenet_tpu.data.sunrgbd import (
            SunRGBDObjectDataset, compute_orientation_3d,
        )

        ds = SunRGBDObjectDataset(fake_root, "training", [1])
        obj = ds.get_label_objects(1)[0]
        o2d, o3d = compute_orientation_3d(obj, ds.get_calibration(1))
        assert o2d.shape == (2, 2)
        assert o3d.shape == (2, 3)
        np.testing.assert_allclose(o3d[0], obj.centroid)


def make_ghost_scene_root(tmp_path_factory):
    """One scene with (a) a chair that has a real point cluster and (b) a
    'ghost' table whose 2D box covers the whole image but whose 3D box sits
    outside the point region: >=5 frustum points, 0 in-box points. The
    reference's rejection criterion (dataset.py:282, len over the frustum
    mask) KEEPS the ghost; the corrected in-box criterion rejects it."""
    root = str(tmp_path_factory.mktemp("sunrgbd_ghost"))
    rng = np.random.RandomState(7)
    for sub in ("calib", "depth", "label_dimension", "image"):
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)

    Rtilt = np.eye(3)
    K = np.array([[520.0, 0, 320.0], [0, 520.0, 240.0], [0, 0, 1.0]])
    with open(os.path.join(root, "training", "calib", "000001.txt"), "w") as f:
        f.write(" ".join(str(v) for v in Rtilt.reshape(-1, order="F")) + "\n")
        f.write(" ".join(str(v) for v in K.reshape(-1, order="F")) + "\n")

    # chair: cluster of 800 points at its center
    chair = (0.5, 3.0, 0.5, 0.4, 0.5, 0.45, 0.3)  # cx cy cz w l h heading
    from votenet_tpu.data.geometry import rotz

    cx, cy, cz, w, l, h, heading = chair
    local = rng.uniform(-0.9, 0.9, (800, 3)) * [l, w, h]
    cluster = local @ rotz(-heading).T + [cx, cy, cz]
    background = rng.uniform([-3, 0.5, -1], [3, 6, 2], (2200, 3))
    cloud = np.concatenate([background, cluster])
    depth = np.concatenate([cloud, rng.rand(len(cloud), 3)], axis=1)
    np.savetxt(os.path.join(root, "training", "depth", "000001.txt"), depth, fmt="%.4f")

    # ghost table: 3D center at y=8 (beyond every point), 2D box = everything
    ghost = (0.0, 8.0, 0.5, 0.3, 0.3, 0.3, 0.0)
    lines = []
    for cname, (cx, cy, cz, w, l, h, heading), box2d in (
        # both 2D boxes cover the whole image: the modes differ only in the
        # 3D-box point count (chair cluster inside vs ghost box empty)
        ("chair", chair, (-1e4, -1e4, 2e4, 2e4)),
        ("table", ghost, (-1e4, -1e4, 2e4, 2e4)),
    ):
        ori = [np.cos(-heading), -np.sin(-heading)]
        vals = list(box2d) + [cx, cy, cz, w, l, h, 1, 0, 0, 1, ori[0], ori[1]]
        lines.append(cname + " " + " ".join(f"{v:.6f}" for v in vals))
    with open(
        os.path.join(root, "training", "label_dimension", "000001.txt"), "w"
    ) as f:
        f.write("\n".join(lines) + "\n")
    return root


def reference_kept_semantics(ds, idx, cfg, seed=0):
    """Direct numpy port of the reference object loop (dataset.py:241-299,
    training=False) returning the semantic classes of kept boxes — the
    parity oracle for process_scene's rejection behavior."""
    from votenet_tpu.data.geometry import TYPE_WHITELIST, extract_pc_in_box3d
    from votenet_tpu.data.sunrgbd import compute_box_3d

    objects = ds.get_label_objects(idx)
    calib = ds.get_calibration(idx)
    pc_upright_depth = ds.get_depth(idx)
    rng = np.random.RandomState(seed)
    choice = rng.choice(pc_upright_depth.shape[0], cfg.point_num, replace=False)
    pc_upright_depth = pc_upright_depth[choice, :]
    pc_upright_camera = np.zeros_like(pc_upright_depth)
    pc_upright_camera[:, :3] = calib.project_upright_depth_to_upright_camera(
        pc_upright_depth[:, :3]
    )
    pc_image_coord, _ = calib.project_upright_depth_to_image(pc_upright_depth)
    kept = []
    for obj in objects:
        if obj.classname not in TYPE_WHITELIST:
            continue
        xmin, ymin, xmax, ymax = obj.box2d
        box_fov_inds = (
            (pc_image_coord[:, 0] < xmax)
            & (pc_image_coord[:, 0] >= xmin)
            & (pc_image_coord[:, 1] < ymax)
            & (pc_image_coord[:, 1] >= ymin)
        )
        pc_in_box_fov = pc_upright_camera[box_fov_inds, :]
        _, box3d_pts_3d = compute_box_3d(obj, calib)
        box3d_pts_3d = calib.project_upright_depth_to_upright_camera(box3d_pts_3d)
        if np.max(box3d_pts_3d[:, 1]) - np.min(box3d_pts_3d[:, 1]) < 1e-7:
            continue
        _, inds = extract_pc_in_box3d(pc_in_box_fov, box3d_pts_3d)
        if len(inds) < 5:  # the reference's literal criterion (dataset.py:282)
            continue
        kept.append(TYPE2CLASS[obj.classname])
    return kept


class TestRejectModeParity:
    @pytest.fixture(scope="class")
    def ghost_root(self, tmp_path_factory):
        return make_ghost_scene_root(tmp_path_factory)

    def test_frustum_mode_matches_reference_port(self, fake_root, ghost_root):
        cfg = Config(point_num=1024, max_gt_boxes=8, reject_mode="frustum")
        for root, idxs in ((fake_root, [1, 2, 3]), (ghost_root, [1])):
            ds = SunRGBDObjectDataset(root, "training", idxs)
            for idx in idxs:
                want = reference_kept_semantics(ds, idx, cfg, seed=0)
                scene = process_scene(
                    ds, idx, np.random.RandomState(0), training=False, config=cfg
                )
                got = [] if scene is None else list(scene["semantic_labels"])
                assert got == want, f"scene {idx}: kept-box sets differ"

    def test_ghost_box_kept_by_frustum_rejected_by_in_box(self, ghost_root):
        ds = SunRGBDObjectDataset(ghost_root, "training", [1])
        frustum = process_scene(
            ds, 1, np.random.RandomState(0), training=False,
            config=Config(point_num=1024, reject_mode="frustum"),
        )
        in_box = process_scene(
            ds, 1, np.random.RandomState(0), training=False,
            config=Config(point_num=1024, reject_mode="in_box"),
        )
        assert sorted(frustum["semantic_labels"]) == sorted(
            [TYPE2CLASS["chair"], TYPE2CLASS["table"]]
        )
        assert list(in_box["semantic_labels"]) == [TYPE2CLASS["chair"]]


class TestLoudEdgeCases:
    def test_too_few_points_warns_and_skips(self, fake_root):
        cfg = Config(point_num=100000)  # fixture scenes have ~3000 points
        ds = SunRGBDObjectDataset(fake_root, "training", [1])
        with pytest.warns(UserWarning, match="point_num"):
            scene = process_scene(
                ds, 1, np.random.RandomState(0), training=False, config=cfg
            )
        assert scene is None

    def test_gt_overflow_raises_then_truncate_warns(self):
        from votenet_tpu.data.dataflow import (
            GTOverflowError,
            SCENE_KEYS,
            pad_gt_to_static,
        )

        rng = np.random.RandomState(0)
        scene = {"data_idx": np.int32(42), "points": rng.randn(16, 3)}
        n = 6
        for k in SCENE_KEYS:
            scene[k] = rng.randn(n, 3) if k.endswith(("xyz", "lwh", "residuals")) else rng.randn(n)
        scene["size_residuals"] = rng.randn(n, 3)
        # default: loud failure — silent GT loss changes training targets
        with pytest.raises(GTOverflowError, match="max_gt_boxes"):
            pad_gt_to_static(scene, 4)
        # explicit opt-in: warn and truncate
        with pytest.warns(UserWarning, match="max_gt_boxes"):
            out = pad_gt_to_static(scene, 4, on_overflow="truncate")
        assert out["gt_count"] == 4
        assert out["bboxes_xyz"].shape[0] == 4


class TestCacheConfigKey:
    def test_reject_mode_changes_cache_key(self, fake_root, tmp_path):
        """Flipping a processing knob must NOT replay stale cache pickles."""
        cache = str(tmp_path / "cache_key")
        for mode in ("frustum", "in_box"):
            cfg = Config(point_num=100000, reject_mode=mode)
            flow = SunRGBDDataFlow(
                fake_root, "training", training=False, config=cfg,
                idx_list=[1], cache_dir=cache, seed=0,
            )
            list(flow)
        files = os.listdir(cache)
        assert len(files) == 2  # one cache entry per reject_mode
        assert any("frustum" in f for f in files)
        assert any("in_box" in f for f in files)
