"""Miniature on-disk SUN RGB-D generator (reference file layout).

Writes a synthetic dataset in the exact directory/file format the real-data
readers consume (`<root>/<split>/{calib,depth,label_dimension}/%06d.txt`,
reference `sunutils.py:10-121` / `dataset.py:111-152`), so the COMPLETE
real-data pipeline — readers, calibration projections, frustum tests,
augmentation, cache build, training, periodic eval, resume — can be
exercised end-to-end without the dataset mounted (it is not in this
environment; see the runbook in README.md for the day it is).

Two generators:

- :func:`make_fake_sunrgbd` — the small fixed fixture the unit tests were
  built on (2 objects/scene, chair+table, 3000 points). Kept verbatim:
  the reject-mode parity oracles depend on its exact RNG call sequence.
- :func:`generate_mini_sunrgbd` — the rehearsal miniature: N scenes,
  full point counts, all 10 classes with per-class realistic mean sizes
  (TYPE_MEAN_SIZE), 1-5 objects per scene, 2D boxes computed from the
  actual image-plane projection of each object's points (so the
  reference's frustum support test behaves like it does on real data).

CLI:  python -m votenet_tpu.data.mini_fixture --root /tmp/mini --scenes 50 \
          --points 24000 --train_lo 5051 --val_lo 1
writes train scenes at ids [train_lo, train_lo+scenes) and scenes//4 val
scenes at [val_lo, ...) — matching the reference's convention that train
and val ids are disjoint ranges of the same "training" split (run.py:99,129).
"""

from __future__ import annotations

import os

import numpy as np

from votenet_tpu.data.geometry import TYPE_MEAN_SIZE, TYPE_WHITELIST, rotz


def _write_calib(root: str, split: str, idx: int, Rtilt: np.ndarray, K: np.ndarray) -> None:
    os.makedirs(os.path.join(root, split, "calib"), exist_ok=True)
    with open(os.path.join(root, split, "calib", "%06d.txt" % idx), "w") as f:
        # column-major flattening (reference sunutils.py:62-64)
        f.write(" ".join(str(v) for v in Rtilt.reshape(-1, order="F")) + "\n")
        f.write(" ".join(str(v) for v in K.reshape(-1, order="F")) + "\n")


def make_fake_sunrgbd(root, idxs, rng, n_points=3000):
    """Write calib/depth/label files for the given scene indices.

    The original unit-test fixture (moved here from tests/test_sunrgbd_io.py
    so the package owns it); behavior and RNG consumption order are frozen —
    the reject-mode parity oracle tests replay this exact sequence.
    """
    for sub in ("calib", "depth", "label_dimension", "image"):
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)

    for idx in idxs:
        # calib: Rtilt = identity, K = simple pinhole (column-major flattened)
        Rtilt = np.eye(3)
        K = np.array([[520.0, 0, 320.0], [0, 520.0, 240.0], [0, 0, 1.0]])
        _write_calib(root, "training", idx, Rtilt, K)

        # objects: a couple of boxes in upright depth coords (z up, y forward)
        objects = []
        for j in range(2):
            cx, cy, cz = rng.uniform(-1, 1), rng.uniform(2.5, 4.0), rng.uniform(0.2, 0.8)
            w, l, h = 0.4, 0.5, 0.45  # half-sizes (reference convention)
            heading = rng.uniform(-np.pi, np.pi)
            objects.append((cx, cy, cz, w, l, h, heading))

        # depth: cluster points inside each box + background so frustum tests pass
        pts = [rng.uniform([-3, 0.5, -1], [3, 6, 2], (n_points - 800 * len(objects), 3))]
        for (cx, cy, cz, w, l, h, heading) in objects:
            local = rng.uniform(-0.9, 0.9, (800, 3)) * [l, w, h]
            R = rotz(-heading)
            pts.append(local @ R.T + [cx, cy, cz])
        cloud = np.concatenate(pts)
        depth = np.concatenate([cloud, rng.rand(len(cloud), 3)], axis=1)  # + rgb
        np.savetxt(os.path.join(root, "training", "depth", "%06d.txt" % idx), depth, fmt="%.4f")

        # labels: 17 numbers after the classname (reference sunutils.py:10-34)
        lines = []
        classnames = ["chair", "table"]
        for cname, (cx, cy, cz, w, l, h, heading) in zip(classnames, objects):
            ori = [np.cos(-heading), -np.sin(-heading)]
            vals = [
                100, 100, 200, 150,  # 2D box x,y,w,h — generous (frustum test)
                cx, cy, cz,
                w, l, h,
                1, 0, 0, 1,  # basis (unused)
                ori[0], ori[1],
            ]
            lines.append(cname + " " + " ".join(f"{v:.6f}" for v in vals))
        with open(
            os.path.join(root, "training", "label_dimension", "%06d.txt" % idx), "w"
        ) as f:
            f.write("\n".join(lines) + "\n")


def generate_mini_sunrgbd(
    root: str,
    idxs,
    rng: np.random.RandomState,
    n_points: int = 24000,
    split: str = "training",
    max_objects: int = 5,
) -> None:
    """Write a realistic miniature: per-class mean sizes, projected 2D boxes.

    Per scene: 1..max_objects objects drawn from all 10 whitelist classes,
    each sized TYPE_MEAN_SIZE[class]/2 * U(0.8, 1.25) (label stores
    half-sizes, reference convention sunutils.py:212-243), positioned in a
    room-scale frustum in upright-depth coordinates (z up, y = depth away
    from camera). Each object contributes a surface-ish point cluster; the
    label's 2D box is the image-plane bounding box of that cluster padded by
    5 px, so the frustum support test (dataset.py:248-250,282) passes the
    way it does on real data. Background points fill the rest of the cloud.
    """
    Rtilt = np.eye(3)
    K = np.array([[520.0, 0, 320.0], [0, 520.0, 240.0], [0, 0, 1.0]])

    for sub in ("calib", "depth", "label_dimension"):
        os.makedirs(os.path.join(root, split, sub), exist_ok=True)

    for idx in idxs:
        _write_calib(root, split, idx, Rtilt, K)

        n_obj = rng.randint(1, max_objects + 1)
        classes = [TYPE_WHITELIST[rng.randint(len(TYPE_WHITELIST))] for _ in range(n_obj)]
        pts_per_obj = min(1500, (n_points // 2) // n_obj)

        clusters, lines = [], []
        for cname in classes:
            mean = TYPE_MEAN_SIZE[cname]  # full sizes (x, y, z extents-ish)
            scale = rng.uniform(0.8, 1.25)
            # label half-sizes (w, l, h): compute_box_3d doubles them
            w, l, h = (mean * scale / 2.0).tolist()
            cx = rng.uniform(-2.0, 2.0)
            cy = rng.uniform(2.0, 5.5)  # depth: in front of the camera
            cz = rng.uniform(-0.2, 0.6)
            heading = rng.uniform(-np.pi, np.pi)

            # surface-ish cluster: points on the box faces + interior sprinkle
            local = rng.uniform(-1.0, 1.0, (pts_per_obj, 3)) * [l, w, h]
            face = rng.randint(0, 3, pts_per_obj)
            sign = rng.randint(0, 2, pts_per_obj) * 2 - 1
            surf = local.copy()
            surf[np.arange(pts_per_obj), face] = (
                sign * np.array([l, w, h])[face]
            )
            mix = rng.rand(pts_per_obj) < 0.8  # 80% surface, 20% interior
            cluster = np.where(mix[:, None], surf, local)
            R = rotz(-heading)
            cluster = cluster @ R.T + [cx, cy, cz]
            clusters.append(cluster)

            # 2D box from the actual projection of this cluster (+5 px pad).
            # Image projection convention (sunutils.py:85-97 with Rtilt=I):
            # camera coords = [x, -z, y], then K; u,v = perspective divide.
            uv_full = np.stack([cluster[:, 0], -cluster[:, 2], cluster[:, 1]], axis=1) @ K.T
            u = uv_full[:, 0] / uv_full[:, 2]
            v = uv_full[:, 1] / uv_full[:, 2]
            xmin, xmax = u.min() - 5, u.max() + 5
            ymin, ymax = v.min() - 5, v.max() + 5

            ori = [np.cos(-heading), -np.sin(-heading)]
            vals = [
                xmin, ymin, xmax - xmin, ymax - ymin,
                cx, cy, cz,
                w, l, h,
                1, 0, 0, 1,
                ori[0], ori[1],
            ]
            lines.append(cname + " " + " ".join(f"{x:.6f}" for x in vals))

        n_bg = n_points - sum(len(c) for c in clusters)
        bg = rng.uniform([-3.5, 0.8, -1.0], [3.5, 6.5, 2.2], (n_bg, 3))
        cloud = np.concatenate(clusters + [bg])
        rng.shuffle(cloud)
        depth = np.concatenate([cloud, rng.rand(len(cloud), 3)], axis=1)
        np.savetxt(
            os.path.join(root, split, "depth", "%06d.txt" % idx), depth, fmt="%.4f"
        )
        with open(
            os.path.join(root, split, "label_dimension", "%06d.txt" % idx), "w"
        ) as f:
            f.write("\n".join(lines) + "\n")


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--root", required=True)
    p.add_argument("--scenes", type=int, default=50)
    p.add_argument("--val_scenes", type=int, default=None,
                   help="default: scenes // 4")
    p.add_argument("--points", type=int, default=24000)
    p.add_argument("--train_lo", type=int, default=5051,
                   help="first train scene id (reference train ids start at 5051)")
    p.add_argument("--val_lo", type=int, default=1,
                   help="first val scene id (reference val ids start at 1)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    n_val = args.scenes // 4 if args.val_scenes is None else args.val_scenes
    rng = np.random.RandomState(args.seed)
    train_ids = list(range(args.train_lo, args.train_lo + args.scenes))
    val_ids = list(range(args.val_lo, args.val_lo + n_val))
    generate_mini_sunrgbd(args.root, train_ids, rng, n_points=args.points)
    generate_mini_sunrgbd(args.root, val_ids, rng, n_points=args.points)
    print(
        f"wrote {len(train_ids)} train ids [{train_ids[0]}..{train_ids[-1]}] + "
        f"{len(val_ids)} val ids [{val_ids[0]}..{val_ids[-1]}] under {args.root} "
        f"({args.points} pts/scene)"
    )
    print(
        "train with:\n  python run_train.py "
        f"--data_root={args.root} --cache_dir=<cache> "
        f"--train_idx_range={train_ids[0]},{train_ids[-1] + 1} "
        f"--val_idx_range={val_ids[0]},{val_ids[-1] + 1}"
    )


if __name__ == "__main__":
    main()
