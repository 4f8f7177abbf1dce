"""Input-pipeline throughput benchmark (the reference's commented-out
TestDataSpeed, run.py:100).

Measures synthetic-scene generation + fixed-shape batching rate, and — when
a SUN RGB-D tree is present — the real loader path (label parse, depth
parse via the native float parser, projection, augmentation).

  python benchmarks/data_speed.py [--data_root=/data/mysunrgbd]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", default="/data/mysunrgbd")
    parser.add_argument("--scenes", type=int, default=32)
    args = parser.parse_args()

    from votenet_tpu.config import default_config
    from votenet_tpu.data.dataflow import batch_scenes
    from votenet_tpu.data.synthetic import synthetic_scenes

    cfg = default_config()

    t0 = time.perf_counter()
    scenes = synthetic_scenes(0, cfg, args.scenes)
    dt = time.perf_counter() - t0
    print(f"synthetic generation: {args.scenes / dt:.1f} scenes/s")

    t0 = time.perf_counter()
    batches = list(batch_scenes(iter(scenes), cfg.batch_size, cfg.max_gt_boxes))
    dt = time.perf_counter() - t0
    print(f"batching: {len(batches) * cfg.batch_size / max(dt, 1e-9):.1f} scenes/s")

    if os.path.isdir(args.data_root):
        from votenet_tpu.data.dataflow import SunRGBDDataFlow

        flow = SunRGBDDataFlow(
            args.data_root, "training", training=True, config=cfg,
            idx_list=list(range(5051, 5051 + args.scenes)),
        )
        t0 = time.perf_counter()
        n = sum(1 for _ in flow)
        dt = time.perf_counter() - t0
        print(f"real loader: {n / max(dt, 1e-9):.2f} scenes/s ({n} scenes)")
    else:
        print(f"real loader: skipped (no dataset at {args.data_root})")

    from votenet_tpu import native

    print(f"native parser active: {native.available()}")


if __name__ == "__main__":
    main()
