"""Held-out mAP of the last-k retained checkpoints of one or more runs.

Point estimates at a single epoch swing +-0.06 near convergence (DESIGN.md
4k-scene table: 0.645 @80 -> 0.703 @85 -> 0.699 @95), so run comparisons
(e.g. parity vs --preset=throughput training) should quote all retained
checkpoints, not one. One compiled predictor serves every checkpoint (same
shapes; params are data).

  python benchmarks/ckpt_map_sweep.py [n_val] dir1 [dir2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_val: int, dirs):
    import jax

    from votenet_tpu.config import default_config
    from votenet_tpu.data.synthetic import synthetic_gt_all, synthetic_scenes
    from votenet_tpu.eval.evaluator import (
        DeviceSceneCache, Evaluator, make_packed_predict_fn,
    )
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.train.state import create_train_state
    from votenet_tpu.utils import checkpoint as ckpt

    cfg = default_config()
    scenes = synthetic_scenes(1, cfg, n_val)  # run_train's held-out seed
    gt_all = synthetic_gt_all(scenes)
    pairs = [(int(s["data_idx"]), s["points"]) for s in scenes]
    ev = Evaluator(cfg, gt_all, batch_size=64)
    cache = DeviceSceneCache(pairs, batch_size=64)
    model = VoteNet(cfg)
    template = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=1)

    for d in dirs:
        steps = sorted(ckpt.all_checkpoint_steps(d))
        print(f"\n{d}: checkpoints {steps}", flush=True)
        for s in steps:
            state, got = ckpt.restore_checkpoint(d, template, step=s)
            assert got == s
            predict = make_packed_predict_fn(
                model,
                {"params": state.params, "batch_stats": state.batch_stats},
                cfg,
            )
            t0 = time.perf_counter()
            r = ev.evaluate(predict, cache)
            print(f"  epoch {s}: mAP@0.25 = {r['mAP']:.4f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 1024
    dirs = args[1:] if args and args[0].isdigit() else args
    main(n, dirs or ["train_log/r5_parity", "train_log/r5_throughput"])
