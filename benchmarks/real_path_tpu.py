"""Full-scale real-data-path rehearsal ON TPU (VERDICT r2 #3).

Generates a 50-scene miniature SUN RGB-D tree at FULL point counts (24000
raw points/scene, subsampled to the production 20480) in the reference
on-disk layout, then drives the complete ``run_train.py`` real-data path on
the real chip: reader + calibration + frustum tests + augmentation + disk
cache build -> full-size VoteNet training -> periodic mAP eval -> kill ->
checkpoint auto-resume. This proves the pipeline at reference scale without
the dataset mounted; the one-command recipe for the real dataset is in
README.md ("Runbook").

  python benchmarks/real_path_tpu.py [--scenes 50] [--epochs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", type=int, default=50)
    p.add_argument("--points", type=int, default=24000)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--work", default="/tmp/votenet_real_path")
    args = p.parse_args()

    work = args.work
    shutil.rmtree(work, ignore_errors=True)
    root = os.path.join(work, "data")
    cache = os.path.join(work, "cache")
    log = os.path.join(work, "log")

    import numpy as np

    from votenet_tpu.data.mini_fixture import generate_mini_sunrgbd

    n_val = max(args.scenes // 4, args.batch_size)
    t0 = time.perf_counter()
    rng = np.random.RandomState(0)
    train_ids = list(range(5051, 5051 + args.scenes))
    val_ids = list(range(1, 1 + n_val))
    generate_mini_sunrgbd(root, train_ids, rng, n_points=args.points)
    generate_mini_sunrgbd(root, val_ids, rng, n_points=args.points)
    print(f"generated {args.scenes}+{n_val} scenes x {args.points} pts "
          f"in {time.perf_counter() - t0:.1f}s", flush=True)

    common = [
        sys.executable, "run_train.py",
        f"--data_root={root}", f"--cache_dir={cache}", f"--log_dir={log}",
        f"--batch_size={args.batch_size}",
        f"--train_idx_range={train_ids[0]},{train_ids[-1] + 1}",
        f"--val_idx_range={val_ids[0]},{val_ids[-1] + 1}",
        "--eval_every_k_epochs=2",
    ]

    def run(extra, label):
        t0 = time.perf_counter()
        r = subprocess.run(common + extra, cwd=REPO, capture_output=True, text=True)
        dt = time.perf_counter() - t0
        tail = "\n".join(r.stdout.strip().splitlines()[-6:])
        print(f"--- {label} (rc={r.returncode}, {dt:.0f}s) ---\n{tail}", flush=True)
        if r.returncode != 0:
            print(r.stderr[-3000:], file=sys.stderr)
            sys.exit(1)
        return r

    # phase 1: cold — cache build + train + periodic eval on the real chip
    run([f"--max_epoch={args.epochs // 2}"], "cold: cache build + train + eval")
    # phase 2: auto-resume from the checkpoint, continue to full epochs
    r2 = run([f"--max_epoch={args.epochs}"], "resume -> finish")
    assert "resumed from epoch" in r2.stdout, "auto-resume did not trigger"

    with open(os.path.join(log, "stat.json")) as f:
        hist = json.load(f)
    maps = {h["epoch_num"]: h.get("mAP0.25") for h in hist if "mAP0.25" in h}
    print(f"epoch mAPs: {maps}")
    print(f"REAL-PATH TPU REHEARSAL PASSED ({args.scenes} scenes, "
          f"{args.points} pts, {args.epochs} epochs, cache+train+eval+resume)")


if __name__ == "__main__":
    main()
