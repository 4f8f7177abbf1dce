"""Precision-mode training validation: convergence curves + step-time deltas.

Trains the full-size model on 16 synthetic scenes with the reference recipe
under three precision modes (params/optimizer stay f32 in all):

  float32  — everything f32 (production default)
  mixed    — Config.mixed_precision: f32 coordinates/sa1/voting, bf16 for
             the wide sa2+/FP/proposal feature gathers + matmuls (the
             recipe the round-2 bf16 post-mortem called for)
  bfloat16 — compute_dtype=bfloat16 everywhere (known convergence-negative:
             quantizes absolute coordinates; kept as the control)

Prints a loss-curve table plus sustained step time per mode. Results
recorded in DESIGN.md.

  python benchmarks/bf16_curve.py [steps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHECKPOINTS = (1, 100, 250, 500, 1000, 1500, 2000)


def run_one(dtype: str, steps: int):
    import jax

    from votenet_tpu.config import default_config
    from votenet_tpu.data.dataflow import batch_scenes
    from votenet_tpu.data.synthetic import synthetic_scenes
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.train.loop import make_train_step
    from votenet_tpu.train.state import create_train_state

    if dtype == "mixed":
        cfg = default_config().replace(batch_size=8, mixed_precision=True)
    else:
        cfg = default_config().replace(batch_size=8, compute_dtype=dtype)
    scenes = synthetic_scenes(0, cfg, 16)
    batches = list(batch_scenes(iter(scenes), cfg.batch_size, cfg.max_gt_boxes))
    state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=len(batches))
    model = VoteNet(cfg)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)

    curve = {}
    k = 0
    t0, t0_step = time.perf_counter(), 0  # fallback clock for steps < 10
    while k < steps:
        for batch in batches:
            state, metrics = step(state, batch)
            k += 1
            if k == 10:  # restart the clock after warmup/compile
                np.asarray(metrics["total_cost"])
                t0 = time.perf_counter()
                t0_step = k
            if k in CHECKPOINTS or k >= steps:
                curve[k] = (
                    float(metrics["total_cost"]),
                    float(metrics["obj_accuracy"]),
                    float(metrics["sem_accuracy"]),
                )
            if k >= steps:
                break
    np.asarray(metrics["total_cost"])
    sps = (k - t0_step) * cfg.batch_size / (time.perf_counter() - t0)
    return curve, sps


def main(steps: int = 2000):
    rows = {}
    sps = {}
    for dtype in ("float32", "mixed", "bfloat16"):
        print(f"=== {dtype} ===", flush=True)
        rows[dtype], sps[dtype] = run_one(dtype, steps)
        for k, (l, oa, sa) in sorted(rows[dtype].items()):
            print(f"step {k}: loss {l:.4f} obj_acc {oa:.3f} sem_acc {sa:.3f}", flush=True)
        print(f"sustained: {sps[dtype]:.1f} scenes/s", flush=True)

    print("\n| steps | f32 loss | mixed loss | bf16 loss | f32 acc | mixed acc | bf16 acc |")
    print("|---|---|---|---|---|---|---|")
    nan3 = (float("nan"),) * 3
    for k in sorted(rows["float32"]):
        f = rows["float32"][k]
        m = rows["mixed"].get(k, nan3)
        b = rows["bfloat16"].get(k, nan3)
        print(f"| {k} | {f[0]:.3f} | {m[0]:.3f} | {b[0]:.3f} | "
              f"{f[1]:.2f}/{f[2]:.2f} | {m[1]:.2f}/{m[2]:.2f} | {b[1]:.2f}/{b[2]:.2f} |")
    print(f"\nstep-time: f32 {sps['float32']:.1f} scenes/s, "
          f"mixed {sps['mixed']:.1f} scenes/s "
          f"({sps['mixed'] / sps['float32']:.2f}x), "
          f"bf16 {sps['bfloat16']:.1f} scenes/s "
          f"({sps['bfloat16'] / sps['float32']:.2f}x)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
