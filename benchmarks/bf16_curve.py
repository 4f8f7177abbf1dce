"""Precision-mode training validation: convergence curves + step-time deltas.

Trains the full-size model on 16 synthetic scenes with the reference recipe
under three precision modes (params/optimizer stay f32 in all):

  float32  — everything f32 (production default)
  mixed    — Config.mixed_precision: f32 coordinates/sa1/voting, bf16 for
             the wide sa2+/FP/proposal feature gathers + matmuls (the
             recipe the round-2 bf16 post-mortem called for)
  bfloat16 — compute_dtype=bfloat16 everywhere (known convergence-negative:
             quantizes absolute coordinates; kept as the control)
  packed   — gather_packing="bf16_hilo": f32 compute, bf16 hi/lo-packed SA
             gather TRANSPORT only (round-4 lever; see DESIGN.md)

Prints a loss-curve table plus sustained step time per mode. Results
recorded in DESIGN.md.

  python benchmarks/bf16_curve.py [steps] [mode,mode,...]
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

    from votenet_tpu.ops import dispatch

    if dtype == "mixed":
        cfg = default_config().replace(batch_size=8, mixed_precision=True)
    elif dtype == "packed":
        cfg = default_config().replace(batch_size=8)
        dispatch.set_gather_packing("bf16_hilo")
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
    dispatch.set_gather_packing("none")
    return curve, sps


def main(steps: int = 2000, modes=("float32", "mixed", "bfloat16")):
    rows = {}
    sps = {}
    for dtype in modes:
        print(f"=== {dtype} ===", flush=True)
        rows[dtype], sps[dtype] = run_one(dtype, steps)
        for k, (l, oa, sa) in sorted(rows[dtype].items()):
            print(f"step {k}: loss {l:.4f} obj_acc {oa:.3f} sem_acc {sa:.3f}", flush=True)
        print(f"sustained: {sps[dtype]:.1f} scenes/s", flush=True)

    base = modes[0]
    header = " | ".join(f"{m} loss" for m in modes) + " | " + " | ".join(
        f"{m} acc" for m in modes
    )
    print(f"\n| steps | {header} |")
    print("|" + "---|" * (1 + 2 * len(modes)))
    nan3 = (float("nan"),) * 3
    for k in sorted(rows[base]):
        cells = [rows[m].get(k, nan3) for m in modes]
        losses = " | ".join(f"{c[0]:.3f}" for c in cells)
        accs = " | ".join(f"{c[1]:.2f}/{c[2]:.2f}" for c in cells)
        print(f"| {k} | {losses} | {accs} |")
    parts = [
        f"{m} {sps[m]:.1f} scenes/s ({sps[m] / sps[base]:.2f}x)" for m in modes
    ]
    print("\nstep-time: " + ", ".join(parts))


if __name__ == "__main__":
    _steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    _modes = (
        tuple(sys.argv[2].split(","))
        if len(sys.argv) > 2
        else ("float32", "mixed", "bfloat16")
    )
    main(_steps, _modes)
