"""bf16 INFERENCE probe: accuracy + speed on a trained f32 checkpoint.

Training in bf16 is measured-negative (gradient decoherence, DESIGN.md) —
but inference has no gradients, and the forward pass runs at the HBM
bandwidth roofline, so halving activation bytes could be a real serving
win IF the trained model's mAP survives bf16 rounding. This loads the
round-2 4k-scene checkpoint (held-out mAP ~0.70), evaluates the SAME
held-out scenes with compute_dtype float32 vs bfloat16, and measures both
predict throughputs.

  python benchmarks/bf16_inference_probe.py [n_val] [ckpt_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_val: int = 256, ckpt_dir: str = "train_log/heldout_4k"):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from votenet_tpu.config import default_config
    from votenet_tpu.data.synthetic import synthetic_gt_all, synthetic_scenes
    from votenet_tpu.eval.evaluator import DeviceSceneCache, Evaluator, make_predict_fn
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.train.state import create_train_state
    from votenet_tpu.utils import checkpoint as ckpt

    cfg = default_config().replace(batch_size=8)
    state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=1)
    state, step = ckpt.restore_checkpoint(ckpt_dir, state)
    assert step is not None, f"no checkpoint under {ckpt_dir}"
    print(f"loaded checkpoint epoch {step} from {ckpt_dir}", flush=True)

    # the round-2 held-out val set: synthetic seed 1 (DESIGN.md)
    scenes = synthetic_scenes(1, cfg, n_val)
    gt_all = synthetic_gt_all(scenes)
    pairs = [(int(s["data_idx"]), s["points"]) for s in scenes]
    ev = Evaluator(cfg, gt_all, batch_size=8)
    cache = DeviceSceneCache(pairs, batch_size=8)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    results = {}
    for mode in ("float32", "bfloat16"):
        cfg_m = cfg.replace(compute_dtype=mode)
        model = VoteNet(cfg_m)
        predict = make_predict_fn(model, variables, cfg_m)
        t0 = time.perf_counter()
        r = ev.evaluate(predict, cache)
        dt = time.perf_counter() - t0
        results[mode] = r["mAP"]
        print(f"{mode}: mAP@0.25 = {r['mAP']:.4f}  (eval wall {dt:.1f}s)", flush=True)

        # pure device throughput, chained (bench.py-style)
        pts = jnp.asarray(np.stack([p for _, p in pairs[:8]]), jnp.float32)
        K = 10

        @jax.jit
        def chained(points, predict=predict):
            def body(i, carry):
                p, acc = carry
                out = predict(p)
                acc = acc + jnp.sum(out["keep"])
                return p + acc.astype(jnp.float32) * 1e-30, acc

            return lax.fori_loop(0, K, body, (points, jnp.int32(0)))

        def sync(x):
            np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

        sync(chained(pts)); sync(chained(pts))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sync(chained(pts))
            best = min(best, time.perf_counter() - t0)
        sps = 8 * K / best
        print(f"{mode}: inference {sps:.1f} scenes/s (B=8, device-chained)", flush=True)

    delta = results["bfloat16"] - results["float32"]
    print(f"\nmAP delta bf16 - f32: {delta:+.4f}")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 256,
        sys.argv[2] if len(sys.argv) > 2 else "train_log/heldout_4k",
    )
