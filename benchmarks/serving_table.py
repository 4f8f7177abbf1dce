"""Serving-mode table: scenes/s x held-out mAP on a TRAINED checkpoint.

The round-4 serving section measured speed per mode but owed the accuracy
half (VERDICT r4 #1b). This produces the full mode x speed x mAP table in
one session on the SAME trained checkpoint and the SAME held-out scenes,
so every row is directly comparable:

  f32          the reference-parity serving default
  bf16         compute_dtype=bfloat16 (run_eval --preset=throughput)
  f32+samlp    the fused SA-MLP eval kernel (tested opt-in, known ~0.95x)
  bf16+fast_bq bf16 compute AND the fast_bf16 ball query (max-speed stack,
               NOT reference parity — boundary-band index flips)

Speed is the bench.py-style device-chained protocol (B=8), quoted with the
in-session f32 baseline so tunnel-session variance cancels in the ratios.

  python benchmarks/serving_table.py [n_val] [ckpt_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 8
K = 10


def main(n_val: int = 1024, ckpt_dir: str = "train_log/r5_parity"):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from votenet_tpu.config import default_config
    from votenet_tpu.data.synthetic import synthetic_gt_all, synthetic_scenes
    from votenet_tpu.eval.evaluator import (
        DeviceSceneCache, Evaluator, make_packed_predict_fn, make_predict_fn,
    )
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.ops import dispatch
    from votenet_tpu.train.state import create_train_state
    from votenet_tpu.utils import checkpoint as ckpt

    cfg = default_config().replace(batch_size=B)
    state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=1)
    state, step = ckpt.restore_checkpoint(ckpt_dir, state)
    assert step is not None, f"no checkpoint under {ckpt_dir}"
    print(f"loaded checkpoint epoch {step} from {ckpt_dir}", flush=True)

    # the held-out val set of the r5 runs: synthetic seed 1 (run_train.py
    # --synthetic uses seed 1 for val; training scenes are seed 0)
    scenes = synthetic_scenes(1, cfg, n_val)
    gt_all = synthetic_gt_all(scenes)
    pairs = [(int(s["data_idx"]), s["points"]) for s in scenes]
    ev = Evaluator(cfg, gt_all, batch_size=B)
    cache = DeviceSceneCache(pairs, batch_size=B)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def timed_sps(predict):
        pts = jnp.asarray(np.stack([p for _, p in pairs[:B]]), jnp.float32)

        @jax.jit
        def chained(points):
            def body(i, carry):
                p, acc = carry
                out = predict(p)
                acc = acc + jnp.sum(out["keep"])
                return p + acc.astype(jnp.float32) * 1e-30, acc

            return lax.fori_loop(0, K, body, (points, jnp.int32(0)))

        sync(chained(pts)); sync(chained(pts))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            sync(chained(pts))
            best = min(best, time.perf_counter() - t0)
        return B * K / best

    MODES = [
        ("f32", dict(compute_dtype="float32"), dict()),
        ("bf16", dict(compute_dtype="bfloat16"), dict()),
        ("f32+samlp", dict(compute_dtype="float32"), dict(samlp="on")),
        ("bf16+fast_bq", dict(compute_dtype="bfloat16"),
         dict(bq_precision="fast_bf16")),
    ]
    rows = []
    base_sps = None
    for name, cfg_kw, disp_kw in MODES:
        cfg_m = cfg.replace(**cfg_kw)
        dispatch.set_samlp(disp_kw.get("samlp", "off"))
        dispatch.set_bq_precision(disp_kw.get("bq_precision", "exact"))
        model = VoteNet(cfg_m)
        # packed predictor for the mAP pass (fetch-optimized), plain dict
        # predictor for the chained speed timing (same forward graph)
        predict_packed = make_packed_predict_fn(model, variables, cfg_m)
        predict = make_predict_fn(model, variables, cfg_m)
        t0 = time.perf_counter()
        r = ev.evaluate(predict_packed, cache)
        wall = time.perf_counter() - t0
        sps = timed_sps(predict)
        if base_sps is None:
            base_sps = sps
        rows.append((name, sps, r["mAP"], wall))
        print(f"{name:14s}: {sps:7.1f} scenes/s ({sps / base_sps:5.3f}x)  "
              f"mAP@0.25 {r['mAP']:.4f}  (eval wall {wall:.1f}s)", flush=True)
    dispatch.set_samlp("off")
    dispatch.set_bq_precision("exact")

    print("\n| mode | scenes/s (B=8) | vs f32 | held-out mAP@0.25 |")
    print("|---|---|---|---|")
    for name, sps, mAP, _ in rows:
        print(f"| {name} | {sps:.1f} | {sps / rows[0][1]:.3f}x | {mAP:.4f} |")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1024,
        sys.argv[2] if len(sys.argv) > 2 else "train_log/r5_parity",
    )
