"""A/B the packed bf16 hi/lo SA-gather transport on the full train step.

Grid: gather_packing {none, bf16_hilo} x scatter_precision {exact,
fast_bf16}, full-size model, synthetic batch, chained device-side step
loop (no host round trips inside the timed region). The packed mode's
pitch (ops/dispatch.py gather_packing): halve the sa2+ grouped-tensor
HBM bytes forward AND make the backbone backward scatter single-pass
exact — so packed+exact should land near none+fast_bf16 speed while
keeping f32-exact products everywhere a payload is f32.

Run on the TPU: python benchmarks/packed_gather_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(os.environ.get("BENCH_BATCH", "8"))
K = 10


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    from votenet_tpu.config import default_config
    from votenet_tpu.data.dataflow import batch_scenes
    from votenet_tpu.data.synthetic import synthetic_scenes
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.ops import dispatch
    from votenet_tpu.train.loop import make_train_step
    from votenet_tpu.train.state import create_train_state

    cfg = default_config().replace(batch_size=B)
    state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=100)
    model = VoteNet(cfg)
    batch = next(iter(batch_scenes(
        iter(synthetic_scenes(0, cfg, B)), B, cfg.max_gt_boxes
    )))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    results = {}
    for pack in ("none", "bf16_hilo"):
        for scat in ("exact", "fast_bf16"):
            dispatch.set_gather_packing(pack)
            dispatch.set_scatter_precision(scat)
            step = make_train_step(model, cfg)

            @jax.jit
            def loop(s):
                def body(i, c):
                    c2, _ = step(c, batch)
                    return c2
                return lax.fori_loop(0, K, body, s)

            _sync(loop(state))  # compile + warm
            t0 = time.perf_counter()
            out = loop(state)
            _sync(out)
            dt = (time.perf_counter() - t0) / K
            results[(pack, scat)] = dt
            print(
                f"pack={pack:9s} scatter={scat:9s}: {dt*1e3:7.2f} ms/step "
                f"({B/dt:6.1f} scenes/s)",
                flush=True,
            )
    dispatch.set_gather_packing("none")
    dispatch.set_scatter_precision("exact")

    base = results[("none", "exact")]
    for k, v in results.items():
        print(f"{k}: {base/v:5.3f}x vs none+exact")


if __name__ == "__main__":
    main()
