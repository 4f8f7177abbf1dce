"""Backward-pass attribution for the train step at B=8.

Times fwd-only, fwd+bwd of the model, and the full optimizer step as chained
device-side loops, plus per-SA-layer fwd+bwd chains to locate gradient cost.
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


def chained_time(step, carry0, iters=3, warmup=1):
    """step: carry -> carry (device loop body)."""

    @jax.jit
    def loop(carry):
        return lax.fori_loop(0, K, lambda i, c: step(c), carry)

    for _ in range(warmup):
        _sync(loop(carry0))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(carry0)
    _sync(out)
    return (time.perf_counter() - t0) / (iters * K)


def main():
    from votenet_tpu.config import default_config
    from votenet_tpu.data.dataflow import batch_scenes
    from votenet_tpu.data.synthetic import synthetic_scenes
    from votenet_tpu.models.losses import votenet_loss
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.train.loop import GT_KEYS, make_train_step
    from votenet_tpu.train.state import create_train_state

    cfg = default_config().replace(batch_size=B)
    state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=100)
    model = VoteNet(cfg)
    batch = next(iter(batch_scenes(
        iter(synthetic_scenes(0, cfg, B)), B, cfg.max_gt_boxes
    )))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    gt = {k: batch[k] for k in GT_KEYS}
    params, bs = state.params, state.batch_stats

    def loss_fn(params, pts):
        ep, mut = model.apply(
            {"params": params, "batch_stats": bs}, pts, train=True,
            mutable=["batch_stats"],
        )
        return votenet_loss(ep, gt, cfg, "reference").total

    # forward only (train mode)
    def fwd_step(carry):
        pts, acc = carry
        l = loss_fn(params, pts)
        return pts + l * 1e-30, acc + l

    t_fwd = chained_time(fwd_step, (batch["points"], jnp.float32(0)))
    print(f"fwd(train-mode loss): {t_fwd*1e3:7.2f}ms", flush=True)

    # forward + backward (grad wrt params)
    def fb_step(carry):
        pts, acc = carry
        l, g = jax.value_and_grad(loss_fn)(params, pts)
        gn = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return pts + (l + gn) * 1e-30, acc + l

    t_fb = chained_time(fb_step, (batch["points"], jnp.float32(0)))
    print(f"fwd+bwd:              {t_fb*1e3:7.2f}ms", flush=True)

    # full optimizer step
    step_fn = make_train_step(model, cfg)

    def full_step(carry):
        st, acc = carry
        st, m = step_fn(st, batch)
        return st, acc + m["total_cost"]

    t_full = chained_time(full_step, (state, jnp.float32(0)))
    print(f"full train step:      {t_full*1e3:7.2f}ms "
          f"({B/t_full:.1f} scenes/s)", flush=True)


if __name__ == "__main__":
    main()
