"""In-graph marginal-cost attribution by op ablation (B=8, real chip).

The standalone stage table (stage_profile.py) over-counts: XLA fuses most
stage-boundary materialization away in the full graph (fused forward 22.8 ms
vs 63.9 ms stage sum, DESIGN.md round-3 roofline section). To know what an
op REALLY costs in the compiled step, this script re-times the full
inference forward / train step with one op family at a time replaced by a
shape-identical near-free stand-in (constant-pattern indices that keep a
data dependence so XLA cannot fold the consumer graph). baseline − ablated
= the op's true marginal cost, including every fusion it enables/blocks.

Stand-ins keep downstream work comparable: fake ball-query indices still
drive the same gathers (contiguous pattern — gather traffic remains, mask
einsums go away); fake FPS is arange (removes the sequential loop, keeps
the gather); "broadcast group_point" removes gather AND its backward
scatter while keeping MLP FLOPs.

Usage: python benchmarks/ablation_profile.py [inference|train|both]
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
TINY = bool(int(os.environ.get("BENCH_TINY", "0")))  # CPU smoke mode


def _config():
    from votenet_tpu.config import default_config, tiny_config

    return tiny_config() if TINY else default_config()


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chained_time(fn, args, iters=3, warmup=2, k=K):
    @jax.jit
    def loop(a):
        def body(i, carry):
            out = fn(*carry[:-1])
            s = jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32)
            new0 = carry[0] + s * 1e-30
            return (new0,) + carry[1:-1] + (carry[-1] + s,)

        return lax.fori_loop(0, k, body, args + (jnp.float32(0.0),))

    for _ in range(warmup):
        _sync(loop(args))
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        out = loop(args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / k


# ---------------------------------------------------------------- stand-ins

def fake_query_ball_point(radius, nsample, xyz1, xyz2):
    B_, N = xyz1.shape[0], xyz1.shape[1]
    M = xyz2.shape[1]
    dep = (xyz2[:, :1, :1] * 0).astype(jnp.int32)  # (B,1,1) data dependence
    base = (jnp.arange(M * nsample, dtype=jnp.int32) % N).reshape(1, M, nsample)
    idx = base + dep
    cnt = jnp.full((B_, M), nsample, jnp.int32) + dep[..., 0]
    return idx, cnt


def fake_fps(npoint, xyz):
    B_ = xyz.shape[0]
    dep = (xyz[:, :1, 0] * 0).astype(jnp.int32)
    return jnp.broadcast_to(jnp.arange(npoint, dtype=jnp.int32), (B_, npoint)) + dep


def fake_three_nn(xyz1, xyz2):
    B_, N = xyz1.shape[0], xyz1.shape[1]
    M = xyz2.shape[1]
    dep = xyz2[:, :1, :1] * 0
    dist = jnp.full((B_, N, 3), 0.1, jnp.float32) + dep
    idx = (jnp.arange(N * 3, dtype=jnp.int32) % M).reshape(1, N, 3) + dep.astype(jnp.int32)
    return dist, idx


def fake_nms3d(bboxes, scores, objectness, iou):
    return (objectness[..., 1] > objectness[..., 0])


def broadcast_group_point(points, idx, grad_skip_prefix=0):
    # removes the gather (fwd) and the index scatter (bwd); keeps shapes
    B_, N, C = points.shape
    _, M, S = idx.shape
    dep = (idx[:, :1, :1, None] * 0).astype(points.dtype)
    return jnp.broadcast_to(points[:, :1, None, :], (B_, M, S, C)) + dep


class patched:
    """Temporarily swap attributes on modules: patched((mod, name, fn), ...)."""

    def __init__(self, *specs):
        self.specs = specs

    def __enter__(self):
        self.saved = [(m, n, getattr(m, n)) for m, n, _ in self.specs]
        for m, n, f in self.specs:
            setattr(m, n, f)

    def __exit__(self, *exc):
        for m, n, f in self.saved:
            setattr(m, n, f)


def build_inference():
    from votenet_tpu.models.decode import predict_boxes
    from votenet_tpu.models.votenet import VoteNet

    cfg = _config()
    model = VoteNet(cfg)
    pts0 = jnp.zeros((1, cfg.point_num, 3), jnp.float32)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        jax.random.PRNGKey(0), pts0
    )

    def predict(points):
        end_points = model.apply(variables, points, train=False)
        pred = predict_boxes(end_points, cfg)
        return (pred["keep"].astype(jnp.float32),)

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-4, 4, (B, cfg.point_num, 3)), jnp.float32)
    return predict, (pts,)


def build_train():
    from votenet_tpu.data.dataflow import batch_scenes
    from votenet_tpu.data.synthetic import synthetic_scenes
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.ops.dispatch import apply_config
    from votenet_tpu.train.loop import make_train_step
    from votenet_tpu.train.state import create_train_state

    cfg = _config().replace(batch_size=B)
    apply_config(cfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=100)
    model = VoteNet(cfg)
    step_fn = make_train_step(model, cfg)
    batch = next(iter(batch_scenes(
        iter(synthetic_scenes(0, cfg, B)), B, cfg.max_gt_boxes
    )))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # train chaining: carry the state through the loop; points perturbation
    # trick does not apply — reuse bench.py's state-carry formulation
    def timer():
        Kt = 8

        @jax.jit
        def chained(st, bt):
            def body(i, carry):
                s, acc = carry
                s, m = step_fn(s, bt)
                return s, acc + m["total_cost"]

            return lax.fori_loop(0, Kt, body, (st, jnp.float32(0.0)))

        for _ in range(1):
            _sync(chained(state, batch))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = chained(state, batch)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return best / Kt

    return timer


def main():
    import votenet_tpu.models.decode as decode_mod
    import votenet_tpu.ops as ops_pkg
    import votenet_tpu.models.pointnet2 as pn2  # noqa: F401 (ops via pkg attr)

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    ablations = [
        ("baseline", []),
        ("no_ball_query", [(ops_pkg, "query_ball_point", fake_query_ball_point)]),
        ("no_fps", [(ops_pkg, "farthest_point_sample", fake_fps)]),
        ("no_three_nn", [(ops_pkg, "three_nn", fake_three_nn)]),
        ("no_group_gather", [(ops_pkg, "group_point", broadcast_group_point)]),
        ("no_nms", [(decode_mod, "nms3d", fake_nms3d)]),
        ("no_bq_no_gather", [
            (ops_pkg, "query_ball_point", fake_query_ball_point),
            (ops_pkg, "group_point", broadcast_group_point),
        ]),
    ]

    if only is not None:
        ablations = [(n, s) for n, s in ablations if n == "baseline" or n in only]

    if which in ("inference", "both"):
        print(f"== inference forward (B={B}, chained x{K}) ==", flush=True)
        base = None
        for name, specs in ablations:
            with patched(*specs):
                fn, args = build_inference()
                dt = chained_time(fn, args)
            if name == "baseline":
                base = dt
                print(f"{name:>18}: {dt*1e3:7.2f} ms", flush=True)
            else:
                print(f"{name:>18}: {dt*1e3:7.2f} ms   marginal {1e3*(base-dt):+6.2f} ms", flush=True)

    if which in ("train", "both"):
        print(f"== train step (B={B}, chained x8) ==", flush=True)
        base = None
        for name, specs in ablations:
            if name == "no_nms":
                continue  # NMS is not in the train graph
            with patched(*specs):
                timer = build_train()
                dt = timer()
            if name == "baseline":
                base = dt
                print(f"{name:>18}: {dt*1e3:7.2f} ms", flush=True)
            else:
                print(f"{name:>18}: {dt*1e3:7.2f} ms   marginal {1e3*(base-dt):+6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
