"""One-process TPU validation + benchmark suite.

The axon tunnel pays ~2 min of per-process init, so all TPU checks and
benchmarks run from this single script:

  python benchmarks/tpu_suite.py [fps ballq sa model nms train ...]

Prints one line per item; correctness checks compare against the CPU/XLA
twins (the numpy-oracle-verified implementations).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])
    return x


def timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def bench_fps():
    import jax
    import jax.numpy as jnp

    from votenet_tpu.ops import farthest_point_sample
    from votenet_tpu.ops.pallas.fps import farthest_point_sample_pallas

    rng = np.random.RandomState(0)
    # correctness on a small case vs the XLA twin
    small = rng.randn(4, 512, 3).astype(np.float32)
    a = np.asarray(farthest_point_sample(128, small))
    b = np.asarray(farthest_point_sample_pallas(128, small))
    print(f"fps correctness (pallas vs xla): {(a == b).all()}", flush=True)

    xyz = jnp.asarray(rng.uniform(-4, 4, (8, 20480, 3)), jnp.float32)
    xla = jax.jit(lambda x: farthest_point_sample(2048, x))
    pal = jax.jit(lambda x: farthest_point_sample_pallas(2048, x))
    txla = timeit(lambda: xla(xyz), iters=3, warmup=1)
    tpal = timeit(lambda: pal(xyz), iters=10, warmup=2)
    print(f"fps 8x20480->2048: xla {txla*1e3:.1f} ms | pallas {tpal*1e3:.2f} ms "
          f"({txla/tpal:.1f}x)", flush=True)
    big = jnp.asarray(rng.uniform(-4, 4, (8, 20480, 3)), jnp.float32)
    same = np.array_equal(np.asarray(xla(big)), np.asarray(pal(big)))
    print(f"fps big-case parity: {same}", flush=True)


def bench_ballq():
    import jax
    import jax.numpy as jnp

    from votenet_tpu.ops import query_ball_point

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-4, 4, (8, 20480, 3)), jnp.float32)
    q = xyz[:, :2048]
    fn = jax.jit(lambda a, b: query_ball_point(0.2, 64, a, b))
    t = timeit(lambda: fn(xyz, q), iters=10, warmup=2)
    print(f"ball_query 8x(20480->2048,K=64): {t*1e3:.2f} ms", flush=True)


def bench_sa():
    import jax
    import jax.numpy as jnp

    from votenet_tpu.models.pointnet2 import PointNetSAModule

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.uniform(-4, 4, (8, 20480, 3)), jnp.float32)
    mod = PointNetSAModule(npoint=2048, radius=0.2, nsample=64, mlp=(64, 64, 128))
    variables = jax.jit(lambda r: mod.init(r, xyz, xyz, train=False))(
        jax.random.PRNGKey(0)
    )
    fn = jax.jit(lambda x: mod.apply(variables, x, x, train=False))
    t = timeit(lambda: fn(xyz), iters=10, warmup=2)
    print(f"sa_layer1 (B=8): {t*1e3:.2f} ms", flush=True)


def bench_model():
    import jax
    import jax.numpy as jnp

    from votenet_tpu.config import default_config
    from votenet_tpu.models.decode import predict_boxes
    from votenet_tpu.models.votenet import VoteNet

    cfg = default_config()
    model = VoteNet(cfg)
    pts0 = jnp.zeros((1, cfg.point_num, 3), jnp.float32)
    t0 = time.perf_counter()
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        jax.random.PRNGKey(0), pts0
    )
    sync(variables)
    print(f"model init: {time.perf_counter()-t0:.1f} s", flush=True)

    rng = np.random.RandomState(0)
    for B in (1, 8):
        pts = jnp.asarray(rng.uniform(-4, 4, (B, cfg.point_num, 3)), jnp.float32)

        @jax.jit
        def fwd(p):
            end = model.apply(variables, p, train=False)
            pr = predict_boxes(end, cfg)
            return pr["bboxes"], pr["class_scores"], pr["keep"]

        t = timeit(lambda: fwd(pts), iters=5, warmup=2)
        print(f"e2e inference B={B}: {t*1e3:.1f} ms -> {B/t:.2f} scenes/s", flush=True)


def bench_nms():
    import jax
    import jax.numpy as jnp

    from votenet_tpu.ops import nms3d

    sys.path.insert(0, "tests")
    from oracles import random_boxes

    rng = np.random.RandomState(0)
    corners = jnp.asarray(random_boxes(rng, (8, 256)))
    scores = jnp.asarray(rng.rand(8, 256).astype(np.float32))
    obj = jnp.asarray(rng.randn(8, 256, 2).astype(np.float32))
    fn = jax.jit(lambda c, s, o: nms3d(c, s, o, 0.25))
    t = timeit(lambda: fn(corners, scores, obj), iters=5, warmup=2)
    print(f"nms3d (8x256): {t*1e3:.2f} ms", flush=True)


def bench_train():
    import jax

    from votenet_tpu.config import default_config
    from votenet_tpu.data.dataflow import batch_scenes
    from votenet_tpu.data.synthetic import synthetic_scenes
    from votenet_tpu.models.votenet import VoteNet
    from votenet_tpu.train.loop import make_train_step
    from votenet_tpu.train.state import create_train_state

    cfg = default_config().replace(batch_size=8)
    state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=100)
    model = VoteNet(cfg)
    step = jax.jit(make_train_step(model, cfg))
    batch = next(iter(batch_scenes(
        iter(synthetic_scenes(0, cfg, cfg.batch_size)), cfg.batch_size,
        cfg.max_gt_boxes,
    )))
    s = state

    def run():
        nonlocal s
        s, m = step(s, batch)
        return m["total_cost"]

    t = timeit(run, iters=5, warmup=2)
    print(f"train_step B=8: {t*1e3:.1f} ms -> {8/t:.2f} scenes/s", flush=True)


def bench_stages():
    """Fine-grained stage timing of the sa1 pipeline + batch scaling."""
    import jax
    import jax.numpy as jnp

    from votenet_tpu import ops
    from votenet_tpu.ops.pallas.fps import farthest_point_sample_pallas

    rng = np.random.RandomState(0)
    B = 8
    xyz = jnp.asarray(rng.uniform(-4, 4, (B, 20480, 3)), jnp.float32)

    fps = jax.jit(lambda x: farthest_point_sample_pallas(2048, x))
    idxf = fps(xyz)
    t = timeit(lambda: fps(xyz), iters=10)
    print(f"stage fps: {t*1e3:.2f} ms", flush=True)

    gather = jax.jit(ops.gather_point)
    new_xyz = gather(xyz, idxf)
    t = timeit(lambda: gather(xyz, idxf), iters=10)
    print(f"stage gather_point: {t*1e3:.2f} ms", flush=True)

    bq = jax.jit(lambda a, b: ops.query_ball_point(0.2, 64, a, b))
    idx, _ = bq(xyz, new_xyz)
    t = timeit(lambda: bq(xyz, new_xyz), iters=10)
    print(f"stage ball_query: {t*1e3:.2f} ms", flush=True)

    grp = jax.jit(ops.group_point)
    t = timeit(lambda: grp(xyz, idx), iters=10)
    print(f"stage group_point(xyz): {t*1e3:.2f} ms", flush=True)

    feats = jnp.asarray(rng.randn(B, 20480, 128), jnp.float32)
    t = timeit(lambda: grp(feats, idx), iters=10)
    print(f"stage group_point(128ch): {t*1e3:.2f} ms", flush=True)

    W1 = jnp.asarray(rng.randn(6, 64) * 0.1, jnp.float32)
    W2 = jnp.asarray(rng.randn(64, 64) * 0.1, jnp.float32)
    W3 = jnp.asarray(rng.randn(64, 128) * 0.1, jnp.float32)

    @jax.jit
    def mlp_pool(xyz, idx, new_xyz):
        gx = ops.group_point(xyz, idx) - new_xyz[:, :, None, :]
        gp = ops.group_point(xyz, idx)
        h = jnp.concatenate([gx, gp], -1)
        h = jax.nn.relu(h @ W1)
        h = jax.nn.relu(h @ W2)
        h = jax.nn.relu(h @ W3)
        return jnp.max(h, axis=2)

    t = timeit(lambda: mlp_pool(xyz, idx, new_xyz), iters=10)
    print(f"stage group+mlp+pool: {t*1e3:.2f} ms", flush=True)


def bench_stages_bwd():
    """Backward-pass cost of the gather-heavy pieces."""
    import jax
    import jax.numpy as jnp

    from votenet_tpu import ops

    rng = np.random.RandomState(0)
    B, N, M, S, C = 8, 20480, 2048, 64, 128
    pts = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    idx = jnp.asarray(rng.randint(0, N, (B, M, S)), jnp.int32)

    fwd = jax.jit(lambda p: ops.group_point(p, idx).sum())
    t = timeit(lambda: fwd(pts), iters=5)
    print(f"group_point fwd+sum: {t*1e3:.2f} ms", flush=True)

    bwd = jax.jit(jax.grad(lambda p: ops.group_point(p, idx).sum()))
    t = timeit(lambda: bwd(pts), iters=5)
    print(f"group_point scatter-add bwd: {t*1e3:.2f} ms", flush=True)

    W1 = jnp.asarray(rng.randn(C, 64) * 0.1, jnp.float32)

    def mlp_loss(p):
        g = ops.group_point(p, idx)
        h = jax.nn.relu(g @ W1)
        return jnp.max(h, axis=2).sum()

    gfun = jax.jit(jax.grad(mlp_loss))
    t = timeit(lambda: gfun(pts), iters=5)
    print(f"group+mlp+pool grad: {t*1e3:.2f} ms", flush=True)


def bench_scatter():
    """MXU one-hot scatter-add (group_point VJP) vs XLA scatter at sa2 size."""
    import jax
    import jax.numpy as jnp

    from votenet_tpu.ops.grouping import scatter_add_mxu

    rng = np.random.RandomState(0)
    B, M, S, C, N = 8, 1024, 64, 131, 2048
    g = jnp.asarray(rng.randn(B, M, S, C), jnp.float32)
    idx = jnp.asarray(rng.randint(0, N, (B, M, S)), jnp.int32)

    xla = jax.jit(lambda g, i: jnp.zeros((B, N, C), jnp.float32).at[
        jnp.arange(B)[:, None], i.reshape(B, -1)
    ].add(g.reshape(B, -1, C)))
    mxu = jax.jit(lambda g, i: scatter_add_mxu(g, i, N))

    a = xla(g, idx)
    b = mxu(g, idx)
    ok = np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    print(f"scatter correctness (mxu vs xla): {ok}", flush=True)
    txla = timeit(lambda: xla(g, idx), iters=5)
    tmxu = timeit(lambda: mxu(g, idx), iters=5)
    print(f"scatter-add 8x65536x131->2048: xla {txla*1e3:.1f} ms | "
          f"mxu one-hot {tmxu*1e3:.1f} ms ({txla/tmxu:.1f}x)", flush=True)


def bench_batch_scaling():
    import jax
    import jax.numpy as jnp

    from votenet_tpu.config import default_config
    from votenet_tpu.models.decode import predict_boxes
    from votenet_tpu.models.votenet import VoteNet

    cfg = default_config()
    model = VoteNet(cfg)
    pts0 = jnp.zeros((1, cfg.point_num, 3), jnp.float32)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        jax.random.PRNGKey(0), pts0
    )
    rng = np.random.RandomState(0)
    for B in (16, 32):
        pts = jnp.asarray(rng.uniform(-4, 4, (B, cfg.point_num, 3)), jnp.float32)

        @jax.jit
        def fwd(p):
            end = model.apply(variables, p, train=False)
            pr = predict_boxes(end, cfg)
            return pr["bboxes"], pr["class_scores"], pr["keep"]

        t = timeit(lambda: fwd(pts), iters=5, warmup=2)
        print(f"e2e inference B={B}: {t*1e3:.1f} ms -> {B/t:.2f} scenes/s", flush=True)


ALL = {
    "fps": bench_fps,
    "ballq": bench_ballq,
    "sa": bench_sa,
    "model": bench_model,
    "nms": bench_nms,
    "train": bench_train,
    "stages": bench_stages,
    "scaling": bench_batch_scaling,
    "stages_bwd": bench_stages_bwd,
    "scatter": bench_scatter,
}

if __name__ == "__main__":
    which = sys.argv[1:] or list(ALL)
    import jax

    print("backend:", jax.default_backend(), flush=True)
    for name in which:
        try:
            ALL[name]()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
