"""Compiled-on-TPU Pallas ball query: exactness vs XLA twin + timing."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from votenet_tpu.ops.pallas.ballquery import query_ball_point_pallas
from votenet_tpu.ops.grouping import _query_ball_point_dense

rng = np.random.RandomState(0)
B = 8

LIVE = [  # (name, N, M, S, r)
    ("sa1", 20480, 2048, 64, 0.2),
    ("sa2", 2048, 1024, 64, 0.4),
    ("sa3", 1024, 512, 64, 0.8),
    ("sa4", 512, 256, 64, 1.2),
    ("prop", 1024, 256, 64, 0.3),
]


def clustered(B, N):
    centers = rng.randn(B, 16, 3).astype(np.float32) * 1.5
    pts = centers[:, rng.randint(0, 16, N)] + rng.randn(B, N, 3).astype(np.float32) * 0.25
    return pts


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


for name, N, M, S, r in LIVE:
    pts = jnp.asarray(clustered(B, N))
    q = jnp.asarray(np.asarray(pts)[:, rng.choice(N, M, replace=False)])
    ia, ca = query_ball_point_pallas(r, S, pts, q)
    ib, cb = _query_ball_point_dense(r, S, "exact", pts, q)
    ok_i = np.array_equal(np.asarray(ia), np.asarray(ib))
    ok_c = np.array_equal(np.asarray(ca), np.asarray(cb))
    t_pal = timeit(lambda: query_ball_point_pallas(r, S, pts, q))
    t_xla = timeit(lambda: _query_ball_point_dense(r, S, "exact", pts, q))
    print(
        f"{name}: B={B} N={N} M={M} idx_eq={ok_i} cnt_eq={ok_c} "
        f"pallas={t_pal:.2f}ms xla_exact={t_xla:.2f}ms speedup={t_xla/t_pal:.2f}x",
        flush=True,
    )
