"""Chained device-side timing: Pallas BQ vs XLA exact twin (run ALONE)."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from votenet_tpu.ops.pallas.ballquery import query_ball_point_pallas
from votenet_tpu.ops.grouping import _query_ball_point_dense

rng = np.random.RandomState(0)
B = 8
K = 20

LIVE = [
    ("sa1", 20480, 2048, 64, 0.2),
    ("sa2", 2048, 1024, 64, 0.4),
    ("sa3", 1024, 512, 64, 0.8),
    ("sa4", 512, 256, 64, 1.2),
    ("prop", 1024, 256, 64, 0.3),
]


def clustered(B, N):
    centers = rng.randn(B, 16, 3).astype(np.float32) * 1.5
    return centers[:, rng.randint(0, 16, N)] + rng.randn(B, N, 3).astype(np.float32) * 0.25


def chained(fn, pts, q, iters=3):
    @jax.jit
    def loop(p0, q0):
        def body(i, carry):
            p, acc = carry
            idx, cnt = fn(p, q0)
            s = jnp.sum(cnt).astype(jnp.float32)
            return (p0 + s * 1e-30, acc + s)

        return lax.fori_loop(0, K, body, (p0, jnp.float32(0)))

    out = loop(pts, q)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = loop(pts, q)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    return best


tot_p = tot_x = 0.0
for name, N, M, S, r in LIVE:
    pts = jnp.asarray(clustered(B, N))
    q = jnp.asarray(np.asarray(pts)[:, rng.choice(N, M, replace=False)])
    t_pal = chained(lambda p, qq: query_ball_point_pallas(r, S, p, qq), pts, q)
    t_xla = chained(
        lambda p, qq: _query_ball_point_dense(r, S, "exact", p, qq), pts, q
    )
    tot_p += t_pal
    tot_x += t_xla
    print(
        f"{name}: pallas={t_pal:.3f}ms xla_exact={t_xla:.3f}ms "
        f"speedup={t_xla/t_pal:.2f}x",
        flush=True,
    )
print(f"TOTAL live-shape BQ: pallas={tot_p:.2f}ms xla={tot_x:.2f}ms "
      f"speedup={tot_x/tot_p:.2f}x")
