"""Algebraic center-subtract fusion for the SA layer.

(grouped - center) @ W == grouped @ W - center @ W[:3]  (exact algebra,
different rounding), which moves the subtract from the pathological
(B,M,S,3)-layout tensor onto the wide post-matmul activation. Measures the
old composition (slice/concat subtract, then matmul) against the fused form
at each SA-layer shape, checking numerical agreement.
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

B = 8
K_CHAIN = 20


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chained_time(fn, x0, *rest, iters=3, warmup=1):
    @jax.jit
    def loop(x, rest):
        def body(i, carry):
            x, acc = carry
            out = fn(x, *rest)
            s = jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
            return x + s * 1e-30, acc + s

        return lax.fori_loop(0, K_CHAIN, body, (x, jnp.float32(0.0)))

    for _ in range(warmup):
        _sync(loop(x0, rest))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(x0, rest)
    _sync(out)
    return (time.perf_counter() - t0) / (iters * K_CHAIN)


def g_flat(pts, idx):
    Bv, N, C = pts.shape
    _, M, S = idx.shape
    table = pts.reshape(Bv * N, C)
    off = (jnp.arange(Bv, dtype=jnp.int32) * N)[:, None, None]
    flat = (idx.astype(jnp.int32) + off).reshape(-1)
    return jnp.take(table, flat, axis=0).reshape(Bv, M, S, C)


def main():
    from votenet_tpu.ops import farthest_point_sample, gather_point, query_ball_point

    rng = np.random.RandomState(0)
    for name, (N, M, S, Cf, r, w0) in {
        "sa1": (20480, 2048, 64, 0, 0.2, 64),
        "sa2": (2048, 1024, 64, 128, 0.4, 128),
        "sa3": (1024, 512, 64, 256, 0.8, 128),
        "sa4": (512, 256, 64, 256, 1.2, 128),
        "prop": (1024, 256, 64, 256, 0.3, 128),
    }.items():
        xyz = jnp.asarray(rng.uniform(-4, 4, (B, N, 3)), jnp.float32)
        fi = jax.jit(lambda x, M=M: farthest_point_sample(M, x))(xyz)
        center = jax.jit(gather_point)(xyz, fi)
        idx, _ = jax.jit(lambda a, b, r=r: query_ball_point(r, S, a, b))(xyz, center)
        C = 3 + Cf
        pts = (jnp.concatenate(
            [xyz, jnp.asarray(rng.standard_normal((B, N, Cf)), jnp.float32)], -1)
            if Cf else xyz)
        W = jnp.asarray(rng.standard_normal((C, w0)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((w0,)) * 0.1, jnp.float32)

        def old(pts, idx, center, W, b):
            g = g_flat(pts, idx)
            gx = g[..., :3] - center[:, :, None, :]
            gall = jnp.concatenate([gx, g[..., 3:]], axis=-1) if Cf else gx
            h = jax.nn.relu(gall @ W + b)
            return jnp.max(h, axis=2)

        def fused(pts, idx, center, W, b):
            g = g_flat(pts, idx)
            corr = center @ W[:3]  # (B, M, w0)
            h = jax.nn.relu(g @ W - corr[:, :, None, :] + b)
            return jnp.max(h, axis=2)

        t_old = chained_time(old, pts, idx, center, W, b)
        t_new = chained_time(fused, pts, idx, center, W, b)
        a = np.asarray(jax.jit(old)(pts, idx, center, W, b))
        c = np.asarray(jax.jit(fused)(pts, idx, center, W, b))
        err = np.max(np.abs(a - c)) / (np.max(np.abs(a)) + 1e-9)
        print(f"{name:4s} C={C:3d} | old={t_old*1e3:7.2f}ms fused={t_new*1e3:7.2f}ms "
              f"({t_old/t_new:4.1f}x) rel-err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
