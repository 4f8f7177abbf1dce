"""Isolate the center-subtract cost after the grouped gather.

gather_bench.py showed the flat gather itself is ~3ms at sa1, yet
stage_profile.py measured gather+subtract at 17.7ms — the lane-misaligned
slice update dominates. Variants:

  at_add    — g.at[..., :3].add(-center)            (stage_profile's form)
  slice_cat — concat(g[...,:3]-center, g[...,3:])   (production sample_and_group)
  pad_sub   — g - pad(center, C)                    (full-width subtract, no slicing)
  presub    — subtract center from the TABLE before gathering: impossible
              (per-query centers), but for xyz-only layers subtract AFTER via
              broadcast on a (..., 3) tensor directly (sa1 case)
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
    for name, (N, M, S, Cf, r) in {
        "sa1": (20480, 2048, 64, 0, 0.2),
        "sa2": (2048, 1024, 64, 128, 0.4),
        "sa3": (1024, 512, 64, 256, 0.8),
    }.items():
        xyz = jnp.asarray(rng.uniform(-4, 4, (B, N, 3)), jnp.float32)
        fi = jax.jit(lambda x: farthest_point_sample(M, x))(xyz)
        center = jax.jit(gather_point)(xyz, fi)
        idx, _ = jax.jit(lambda a, b: query_ball_point(r, S, a, b))(xyz, center)
        C = 3 + Cf
        pts = (jnp.concatenate(
            [xyz, jnp.asarray(rng.standard_normal((B, N, Cf)), jnp.float32)], -1)
            if Cf else xyz)

        def at_add(pts, idx, center):
            g = g_flat(pts, idx)
            return g.at[..., :3].add(-center[:, :, None, :])

        def slice_cat(pts, idx, center):
            g = g_flat(pts, idx)
            gx = g[..., :3] - center[:, :, None, :]
            return jnp.concatenate([gx, g[..., 3:]], axis=-1) if Cf else gx

        def pad_sub(pts, idx, center):
            g = g_flat(pts, idx)
            cpad = jnp.pad(center, ((0, 0), (0, 0), (0, C - 3)))
            return g - cpad[:, :, None, :]

        def gather_only(pts, idx, center):
            return g_flat(pts, idx)

        row = []
        for label, fn in [("gather", gather_only), ("at_add", at_add),
                          ("slice_cat", slice_cat), ("pad_sub", pad_sub)]:
            dt = chained_time(fn, pts, idx, center)
            row.append(f"{label}={dt*1e3:7.2f}ms")
        print(f"{name:4s} C={C:3d} | " + " ".join(row), flush=True)


if __name__ == "__main__":
    main()
