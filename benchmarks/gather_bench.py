"""Gather formulation shoot-out at SA-layer shapes.

group_point is the single hottest op of the forward pass (stage_profile.py:
17.7ms at sa1, ~35ms total) — XLA's row-gather runs far below HBM bandwidth.
Candidates:

  flat      — jnp.take on a (B*N, C) table (current production)
  tal       — batched take_along_axis
  onehot    — MXU one-hot matmul gather (bf16)
  lanegather— gather along the minor (lane) axis of a (C, B*N) table
  dsloop    — vmap'd dynamic-slice... not expressible for random rows; skipped
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
SHAPES = {
    "sa1": (20480, 2048, 64, 3),
    "sa2": (2048, 1024, 64, 131),
    "sa3": (1024, 512, 64, 259),
    "sa4": (512, 256, 64, 259),
    "prop": (1024, 256, 64, 259),
}


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


def g_tal(pts, idx):
    Bv, N, C = pts.shape
    _, M, S = idx.shape
    flat = idx.reshape(Bv, M * S, 1)
    out = jnp.take_along_axis(pts, jnp.broadcast_to(flat, (Bv, M * S, C)), axis=1)
    return out.reshape(Bv, M, S, C)


def g_onehot(pts, idx, chunk=4096):
    Bv, N, C = pts.shape
    _, M, S = idx.shape
    K = M * S
    idxf = idx.reshape(Bv, K)
    p16 = pts.astype(jnp.bfloat16)
    n_chunks = K // chunk

    def body(_, args):
        ik = args  # (B, chunk)
        oh = jax.nn.one_hot(ik, N, dtype=jnp.bfloat16)
        return None, jnp.einsum("bkn,bnc->bkc", oh, p16,
                                preferred_element_type=jnp.float32)

    ik = idxf.reshape(Bv, n_chunks, chunk).transpose(1, 0, 2)
    _, out = lax.scan(body, None, ik)  # (nc, B, chunk, C)
    return out.transpose(1, 0, 2, 3).reshape(Bv, M, S, C)


def g_lane(pts, idx):
    Bv, N, C = pts.shape
    _, M, S = idx.shape
    table = pts.reshape(Bv * N, C).T  # (C, B*N)
    off = (jnp.arange(Bv, dtype=jnp.int32) * N)[:, None, None]
    flat = (idx.astype(jnp.int32) + off).reshape(-1)
    out = jnp.take(table, flat, axis=1)  # (C, B*M*S)
    return out.T.reshape(Bv, M, S, C)


def main():
    rng = np.random.RandomState(0)
    for name, (N, M, S, C) in SHAPES.items():
        pts = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        idx = jnp.asarray(rng.randint(0, N, (B, M, S)), jnp.int32)
        row = []
        for label, fn in [("flat", g_flat), ("tal", g_tal),
                          ("onehot", g_onehot), ("lane", g_lane)]:
            try:
                dt = chained_time(fn, pts, idx)
                row.append(f"{label}={dt*1e3:7.2f}ms")
            except Exception as e:  # noqa: BLE001
                row.append(f"{label}=ERR({type(e).__name__})")
        out_mb = B * M * S * C * 4 / 1e6
        print(f"{name:5s} N={N:6d} C={C:4d} out={out_mb:6.1f}MB | " + " ".join(row),
              flush=True)


if __name__ == "__main__":
    main()
