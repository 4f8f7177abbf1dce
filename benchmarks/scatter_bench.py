"""Microbenchmark: group_point VJP (scatter-add) strategies at model shapes.

The reference does this with atomicAdd (tf_grouping_g.cu:61-78); on TPU the
autodiff VJP of the gather lowers to an XLA scatter-add. Round-1 profiling
blamed this scatter for most of the fwd/bwd gap. Candidates measured here:

  xla      — jnp.take VJP (current production path)
  onehot   — destination one-hot matmul, scanned over update chunks (MXU)
  sort     — sort updates by destination, segment-sum over sorted runs

Shapes: (N dataset pts, M queries, S=64 slots, C channels) per SA layer with
the fused [xyz ‖ feat] gather widths of models/pointnet2.py.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 8
SHAPES = {
    "sa1": (20480, 2048, 64, 3),
    "sa2": (2048, 1024, 64, 131),
    "sa3": (1024, 512, 64, 259),
    "sa4": (512, 256, 64, 259),
    "prop": (1024, 256, 64, 259),
    # live train widths after coord-grad narrowing (grad_skip_prefix=3 drops
    # the xyz columns from the backbone backward; sa1 scatter disappears)
    "sa2n": (2048, 1024, 64, 128),
    "sa3n": (1024, 512, 64, 256),
    "sa4n": (512, 256, 64, 256),
}


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def scatter_xla(g, idx, N):
    """Transpose of the production flat-row gather (jnp.take VJP)."""
    Bv, M, S, C = g.shape

    def fwd(points):
        table = points.reshape(Bv * N, C)
        off = (jnp.arange(Bv, dtype=jnp.int32) * N)[:, None, None]
        flat = (idx.astype(jnp.int32) + off).reshape(-1)
        return jnp.take(table, flat, axis=0).reshape(Bv, M, S, C)

    zeros = jnp.zeros((Bv, N, C), g.dtype)
    return jax.vjp(fwd, zeros)[1](g)[0]


def scatter_onehot(g, idx, N, chunk=2048):
    """Σ_k onehot[idx_k, n] · g_k as a scan of bf16 MXU matmuls."""
    Bv, M, S, C = g.shape
    K = M * S
    gf = g.reshape(Bv, K, C).astype(jnp.bfloat16)
    idxf = idx.reshape(Bv, K)
    n_chunks = K // chunk

    def body(acc, args):
        ik, gk = args  # (B, chunk), (B, chunk, C)
        oh = jax.nn.one_hot(ik, N, dtype=jnp.bfloat16)
        acc = acc + jnp.einsum(
            "bkn,bkc->bnc", oh, gk, preferred_element_type=jnp.float32
        )
        return acc, None

    acc0 = jnp.zeros((Bv, N, C), jnp.float32)
    ik = idxf.reshape(Bv, n_chunks, chunk).transpose(1, 0, 2)
    gk = gf.reshape(Bv, n_chunks, chunk, C).transpose(1, 0, 2, 3)
    acc, _ = lax.scan(body, acc0, (ik, gk))
    return acc


def scatter_onehot_f32(g, idx, N, chunk=2048):
    """One-hot matmul keeping update values in f32 (exact products)."""
    Bv, M, S, C = g.shape
    K = M * S
    gf = g.reshape(Bv, K, C)
    idxf = idx.reshape(Bv, K)
    n_chunks = K // chunk

    def body(acc, args):
        ik, gk = args
        oh = jax.nn.one_hot(ik, N, dtype=jnp.float32)
        acc = acc + jnp.einsum(
            "bkn,bkc->bnc", oh, gk, preferred_element_type=jnp.float32
        )
        return acc, None

    acc0 = jnp.zeros((Bv, N, C), jnp.float32)
    ik = idxf.reshape(Bv, n_chunks, chunk).transpose(1, 0, 2)
    gk = gf.reshape(Bv, n_chunks, chunk, C).transpose(1, 0, 2, 3)
    acc, _ = lax.scan(body, acc0, (ik, gk))
    return acc


def scatter_onehot_hilo(g, idx, N, chunk=2048):
    """Two bf16 passes: g = hi + lo with hi=bf16(g); exact products to ~f32."""
    Bv, M, S, C = g.shape
    K = M * S
    gf = g.reshape(Bv, K, C)
    hi = gf.astype(jnp.bfloat16)
    lo = (gf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    idxf = idx.reshape(Bv, K)
    n_chunks = K // chunk

    def body(acc, args):
        ik, hk, lk = args
        oh = jax.nn.one_hot(ik, N, dtype=jnp.bfloat16)
        acc = acc + jnp.einsum(
            "bkn,bkc->bnc", oh, hk, preferred_element_type=jnp.float32
        ) + jnp.einsum(
            "bkn,bkc->bnc", oh, lk, preferred_element_type=jnp.float32
        )
        return acc, None

    acc0 = jnp.zeros((Bv, N, C), jnp.float32)
    ik = idxf.reshape(Bv, n_chunks, chunk).transpose(1, 0, 2)
    hk = hi.reshape(Bv, n_chunks, chunk, C).transpose(1, 0, 2, 3)
    lk = lo.reshape(Bv, n_chunks, chunk, C).transpose(1, 0, 2, 3)
    acc, _ = lax.scan(body, acc0, (ik, hk, lk))
    return acc


def scatter_sort(g, idx, N):
    """Sort-by-destination + segment-sum (jax.ops.segment_sum on sorted)."""
    Bv, M, S, C = g.shape
    K = M * S
    gf = g.reshape(Bv * K, C)
    off = (jnp.arange(Bv, dtype=jnp.int32) * N)[:, None]
    flat = (idx.reshape(Bv, K) + off).reshape(-1)
    order = jnp.argsort(flat)
    return jax.ops.segment_sum(
        gf[order], flat[order], num_segments=Bv * N, indices_are_sorted=True
    ).reshape(Bv, N, C)


def main():
    from votenet_tpu.ops import query_ball_point
    from votenet_tpu.ops.grouping import scatter_add_mxu
    from votenet_tpu.ops.pallas.scatter import scatter_add_pallas

    rng = np.random.RandomState(0)
    for name, (N, M, S, C) in SHAPES.items():
        xyz = jnp.asarray(rng.uniform(-4, 4, (B, N, 3)), jnp.float32)
        q = xyz[:, :M]
        radius = {20480: 0.2, 2048: 0.4, 1024: 0.8, 512: 1.2}[N]
        idx, _ = jax.jit(lambda a, b: query_ball_point(radius, S, a, b))(xyz, q)
        idx = jax.device_get(idx)
        idx = jnp.asarray(idx)
        g = jnp.asarray(rng.standard_normal((B, M, S, C)), jnp.float32)

        rows = []
        for label, fn in [
            ("xla", functools.partial(scatter_xla, N=N)),
            ("onehot", functools.partial(scatter_onehot, N=N)),
            ("oh_f32", functools.partial(scatter_onehot_f32, N=N)),
            ("oh_hilo", functools.partial(scatter_onehot_hilo, N=N)),
            # production: f32 one-hot with per-operand precision — the update
            # operand at HIGHEST (multi-pass, exact f32 products), the one-hot
            # at DEFAULT (0/1 is bf16-exact). ADVICE r2: plain DEFAULT
            # bf16-truncated every gradient update on TPU.
            ("oh_hp", functools.partial(scatter_add_mxu, num_rows=N)),
            # Pallas VMEM-resident one-hot kernel (ops/pallas/scatter.py):
            # the one-hot never round-trips HBM. pl3 = exact (hi/mid/lo bf16
            # split covering the f32 mantissa), pl1 = single bf16 pass.
            ("pl3", functools.partial(scatter_add_pallas, num_rows=N, passes=3)),
            ("pl1", functools.partial(scatter_add_pallas, num_rows=N, passes=1)),
        ]:
            jit_fn = jax.jit(lambda g, idx, fn=fn: fn(g, idx))
            try:
                dt = timeit(lambda: jit_fn(g, idx))
                rows.append((label, dt * 1e3))
            except Exception as e:  # noqa: BLE001
                rows.append((label, float("nan")))
                print(f"  {label} failed: {type(e).__name__}: {e}", file=sys.stderr)
        # numerical agreement check (vs xla, f32 tolerance for bf16 paths)
        ref = np.asarray(jax.jit(lambda g, i: scatter_xla(g, i, N))(g, idx))
        oh = np.asarray(jax.jit(lambda g, i: scatter_onehot(g, i, N))(g, idx))
        hp = np.asarray(jax.jit(lambda g, i: scatter_add_mxu(g, i, N))(g, idx))
        err = np.max(np.abs(ref - oh)) / (np.max(np.abs(ref)) + 1e-9)
        err_hp = np.max(np.abs(ref - hp)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"{name:5s} N={N:6d} M={M:5d} C={C:4d} | "
              + " ".join(f"{l}={t:8.3f}ms" for l, t in rows)
              + f" | onehot rel-err {err:.2e} | oh_hp rel-err {err_hp:.2e}")


if __name__ == "__main__":
    main()
