"""NMS / IoU-matrix stage attribution + formulation A/Bs (real chip).

The inference ablation (benchmarks/ablation_profile.py) puts NMS at ~4.2 ms
of a 29 ms forward at B=8 — the #2 sink after the ball query. This script
times the decomposition at the live shape (B=8, N=256 proposals):

  1. full nms3d (IoU matrix + Jacobi greedy fixpoint)
  2. box3d_iou_matrix alone
  3. candidate-vertex stage alone (points-in-quad + 16 edge intersections)
  4. the arctan2 angular stage alone
  5. A/B: pseudo-angle ordering (quadrant + ratio, no transcendentals —
     order-preserving monotone map of the angle)
  6. A/B: rank-reorder shoelace (one-hot contraction to rank order,
     cyclic shoelace) instead of the rank-adjacency cross-sum

Prints one line per stage. Correctness of A/B variants is checked against
the production method on the same boxes before timing.
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
N = 256
K = 20


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chained(fn, args, iters=3, warmup=2):
    @jax.jit
    def loop(a):
        def body(i, carry):
            out = fn(*carry[:-1])
            s = jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32)
            return (carry[0] + s * 1e-30,) + carry[1:-1] + (carry[-1] + s,)

        return lax.fori_loop(0, K, body, args + (jnp.float32(0.0),))

    for _ in range(warmup):
        _sync(loop(args))
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        out = loop(args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / K


def make_boxes(rng, b, n):
    """Random oriented boxes in the decode corner layout (top face 0-3)."""
    cx = rng.uniform(-4, 4, (b, n, 1))
    cz = rng.uniform(-4, 4, (b, n, 1))
    cy = rng.uniform(0, 2, (b, n, 1))
    l = rng.uniform(0.3, 1.5, (b, n, 1))
    w = rng.uniform(0.3, 1.5, (b, n, 1))
    h = rng.uniform(0.3, 1.5, (b, n, 1))
    a = rng.uniform(0, 2 * np.pi, (b, n, 1))
    dx = np.concatenate([l, l, -l, -l], -1) / 2
    dz = np.concatenate([w, -w, -w, w], -1) / 2
    rx = dx * np.cos(a) - dz * np.sin(a)
    rz = dx * np.sin(a) + dz * np.cos(a)
    top = np.stack([cx + rx, np.broadcast_to(cy + h / 2, rx.shape), cz + rz], -1)
    bot = np.stack([cx + rx, np.broadcast_to(cy - h / 2, rx.shape), cz + rz], -1)
    return np.concatenate([top, bot], axis=2).astype(np.float32)  # (b, n, 8, 3)


# ---------------------------------------------------------------- variants

def pseudo_angle(dy, dx):
    """Monotone [-2, 2) map of atan2(dy, dx) with no transcendentals."""
    denom = jnp.abs(dx) + jnp.abs(dy)
    r = dx / jnp.where(denom == 0, 1.0, denom)
    return jnp.where(dy >= 0, 1.0 - r, r - 3.0)  # increasing with angle


def area_pseudo(P, Q):
    """Production rank method with arctan2 replaced by pseudo-angle."""
    from votenet_tpu.ops import iou3d as I

    P, Q = jnp.broadcast_arrays(P, Q)
    p_in_q = I._points_in_quad(P, Q)
    q_in_p = I._points_in_quad(Q, P)
    inter_pts, inter_valid = I._edge_intersections(P, Q)
    pts = jnp.concatenate([P, Q, inter_pts], axis=-2)
    valid = jnp.concatenate([p_in_q, q_in_p, inter_valid], axis=-1)
    cnt = jnp.sum(valid, axis=-1)
    vf = valid[..., None].astype(pts.dtype)
    centroid = jnp.sum(pts * vf, axis=-2) / jnp.maximum(cnt, 1)[..., None]
    ang = pseudo_angle(
        pts[..., 1] - centroid[..., None, 1], pts[..., 0] - centroid[..., None, 0]
    )
    ang = jnp.where(valid, ang, jnp.inf)
    idx = lax.broadcasted_iota(jnp.int32, ang.shape, ang.ndim - 1)
    a_j = ang[..., :, None]
    a_i = ang[..., None, :]
    before = (a_j < a_i) | ((a_j == a_i) & (idx[..., :, None] < idx[..., None, :]))
    rank = jnp.sum(before & valid[..., :, None] & valid[..., None, :], axis=-2)
    nxt_rank = jnp.where(rank + 1 >= cnt[..., None], 0, rank + 1)
    adj = (
        valid[..., :, None]
        & valid[..., None, :]
        & (rank[..., None, :] == nxt_rank[..., :, None])
    )
    cross = (
        pts[..., :, None, 0] * pts[..., None, :, 1]
        - pts[..., None, :, 0] * pts[..., :, None, 1]
    )
    total = jnp.sum(jnp.where(adj, cross, 0.0), axis=(-1, -2))
    return jnp.where(cnt >= 3, 0.5 * jnp.abs(total), 0.0)


def area_rank_reorder(P, Q):
    """Rank method, but the shoelace runs over rank-REORDERED points (one
    one-hot contraction) instead of the (V, V) adjacency cross-sum."""
    from votenet_tpu.ops import iou3d as I

    P, Q = jnp.broadcast_arrays(P, Q)
    p_in_q = I._points_in_quad(P, Q)
    q_in_p = I._points_in_quad(Q, P)
    inter_pts, inter_valid = I._edge_intersections(P, Q)
    pts = jnp.concatenate([P, Q, inter_pts], axis=-2)
    valid = jnp.concatenate([p_in_q, q_in_p, inter_valid], axis=-1)
    cnt = jnp.sum(valid, axis=-1)
    vf = valid[..., None].astype(pts.dtype)
    centroid = jnp.sum(pts * vf, axis=-2) / jnp.maximum(cnt, 1)[..., None]
    ang = jnp.arctan2(
        pts[..., 1] - centroid[..., None, 1], pts[..., 0] - centroid[..., None, 0]
    )
    ang = jnp.where(valid, ang, jnp.inf)
    idx = lax.broadcasted_iota(jnp.int32, ang.shape, ang.ndim - 1)
    before = (ang[..., :, None] < ang[..., None, :]) | (
        (ang[..., :, None] == ang[..., None, :])
        & (idx[..., :, None] < idx[..., None, :])
    )
    rank = jnp.sum(before & valid[..., :, None] & valid[..., None, :], axis=-2)
    rank = jnp.where(valid, rank, pts.shape[-2] - 1)  # invalids to the back
    r_iota = lax.broadcasted_iota(jnp.int32, rank.shape, rank.ndim - 1)
    oh = (rank[..., None, :] == r_iota[..., :, None]).astype(pts.dtype)
    # per-operand precision: the one-hot is 0/1 (bf16-exact) but the point
    # operand must NOT be bf16-rounded by the TPU's default matmul pass —
    # exact coordinates or the area is wrong (same lesson as bq_precision)
    pts_r = jnp.einsum(
        "...ri,...id->...rd", oh, pts,
        precision=(lax.Precision.DEFAULT, lax.Precision.HIGHEST),
    )  # rank order
    in_cycle = r_iota < cnt[..., None]
    first = pts_r[..., :1, :]
    cyc = jnp.where(in_cycle[..., None], pts_r, first)
    x, z = cyc[..., 0], cyc[..., 1]
    xn, zn = jnp.roll(x, -1, axis=-1), jnp.roll(z, -1, axis=-1)
    area = 0.5 * jnp.abs(jnp.sum(x * zn - xn * z, axis=-1))
    return jnp.where(cnt >= 3, area, 0.0)


def iou_from_area(area_fn, c1, c2):
    from votenet_tpu.ops.iou3d import _EPS, quad_signed_area

    quad1 = jnp.stack([c1[..., :4, 0], c1[..., :4, 2]], axis=-1)
    quad2 = jnp.stack([c2[..., :4, 0], c2[..., :4, 2]], axis=-1)
    inter_area = area_fn(quad1, quad2)
    y1t, y1b = c1[..., 0, 1], c1[..., 4, 1]
    y2t, y2b = c2[..., 0, 1], c2[..., 4, 1]
    y_overlap = jnp.maximum(0.0, jnp.minimum(y1t, y2t) - jnp.maximum(y1b, y2b))
    inter_vol = inter_area * y_overlap
    vol1 = jnp.abs(quad_signed_area(quad1)) * (y1t - y1b)
    vol2 = jnp.abs(quad_signed_area(quad2)) * (y2t - y2b)
    denom = vol1 + vol2 - inter_vol
    return jnp.where(denom > _EPS, inter_vol / jnp.where(denom > _EPS, denom, 1.0), 0.0)


def main():
    from votenet_tpu.ops import iou3d as I
    from votenet_tpu.ops.nms3d import nms3d

    rng = np.random.RandomState(0)
    corners = jnp.asarray(make_boxes(rng, B, N))
    scores = jnp.asarray(rng.randn(B, N).astype(np.float32))
    obj = jnp.asarray(rng.randn(B, N, 2).astype(np.float32))

    # correctness of variants vs production (same candidate set; summation
    # order differs -> tolerance, not equality)
    want = np.asarray(I.box3d_iou_matrix(corners, corners))
    for name, fn in [("pseudo_angle", area_pseudo), ("rank_reorder", area_rank_reorder)]:
        got = np.asarray(jax.jit(
            lambda a, b: iou_from_area(fn, a[..., :, None, :, :], b[..., None, :, :, :])
        )(corners, corners))
        err = np.max(np.abs(got - want))
        n_flip = int(np.sum((got > 0.25) != (want > 0.25)))
        print(f"variant {name}: max |dIoU| {err:.2e}, thr-0.25 flips {n_flip}/{got.size}",
              flush=True)

    def stage_candidates(c):
        q1 = jnp.stack([c[..., :4, 0], c[..., :4, 2]], axis=-1)
        P = q1[..., :, None, :, :]
        Q = q1[..., None, :, :, :]
        P, Q = jnp.broadcast_arrays(P, Q)
        a = I._points_in_quad(P, Q)
        b = I._points_in_quad(Q, P)
        pts, v = I._edge_intersections(P, Q)
        return (jnp.sum(a) + jnp.sum(b) + jnp.sum(pts) + jnp.sum(v),)

    def stage_atan(c):
        q1 = jnp.stack([c[..., :4, 0], c[..., :4, 2]], axis=-1)
        P = q1[..., :, None, :, :]
        Q = q1[..., None, :, :, :]
        P, Q = jnp.broadcast_arrays(P, Q)
        pts = jnp.concatenate([P, Q, jnp.tile(P, (1,) * (P.ndim - 2) + (4, 1))], axis=-2)
        ang = jnp.arctan2(pts[..., 1], pts[..., 0])
        return (jnp.sum(ang),)

    rows = [
        ("nms3d full", lambda c: (nms3d(c, scores, obj, 0.25).astype(jnp.float32),)),
        ("iou_matrix", lambda c: (I.box3d_iou_matrix(c, c),)),
        ("iou_matrix pseudo", lambda c: (
            iou_from_area(area_pseudo, c[..., :, None, :, :], c[..., None, :, :, :]),)),
        ("iou_matrix reorder", lambda c: (
            iou_from_area(area_rank_reorder, c[..., :, None, :, :], c[..., None, :, :, :]),)),
        ("candidate stage", stage_candidates),
        ("atan2 stage", stage_atan),
    ]
    for name, fn in rows:
        dt = chained(fn, (corners,))
        print(f"{name:>20}: {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
