"""Prototype: spatially-binned ball query (ROADMAP #3, VERDICT r2 #2).

The production hierarchical query computes the full (B, M, N) hit mask —
~671 MB bf16 at sa1 — and the roofline (DESIGN.md round-3) says it is pure
HBM traffic. This prototype restricts candidates to a 3x3 x/z-cell
neighborhood: points are bucketed into a fixed (gx*gz, pcap) index table,
queries into a (gx*gz, qcap) table, and each query cell runs the EXISTING
hierarchical first-k extractor (query_ball_point_dense) over only its 9
neighbor cells' points — (batch*cell) becomes the batch axis. Pair count
drops ~8x at sa1 geometry when the caps are tight.

NON-PARITY: candidates are scanned in cell-major order, not dataset index
order, so for over-full balls (more than nsample hits) the selected subset
and padding order differ from the reference. The hit SET for balls with
<= nsample hits is identical — unless a cell overflows its cap (points
drop; counted and reported). Real scenes cluster, so caps that are safe on
uniform data can overflow on real data — integration would need an
overflow-driven cap bump or a dense fallback. This is a candidate FAST
MODE, integration-gated on the measured win below.

  python benchmarks/binned_bq_proto.py
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

B = int(os.environ.get("BENCH_BATCH", "8"))


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chained_time(fn, x0, iters=3, warmup=1, K=10):
    @jax.jit
    def loop(x):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            s = jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
            return x + s * 1e-30, acc + s

        return lax.fori_loop(0, K, body, (x, jnp.float32(0.0)))

    for _ in range(warmup):
        _sync(loop(x0))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(x0)
    _sync(out)
    return (time.perf_counter() - t0) / (iters * K)


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 6, 7))
def query_ball_point_binned(
    radius: float,
    nsample: int,
    xyz1: jnp.ndarray,   # (B, N, 3) dataset
    xyz2: jnp.ndarray,   # (B, M, 3) queries
    gx: int = 24,
    gz: int = 24,
    pcap: int = 64,
    qcap: int = 16,
):
    """Binned fixed-radius query. Returns (idx, cnt, p_overflow, q_overflow)."""
    from votenet_tpu.ops.grouping import query_ball_point_dense

    f32 = jnp.float32
    xyz1 = xyz1.astype(f32)
    xyz2 = xyz2.astype(f32)
    Bv, N, _ = xyz1.shape
    M = xyz2.shape[1]
    ncell = gx * gz
    FAR = f32(1e9)

    # per-batch x/z bounding box of the dataset; cell size >= radius so a
    # 3x3 neighborhood geometrically covers every ball
    mn = jnp.min(xyz1, axis=1)  # (B, 3)
    mx = jnp.max(xyz1, axis=1)
    csx = jnp.maximum((mx[:, 0] - mn[:, 0]) / gx, radius) * (1 + 1e-6)
    csz = jnp.maximum((mx[:, 2] - mn[:, 2]) / gz, radius) * (1 + 1e-6)

    def cell_of(pts):
        cxi = jnp.clip(((pts[..., 0] - mn[:, None, 0]) / csx[:, None]).astype(jnp.int32), 0, gx - 1)
        czi = jnp.clip(((pts[..., 2] - mn[:, None, 2]) / csz[:, None]).astype(jnp.int32), 0, gz - 1)
        return cxi * gz + czi  # (B, n)

    pcell = cell_of(xyz1)  # (B, N)
    qcell = cell_of(xyz2)  # (B, M)

    def build_table(cells, n_items, cap):
        """(B, n_items) cell ids -> (B, ncell, cap) item-index table (-1 =
        empty). Rank within a cell follows ITEM INDEX order (stable sort)."""
        order = jnp.argsort(cells, axis=1, stable=True).astype(jnp.int32)
        sorted_cells = jnp.take_along_axis(cells, order, axis=1)
        start = jax.vmap(lambda sc: jnp.searchsorted(sc, sc, side="left"))(sorted_cells)
        rank = jnp.arange(n_items, dtype=jnp.int32)[None, :] - start.astype(jnp.int32)
        overflow = jnp.sum(rank >= cap)
        dest = jnp.where(rank < cap, sorted_cells * cap + rank, ncell * cap)
        table = jnp.full((Bv, ncell * cap + 1), -1, jnp.int32)
        table = jax.vmap(lambda t, d, v: t.at[d].set(v))(table, dest, order)
        return table[:, : ncell * cap].reshape(Bv, ncell, cap), overflow

    ptable, p_over = build_table(pcell, N, pcap)   # (B, ncell, pcap)
    qtable, q_over = build_table(qcell, M, qcap)   # (B, ncell, qcap)

    # 3x3 neighborhood candidate ids per cell: (B, ncell, 9*pcap)
    cell_ids = jnp.arange(ncell, dtype=jnp.int32)
    cx, cz = cell_ids // gz, cell_ids % gz
    neigh = []
    for dx in (-1, 0, 1):
        for dz in (-1, 0, 1):
            # out-of-grid neighbors -> own cell, then DEDUP by marking
            # duplicates invalid (border cells would otherwise repeat points)
            valid = ((cx + dx >= 0) & (cx + dx < gx) & (cz + dz >= 0) & (cz + dz < gz))
            nid = jnp.where(valid, jnp.clip(cx + dx, 0, gx - 1) * gz + jnp.clip(cz + dz, 0, gz - 1), -1)
            neigh.append(nid)
    neigh = jnp.stack(neigh, axis=1)  # (ncell, 9), -1 = no such neighbor

    cand = jnp.where(
        (neigh >= 0)[None, :, :, None],
        jnp.take(ptable, jnp.maximum(neigh, 0).reshape(-1), axis=1).reshape(
            Bv, ncell, 9, pcap
        ),
        -1,
    ).reshape(Bv, ncell, 9 * pcap)
    cand_s = jnp.maximum(cand, 0)

    def gather_pts(src, idx_):  # (B, n, 3), (B, X) -> (B, X, 3)
        tab = src.reshape(Bv * src.shape[1], 3)
        off = (jnp.arange(Bv, dtype=jnp.int32) * src.shape[1])[:, None]
        return jnp.take(tab, (idx_ + off).reshape(-1), axis=0).reshape(
            Bv, idx_.shape[1], 3
        )

    # invalid candidates / queries get FAR coordinates: they can never hit
    cand_xyz = jnp.where(
        (cand >= 0).reshape(Bv, -1)[..., None],
        gather_pts(xyz1, cand_s.reshape(Bv, -1)),
        FAR,
    ).reshape(Bv * ncell, 9 * pcap, 3)
    q_valid = qtable >= 0
    q_s = jnp.maximum(qtable, 0)
    q_xyz = jnp.where(
        q_valid.reshape(Bv, -1)[..., None],
        gather_pts(xyz2, q_s.reshape(Bv, -1)),
        -FAR,  # far from the FAR candidates too
    ).reshape(Bv * ncell, qcap, 3)

    # the production first-k extractor, batched over (batch * cell)
    lidx, lcnt = query_ball_point_dense(radius, nsample, cand_xyz, q_xyz)
    # map local candidate slots -> original dataset indices
    flat_cand = cand_s.reshape(Bv * ncell, 9 * pcap)
    gidx = jnp.take_along_axis(
        flat_cand, lidx.reshape(Bv * ncell, qcap * nsample), axis=1
    ).reshape(Bv, ncell * qcap, nsample)

    # scatter per-cell results back to query order (invalid slots dropped)
    flat_q = jnp.where(q_valid, q_s, M).reshape(Bv, -1)  # M = drop slot
    out_idx = jnp.zeros((Bv, M, nsample), jnp.int32)
    out_cnt = jnp.zeros((Bv, M), jnp.int32)
    out_idx = jax.vmap(lambda o, d, v: o.at[d].set(v, mode="drop"))(
        out_idx, flat_q, gidx
    )
    out_cnt = jax.vmap(lambda o, d, v: o.at[d].set(v, mode="drop"))(
        out_cnt, flat_q, lcnt.reshape(Bv, -1)
    )

    # reference padding semantics (first hit repeated; empty -> 0)
    s_iota = jnp.arange(nsample, dtype=jnp.int32)
    first_hit = out_idx[..., :1]
    out_idx = jnp.where(s_iota[None, None, :] < out_cnt[..., None], out_idx, first_hit)
    out_idx = jnp.where(out_cnt[..., None] > 0, out_idx, 0)
    return out_idx, out_cnt, p_over, q_over


def check_and_time(radius, nsample, xyz, queries, label, **grid):
    from votenet_tpu.ops.grouping import query_ball_point_dense

    idx_ref, cnt_ref = jax.jit(
        lambda a, b: query_ball_point_dense(radius, nsample, a, b)
    )(xyz, queries)
    idx_b, cnt_b, p_over, q_over = query_ball_point_binned(
        radius, nsample, xyz, queries, **grid
    )
    cnt_ref, cnt_b = np.asarray(cnt_ref), np.asarray(cnt_b)
    idx_ref, idx_b = np.asarray(idx_ref), np.asarray(idx_b)
    same_cnt = (cnt_ref == cnt_b).mean()
    agree = checked = 0
    Bv, M = cnt_ref.shape
    for b in range(Bv):
        for m in range(0, M, 97):
            if cnt_ref[b, m] >= nsample:
                continue
            k = cnt_ref[b, m]
            checked += 1
            if set(idx_ref[b, m, :k]) == set(idx_b[b, m, :cnt_b[b, m]]):
                agree += 1
    print(f"{label}: overflow p={int(p_over)} q={int(q_over)} | "
          f"cnt agree {same_cnt:.4f} | set agree {agree}/{checked}", flush=True)

    M_ = queries.shape[1]
    t_ref = chained_time(
        lambda x: query_ball_point_dense(radius, nsample, x, x[:, :M_]), xyz
    )
    t_bin = chained_time(
        lambda x: query_ball_point_binned(radius, nsample, x, x[:, :M_], **grid)[:2],
        xyz,
    )
    print(f"{label}: dense {t_ref*1e3:.2f} ms  binned {t_bin*1e3:.2f} ms "
          f"({t_ref/t_bin:.2f}x)", flush=True)


def main():
    rng = np.random.RandomState(0)
    # sa1 geometry: uniform room-scale cloud (r=0.2, 20480 -> 2048, K=64)
    xyz = jnp.asarray(rng.uniform(-4, 4, (B, 20480, 3)), jnp.float32)
    check_and_time(0.2, 64, xyz, xyz[:, :2048], "sa1-uniform",
                   gx=24, gz=24, pcap=64, qcap=16)
    # clustered variant (real scenes cluster on surfaces): 64 gaussian blobs
    centers = rng.uniform(-4, 4, (B, 64, 3))
    pts = centers[:, rng.randint(0, 64, 20480), :] + rng.randn(B, 20480, 3) * 0.3
    xyz_c = jnp.asarray(pts, jnp.float32)
    check_and_time(0.2, 64, xyz_c, xyz_c[:, :2048], "sa1-clustered",
                   gx=24, gz=24, pcap=64, qcap=16)
    check_and_time(0.2, 64, xyz_c, xyz_c[:, :2048], "sa1-clustered-cap256",
                   gx=24, gz=24, pcap=256, qcap=32)


if __name__ == "__main__":
    main()
