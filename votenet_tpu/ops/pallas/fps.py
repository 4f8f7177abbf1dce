"""Farthest-point sampling as a single Pallas TPU kernel.

The XLA fori_loop version (:func:`votenet_tpu.ops.sampling.farthest_point_sample`)
pays per-iteration fixed costs (HBM round trips + fusion dispatch) for each
of the npoint sequential steps — ~60us/step measured on v5e. This kernel
runs the ENTIRE selection loop inside one kernel with the coordinate planes
and the running min-distance cache resident in VMEM, the same state layout
the reference CUDA kernel keeps in shared memory (tf_sampling_g.cu:105-170),
but vectorized across the batch: batches ride the 8 sublanes, points ride
the lanes, so one loop step updates all batch rows at once.

Semantics identical to the XLA twin: seed = index 0, running min of squared
distances, argmax with lowest-index tie-breaking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANES = 8
_LANES = 128

# Largest batch routed to the row-wise kernel by the dispatcher (sampling.py).
# Below this the batched kernel idles sublanes. Measured crossover on v5e
# (benchmarks/fps_crossover.py, 20480->2048): B=1 4.44/2.68 ms, B=2
# 4.50/3.66, B=4 5.01/5.85 (batched/rowwise) -> rowwise wins through B=2.
ROWWISE_MAX_B = 2

# VMEM cap of the row-wise kernel: per program it holds one row's x/y/z
# input planes (double-buffered across the B-grid) plus the min-dist and
# index scratch planes, all (N/128, 128) f32/i32 — ~(3*2 + 2) * 4 = 36
# bytes/point against Mosaic's ~12 MB usable scope. The batched kernel's
# cap is 8x tighter (it holds 8 sublane rows per plane — see
# ops/common.py LARGE_N_THRESHOLD), so above that the dispatcher uses this
# kernel at ANY batch (grid over B): still vastly faster than the XLA
# fori_loop fallback. Verified compiled at N=262144 on v5e
# (benchmarks/tpu_kernel_checks.py).
ROWWISE_MAX_N = 262144


def _fps_kernel(npoint: int, n_valid: int, x_ref, y_ref, z_ref, o_ref, mind_ref):
    Bb, Np = x_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, (Bb, Np), 1)
    out_lane = lax.broadcasted_iota(jnp.int32, (Bb, o_ref.shape[1]), 1)
    # padded lanes get a permanently negative cache entry so they can never
    # win the argmax (real lanes always have mindist >= 0)
    mind_ref[:] = jnp.where(lane < n_valid, jnp.float32(1e38), jnp.float32(-1.0))
    o_ref[:] = jnp.zeros_like(o_ref)  # slot 0 = seed index 0

    def body(j, old):
        sel = lane == old  # (Bb, Np): one-hot of the last pick per row
        x1 = jnp.sum(jnp.where(sel, x_ref[:], 0.0), axis=1, keepdims=True)
        y1 = jnp.sum(jnp.where(sel, y_ref[:], 0.0), axis=1, keepdims=True)
        z1 = jnp.sum(jnp.where(sel, z_ref[:], 0.0), axis=1, keepdims=True)
        dx = x_ref[:] - x1
        dy = y_ref[:] - y1
        dz = z_ref[:] - z1
        d = dx * dx + dy * dy + dz * dz
        md = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = md
        best = jnp.max(md, axis=1, keepdims=True)
        cand = jnp.where(md == best, lane, Np)  # first-index tie-break
        nxt = jnp.min(cand, axis=1, keepdims=True).astype(jnp.int32)
        # dynamic single-lane stores need 128-alignment on TPU; a masked
        # full-row write of the (small) output block is cheap instead
        o_ref[:] = jnp.where(out_lane == j, nxt, o_ref[:])
        return nxt

    if npoint > 1:
        lax.fori_loop(1, npoint, body, jnp.zeros((Bb, 1), jnp.int32))


def _fps_rowwise_kernel(
    npoint: int, n_valid: int, x_ref, y_ref, z_ref, o_ref, mind_ref, fidx_ref, sel_ref
):
    """One batch row per grid program; points folded over (sublanes, lanes).

    The fold keeps all 8 sublanes busy at any batch size (the batched kernel
    above idles 7/8 of the VPU at B=1) and makes every reduction scalar-
    valued, so the selected index can round-trip through SMEM and the next
    center's coordinates come from one dynamic-sublane load + a (1, L)
    select instead of three masked full-row sums.
    """
    S, L = mind_ref.shape
    sub = lax.broadcasted_iota(jnp.int32, (S, L), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (S, L), 1)
    fidx_ref[:] = sub * L + lanes  # flat point index, cached across steps
    # padded slots can never win the argmax (real slots have mindist >= 0)
    mind_ref[:] = jnp.where(fidx_ref[:] < n_valid, jnp.float32(1e38), jnp.float32(-1.0))
    o_ref[:] = jnp.zeros_like(o_ref)  # slot 0 = seed index 0
    sel_ref[0, 0] = jnp.int32(0)

    So, Lo = o_ref.shape[1], o_ref.shape[2]
    out_flat = (
        lax.broadcasted_iota(jnp.int32, (1, So, Lo), 1) * Lo
        + lax.broadcasted_iota(jnp.int32, (1, So, Lo), 2)
    )
    lane1 = lax.broadcasted_iota(jnp.int32, (1, L), 1)
    sentinel = jnp.int32(S * L)

    def body(j, _):
        last = sel_ref[0, 0]
        r, c = last // L, last % L
        csel = lane1 == c
        x1 = jnp.sum(jnp.where(csel, x_ref[0, pl.ds(r, 1), :], 0.0))
        y1 = jnp.sum(jnp.where(csel, y_ref[0, pl.ds(r, 1), :], 0.0))
        z1 = jnp.sum(jnp.where(csel, z_ref[0, pl.ds(r, 1), :], 0.0))
        dx = x_ref[0] - x1
        dy = y_ref[0] - y1
        dz = z_ref[0] - z1
        d = dx * dx + dy * dy + dz * dz
        md = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = md
        best = jnp.max(md)
        # first-index tie-break, exactly as the batched kernel / XLA twin
        nxt = jnp.min(jnp.where(md == best, fidx_ref[:], sentinel))
        sel_ref[0, 0] = nxt
        o_ref[:] = jnp.where(out_flat == j, nxt, o_ref[:])
        return 0

    if npoint > 1:
        lax.fori_loop(1, npoint, body, 0)


@functools.partial(jax.jit, static_argnums=(0, 2))
def farthest_point_sample_pallas_rowwise(
    npoint: int, xyz: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Row-wise Pallas FPS: (B, N, 3) -> (B, npoint) int32; seed index 0.

    Identical semantics to :func:`farthest_point_sample_pallas` (same f32
    distance arithmetic, exact max/min reductions, lowest-index ties) in a
    per-batch-row layout that stays fully vectorized at small B — the
    serving-latency case (reference equivalent: single-scene inference,
    tf_sampling_g.cu:105-170 with one block per batch row).
    """
    xyz = xyz.astype(jnp.float32)
    B, N, _ = xyz.shape

    S = -(-N // _LANES)
    S = -(-S // _SUBLANES) * _SUBLANES  # sublane-fold, padded to full tiles
    Np = S * _LANES
    So = -(-npoint // _LANES)
    npad = So * _LANES

    planes = jnp.transpose(xyz, (2, 0, 1))  # (3, B, N)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, Np - N)))
    planes = planes.reshape(3, B, S, _LANES)
    x, y, z = planes[0], planes[1], planes[2]

    bspec = pl.BlockSpec((1, S, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fps_rowwise_kernel, npoint, N),
        grid=(B,),
        in_specs=[bspec, bspec, bspec],
        out_specs=pl.BlockSpec(
            (1, So, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, So, _LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((S, _LANES), jnp.float32),
            pltpu.VMEM((S, _LANES), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x, y, z)
    return lax.stop_gradient(out.reshape(B, npad)[:, :npoint])


@functools.partial(jax.jit, static_argnums=(0, 2))
def farthest_point_sample_pallas(
    npoint: int, xyz: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Pallas FPS: (B, N, 3) -> (B, npoint) int32; seed index 0.

    Batches ride the 8 sublanes. (A sublane-folded small-batch variant was
    measured a dead end — the loop is latency-bound, not width-bound: B=1
    5.8 vs 6.0 ms — and its fold=2 compiled lowering disagreed with
    interpret mode, so it was removed; see ROADMAP "measured dead ends".)
    """
    xyz = xyz.astype(jnp.float32)
    B, N, _ = xyz.shape

    Bp = -(-B // _SUBLANES) * _SUBLANES
    Np = -(-N // _LANES) * _LANES

    planes = jnp.transpose(xyz, (2, 0, 1))  # (3, B, N)
    planes = jnp.pad(planes, ((0, 0), (0, Bp - B), (0, Np - N)))
    x, y, z = planes[0], planes[1], planes[2]

    grid = (Bp // _SUBLANES,)
    bspec = pl.BlockSpec((_SUBLANES, Np), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint, N),
        grid=grid,
        in_specs=[bspec, bspec, bspec],
        out_specs=pl.BlockSpec(
            (_SUBLANES, npoint), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_SUBLANES, Np), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return lax.stop_gradient(out[:B])
