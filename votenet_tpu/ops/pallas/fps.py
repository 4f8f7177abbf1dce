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


def _fps_kernel_folded(npoint: int, n_valid: int, fold: int, x_ref, y_ref, z_ref, o_ref, mind_ref):
    """Small-batch variant: each batch row is FOLDED across ``fold``
    consecutive sublanes (global point index = fold_row * L + lane), so a
    B=1 call still uses all 8 sublanes of the VPU instead of 1.

    Group reductions/broadcasts combine the per-row partials with
    log2(fold) sublane rolls.
    """
    Bb, L = x_ref.shape  # Bb = 8 sublanes, L = lanes per fold row
    lane = lax.broadcasted_iota(jnp.int32, (Bb, L), 1)
    row = lax.broadcasted_iota(jnp.int32, (Bb, L), 0)
    sub = row % fold  # position within the fold group
    gidx = sub * L + lane  # global point index within the batch row
    out_lane = lax.broadcasted_iota(jnp.int32, (Bb, o_ref.shape[1]), 1)

    def group_combine(val, pick_larger, tie_idx=None):
        """Tree-combine (8,1) per-row partials within fold groups, then
        broadcast the group result back to every row of the group."""
        idx = tie_idx
        s = 1
        while s < fold:
            # pltpu.roll wants non-negative shifts: roll(-s) == roll(Bb - s)
            ov = pltpu.roll(val, Bb - s, axis=0)
            if idx is not None:
                oi = pltpu.roll(idx, Bb - s, axis=0)
            valid = (sub[:, :1] + s) < fold
            if pick_larger is None:  # sum
                val = val + jnp.where(valid, ov, 0.0)
            else:
                if idx is None:
                    better = valid & (ov > val)
                else:
                    better = valid & ((ov > val) | ((ov == val) & (oi < idx)))
                    idx = jnp.where(better, oi, idx)
                val = jnp.where(better, ov, val)
            s *= 2
        # broadcast row-0-of-group to the whole group
        s = 1
        while s < fold:
            ov = pltpu.roll(val, s, axis=0)
            take = sub[:, :1] >= s
            src_ok = (sub[:, :1] % (2 * s)) >= s  # copy from s rows above
            val = jnp.where(take & src_ok, ov, val)
            if idx is not None:
                oi = pltpu.roll(idx, s, axis=0)
                idx = jnp.where(take & src_ok, oi, idx)
            s *= 2
        return (val, idx) if tie_idx is not None else val

    mind_ref[:] = jnp.where(gidx < n_valid, jnp.float32(1e38), jnp.float32(-1.0))
    o_ref[:] = jnp.zeros_like(o_ref)

    def body(j, old):
        # old: (Bb, 1) — group-broadcast global index of the last pick
        sel = gidx == old
        x1 = group_combine(jnp.sum(jnp.where(sel, x_ref[:], 0.0), 1, keepdims=True), None)
        y1 = group_combine(jnp.sum(jnp.where(sel, y_ref[:], 0.0), 1, keepdims=True), None)
        z1 = group_combine(jnp.sum(jnp.where(sel, z_ref[:], 0.0), 1, keepdims=True), None)
        dx = x_ref[:] - x1
        dy = y_ref[:] - y1
        dz = z_ref[:] - z1
        d = dx * dx + dy * dy + dz * dz
        md = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = md
        row_best = jnp.max(md, axis=1, keepdims=True)  # (Bb, 1)
        row_cand = jnp.where(md == row_best, gidx, fold * L)
        row_idx = jnp.min(row_cand, axis=1, keepdims=True).astype(jnp.int32)
        best, nxt = group_combine(row_best, pick_larger=True, tie_idx=row_idx)
        # every row of a fold group writes the same value; rows of the same
        # group map to the same output row via out_row // fold handled by
        # writing only where the slot matches
        o_ref[:] = jnp.where(out_lane == j, nxt, o_ref[:])
        return nxt

    if npoint > 1:
        lax.fori_loop(1, npoint, body, jnp.zeros((Bb, 1), jnp.int32))


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def farthest_point_sample_pallas(
    npoint: int, xyz: jnp.ndarray, interpret: bool = False, fold_small_batch: bool = False
) -> jnp.ndarray:
    """Pallas FPS: (B, N, 3) -> (B, npoint) int32; seed index 0.

    Batches ride the 8 sublanes. ``fold_small_batch`` additionally folds a
    B in {1,2,4} batch row over 8/B sublanes to use the full VPU width; it
    is OFF by default: measured speedups are small (the loop is
    latency-bound, not width-bound: B=1 5.8 vs 6.0 ms) and the fold=2
    compiled lowering currently disagrees with interpret mode (a Mosaic
    sublane-roll issue — see ROADMAP).
    """
    xyz = xyz.astype(jnp.float32)
    B, N, _ = xyz.shape

    if fold_small_batch and B < _SUBLANES and _SUBLANES % B == 0:
        fold = _SUBLANES // B
        L = -(-N // (fold * _LANES)) * _LANES  # lanes per fold row
        Nf = fold * L
        planes = jnp.transpose(xyz, (2, 0, 1))  # (3, B, N)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, Nf - N)))
        # (3, B, fold, L) -> (3, B*fold, L): row r of batch b holds global
        # indices [r*L, (r+1)*L)
        planes = planes.reshape(3, B * fold, L)
        x, y, z = planes[0], planes[1], planes[2]
        out = pl.pallas_call(
            functools.partial(_fps_kernel_folded, npoint, N, fold),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((B * fold, L), lambda i: (0, 0), memory_space=pltpu.VMEM)
            ] * 3,
            out_specs=pl.BlockSpec(
                (B * fold, npoint), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B * fold, npoint), jnp.int32),
            scratch_shapes=[pltpu.VMEM((B * fold, L), jnp.float32)],
            interpret=interpret,
        )(x, y, z)
        # all fold rows of a group carry the same answer; take the first
        return lax.stop_gradient(out[::fold])

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
