"""Prototype: Pallas ball query that ALSO emits grouped xyz (VERDICT r4 #2).

The verdict's pitch: the BQ kernel already holds every point-coordinate
plane in VMEM, so emitting grouped_xyz (B, M, S, 3) from the kernel should
save the downstream `group_point(xyz, idx)` gather's HBM traffic.

The catch this prototype quantifies: inside the kernel the only vectorized
way to turn per-slot indices into per-slot coordinate VALUES is the same
one-hot contraction the extractor uses — and a value gather by one-hot
matmul costs M*S*N MACs per coordinate plane (the chunk one-hot (Mt,S,nc)
contracted against (nc,128) planes), where the hit test itself is only
M*N*3. Exactness (bit-parity with the f32 gather) needs the f32 planes
split into 3 bf16 terms (hi/mid/lo — bf16x3 covers the 24-bit mantissa),
so the emission adds 9 plane-gathers ~= 4.5x the extractor's existing MXU
work (the sel + rank matmuls). The XLA gather it replaces reads only
~M*S*12 bytes of HBM. This script measures both sides of that trade at the
live sa1/sa2 shapes and checks bit-parity of idx/cnt/grouped_xyz.

  python benchmarks/bq_emit_xyz_proto.py          # on the TPU
  BQPROTO_INTERPRET=1 python ... (CPU parity-only smoke, tiny shapes)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from votenet_tpu.ops.pallas.ballquery import _LANES, pick_tile

INTERPRET = os.environ.get("BQPROTO_INTERPRET", "") == "1"


def _bq_emit_kernel(
    radius2, nsample, n_chunk_steps, ch,
    x_ref, y_ref, z_ref,        # (1, nc, 128) f32 point planes
    qx_ref, qy_ref, qz_ref,     # (1, Mt, 1, 1) f32 query planes
    tri_nc_ref, tri_c_ref,      # triangular-ones (bf16)
    pa_ref, pb_ref, pc_ref,     # (nc, 3*128) bf16 per split term:
                                # [x_t | y_t | z_t] 128-lane planes
    idx_ref, cnt_ref,           # (1, Mt, S) i32, (1, Mt, 1) i32
    gx_ref, gy_ref, gz_ref,     # (1, Mt, S) f32 grouped coordinates
    hit_ref,                    # (Mt, nc, 128) bf16 scratch
):
    """Production extraction (ops/pallas/ballquery.py::_bq_kernel) + in-kernel
    grouped-xyz emission + in-kernel reference finalization (fill with first
    hit, empty ball -> point 0)."""
    Mt = qx_ref.shape[1]
    nc = x_ref.shape[1]
    S = idx_ref.shape[2]
    qx, qy, qz = qx_ref[0], qy_ref[0], qz_ref[0]
    r2 = jnp.float32(radius2)

    def d2_pass(c, _):
        sl = pl.ds(c * ch, ch)
        dx = qx - x_ref[:, sl, :]
        dy = qy - y_ref[:, sl, :]
        dz = qz - z_ref[:, sl, :]
        d2 = dx * dx + dy * dy + dz * dz
        hit_ref[:, sl, :] = jnp.where(d2 < r2, 1.0, 0.0).astype(jnp.bfloat16)
        return 0

    lax.fori_loop(0, n_chunk_steps, d2_pass, 0)

    hit3 = hit_ref[:]
    counts = jnp.sum(hit3, axis=2)
    cum = lax.dot_general(
        counts, tri_nc_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    total = jnp.sum(counts.astype(jnp.float32), axis=1, keepdims=True)

    s_iota = lax.broadcasted_iota(jnp.int32, (1, S, 1), 1).astype(jnp.float32)
    cum3 = cum[:, None, :]
    mk = jnp.where(cum3 <= s_iota, 1.0, 0.0)
    c_s = jnp.minimum(jnp.sum(mk, axis=2), nc - 1)
    base_s = jnp.max(mk * cum3, axis=2)

    c_iota = lax.broadcasted_iota(jnp.int32, (Mt, S, nc), 2).astype(jnp.float32)
    oh = jnp.where(c_iota == c_s[:, :, None], 1.0, 0.0).astype(jnp.bfloat16)
    sel = lax.dot_general(
        oh, hit3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    sel_b = sel.astype(jnp.bfloat16)
    lr = lax.dot_general(
        sel_b, tri_c_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t_s = s_iota + 1.0 - base_s[:, :, None]
    lane_iota = lax.broadcasted_iota(jnp.int32, (Mt, S, _LANES), 2).astype(
        jnp.float32
    )
    hitmask = (lr == t_s) & (sel > 0.5)  # (Mt, S, 128) slot one-hot
    is_t = jnp.where(hitmask, lane_iota, 0.0)
    lane = jnp.sum(is_t, axis=2)

    idx_raw = (c_s * _LANES + lane).astype(jnp.int32)  # pre-finalize
    cnt = jnp.minimum(total, jnp.float32(nsample)).astype(jnp.int32)

    # ---- grouped-xyz emission: one one-hot contraction per bf16 term
    # (3 terms x [x|y|z] packed 384-lane operand), then lane selection.
    # Every step is exact: bf16 one-hot x bf16 split-term products are
    # exact in the f32 MXU accumulator, one-hot rows add nothing, and
    # hi+mid+lo reassembles the f32 coordinate bit-exactly. ----
    gx = jnp.zeros((Mt, S), jnp.float32)
    gy = jnp.zeros((Mt, S), jnp.float32)
    gz = jnp.zeros((Mt, S), jnp.float32)
    for term_ref in (pa_ref, pb_ref, pc_ref):
        g3 = lax.dot_general(
            oh, term_ref[0],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Mt, S, 384): chosen chunk's [x_t | y_t | z_t] planes per slot
        gx = gx + jnp.sum(
            jnp.where(hitmask, g3[:, :, 0 * _LANES:1 * _LANES], 0.0), axis=2)
        gy = gy + jnp.sum(
            jnp.where(hitmask, g3[:, :, 1 * _LANES:2 * _LANES], 0.0), axis=2)
        gz = gz + jnp.sum(
            jnp.where(hitmask, g3[:, :, 2 * _LANES:3 * _LANES], 0.0), axis=2)

    # ---- in-kernel reference finalization (grouping.finalize_first_k):
    # slots past the count repeat slot 0's value; empty ball -> point 0 ----
    s_col = lax.broadcasted_iota(jnp.int32, (Mt, S), 1).astype(jnp.float32)
    cntf = cnt.astype(jnp.float32)  # (Mt, 1)
    in_cnt = s_col < cntf
    empty = cntf == 0.0  # (Mt, 1)
    lane0 = lax.broadcasted_iota(jnp.int32, (1, _LANES), 1) == 0

    def first_point(ref):
        return jnp.sum(jnp.where(lane0, ref[0, :1, :], 0.0))

    def fin(v, plane0):
        v = jnp.where(in_cnt, v, v[:, :1])  # slot 0 = first hit
        return jnp.where(empty, plane0, v)

    idx_f = jnp.where(in_cnt, idx_raw.astype(jnp.float32),
                      idx_raw[:, :1].astype(jnp.float32))
    idx_ref[0] = jnp.where(empty, 0.0, idx_f).astype(jnp.int32)
    cnt_ref[0] = cnt
    gx_ref[0] = fin(gx, first_point(x_ref))
    gy_ref[0] = fin(gy, first_point(y_ref))
    gz_ref[0] = fin(gz, first_point(z_ref))


def _split3(p):
    """f32 plane -> (hi, mid, lo) bf16 with hi+mid+lo == p (bf16x3 split).

    The optimization barriers are LOAD-BEARING on TPU: XLA's bf16
    propagation folds the f32->bf16->f32 round trip to identity, which
    silently turns the residuals into zeros (first observed as "emitted
    grouped xyz == bf16(x) exactly" on hardware while interpret mode was
    bit-exact)."""
    hi = p.astype(jnp.bfloat16)
    r1 = p - lax.optimization_barrier(hi).astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - lax.optimization_barrier(mid).astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    return hi, mid, lo


@functools.partial(jax.jit, static_argnums=(0, 1))
def query_ball_point_emit_xyz(radius, nsample, xyz1, xyz2):
    """(B,N,3),(B,M,3) -> idx (B,M,S), cnt (B,M), grouped_xyz (B,M,S,3).

    Same selection semantics as the production kernel; grouped_xyz is
    bit-equal to group_point(xyz1, idx) (checked by main())."""
    xyz1 = lax.stop_gradient(xyz1.astype(jnp.float32))
    xyz2 = lax.stop_gradient(xyz2.astype(jnp.float32))
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    S = nsample

    nc0 = -(-N // _LANES)
    ch = 16 if nc0 >= 16 else nc0
    nc = -(-nc0 // ch) * ch
    Np = nc * _LANES
    # halve the production tile: the emission's (Mt, S, 384) f32 term
    # intermediates add ~2x the gather-stage VMEM
    Mt = max(8, pick_tile(M, nc, S, ch) // 2)
    Mp = -(-M // Mt) * Mt

    planes = jnp.transpose(xyz1, (2, 0, 1))
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, Np - N)), constant_values=1e9)
    planes = planes.reshape(3, B, nc, _LANES)
    qplanes = jnp.transpose(xyz2, (2, 0, 1))
    qplanes = jnp.pad(qplanes, ((0, 0), (0, 0), (0, Mp - M)))
    qplanes = qplanes.reshape(3, B, Mp, 1, 1)

    # one (B, nc, 3*128) [x_t | y_t | z_t] operand per split term
    terms = [_split3(planes[i]) for i in range(3)]  # [(hi,mid,lo)] per coord
    p_terms = [
        jnp.concatenate([terms[i][t] for i in range(3)], axis=-1)
        for t in range(3)
    ]

    iota = lax.broadcasted_iota(jnp.int32, (nc, nc), 0)
    jota = lax.broadcasted_iota(jnp.int32, (nc, nc), 1)
    tri_nc = jnp.where(iota <= jota, 1, 0).astype(jnp.bfloat16)
    iota_c = lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    jota_c = lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    tri_c = jnp.where(iota_c <= jota_c, 1, 0).astype(jnp.bfloat16)

    pspec = pl.BlockSpec((1, nc, _LANES), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, Mt, 1, 1), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec_nc = pl.BlockSpec((nc, nc), lambda b, i: (0, 0),
                            memory_space=pltpu.VMEM)
    tspec_c = pl.BlockSpec((_LANES, _LANES), lambda b, i: (0, 0),
                           memory_space=pltpu.VMEM)
    pterm_spec = pl.BlockSpec((1, nc, 3 * _LANES), lambda b, i: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, Mt, S), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)

    idx, cnt, gx, gy, gz = pl.pallas_call(
        functools.partial(_bq_emit_kernel, float(radius) ** 2, S, nc // ch, ch),
        grid=(B, Mp // Mt),
        in_specs=[pspec, pspec, pspec, qspec, qspec, qspec,
                  tspec_nc, tspec_c, pterm_spec, pterm_spec, pterm_spec],
        out_specs=(
            ospec,
            pl.BlockSpec((1, Mt, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            ospec, ospec, ospec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Mp, S), jnp.int32),
            jax.ShapeDtypeStruct((B, Mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, Mp, S), jnp.float32),
            jax.ShapeDtypeStruct((B, Mp, S), jnp.float32),
            jax.ShapeDtypeStruct((B, Mp, S), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((Mt, nc, _LANES), jnp.bfloat16)],
        interpret=INTERPRET,
    )(
        planes[0], planes[1], planes[2],
        qplanes[0], qplanes[1], qplanes[2],
        tri_nc, tri_c, p_terms[0], p_terms[1], p_terms[2],
    )
    gxyz = jnp.stack([gx, gy, gz], axis=-1)
    return idx[:, :M], cnt[:, :M, 0], gxyz[:, :M]


def main():
    from votenet_tpu.ops import group_point

    shapes = (
        [(2, 512, 128, 0.2, 8), (1, 384, 64, 0.8, 16)] if INTERPRET
        else [(8, 20480, 2048, 0.2, 64), (8, 2048, 1024, 0.4, 64)]
    )
    rng = np.random.RandomState(0)
    for B_, N, M, r, S in shapes:
        xyz = jnp.asarray(
            np.concatenate([
                rng.uniform(-4, 4, (B_, N // 2, 3)),
                rng.uniform(-0.5, 0.5, (B_, N - N // 2, 3))
                + rng.uniform(-3, 3, (B_, 1, 3)),
            ], axis=1), jnp.float32)
        q = xyz[:, :M]

        idx_e, cnt_e, gx_e = jax.block_until_ready(
            query_ball_point_emit_xyz(r, S, xyz, q))
        if INTERPRET:
            from votenet_tpu.ops.grouping import query_ball_point_dense
            from votenet_tpu.ops.dispatch import pallas_disabled

            with pallas_disabled():
                idx_p, cnt_p = query_ball_point_dense(r, S, xyz, q)
                gx_ref = group_point(xyz, idx_p)
        else:
            from votenet_tpu.ops.pallas.ballquery import query_ball_point_pallas

            idx_p, cnt_p = query_ball_point_pallas(r, S, xyz, q)
            gx_ref = group_point(xyz, idx_p)
        ok_idx = bool(jnp.all(idx_e == idx_p)) and bool(jnp.all(cnt_e == cnt_p))
        ok_gx = bool(jnp.all(gx_e == gx_ref))
        print(f"B={B_} N={N} M={M} r={r}: idx/cnt bit-equal={ok_idx}, "
              f"grouped_xyz bit-equal={ok_gx}", flush=True)
        assert ok_idx and ok_gx

        if not INTERPRET:
            def sync(x):
                np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

            def timeit(fn, iters=20):
                sync(fn()); sync(fn())
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn()
                sync(out)
                return (time.perf_counter() - t0) / iters

            t_split = timeit(lambda: group_point(
                xyz, query_ball_point_pallas(r, S, xyz, q)[0]))
            t_emit = timeit(lambda: query_ball_point_emit_xyz(r, S, xyz, q)[2])
            print(f"  kernel+XLA-gather {t_split*1e3:7.2f} ms | "
                  f"emit-in-kernel {t_emit*1e3:7.2f} ms "
                  f"({t_split/t_emit:5.3f}x)", flush=True)


if __name__ == "__main__":
    main()
