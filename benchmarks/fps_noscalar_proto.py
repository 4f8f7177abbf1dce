"""FPS row-wise kernel variant without the per-step scalar round trip
(VERDICT r4 #8 — the one parity-preserving FPS attempt for round 5).

The production row-wise kernel (ops/pallas/fps.py::_fps_rowwise_kernel)
extracts each step's selected-point coordinates by writing the argmax index
to SMEM and dynamically slicing the coordinate planes at the next step —
one vector->SMEM->scalar-core->dynamic-load round trip per sequential step,
suspected to dominate the ~1.3 us/step latency floor (ROADMAP #4:
"reduce-tree latency").

This variant never leaves vector registers: the selected point's
coordinates come from three extra masked-sum tree reductions per step
(mask = fidx == min(masked fidx), computed from the SAME md==best mask the
argmax already needs), and the output write broadcasts the (scalar-valued)
reduction results directly. Identical selection semantics (f32 arithmetic,
exact reductions, lowest-index ties) — bit-parity asserted against the
production kernel.

Trade measured here: +4 tree reductions vs -1 SMEM round trip -1 dynamic
sublane load per step.

  python benchmarks/fps_noscalar_proto.py           # on the TPU
  FPSPROTO_INTERPRET=1 python ...                   # CPU parity smoke
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

from votenet_tpu.ops.pallas.fps import _LANES, _SUBLANES

INTERPRET = os.environ.get("FPSPROTO_INTERPRET", "") == "1"


def _fps_rowwise_noscalar_kernel(
    npoint: int, n_valid: int, x_ref, y_ref, z_ref, o_ref, mind_ref, fidx_ref
):
    S, L = mind_ref.shape
    sub = lax.broadcasted_iota(jnp.int32, (S, L), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (S, L), 1)
    fidx_ref[:] = sub * L + lanes
    mind_ref[:] = jnp.where(
        fidx_ref[:] < n_valid, jnp.float32(1e38), jnp.float32(-1.0)
    )
    o_ref[:] = jnp.zeros_like(o_ref)  # slot 0 = seed index 0

    So, Lo = o_ref.shape[1], o_ref.shape[2]
    out_flat = (
        lax.broadcasted_iota(jnp.int32, (1, So, Lo), 1) * Lo
        + lax.broadcasted_iota(jnp.int32, (1, So, Lo), 2)
    )
    sentinel = jnp.int32(S * L)

    # seed coordinates: point 0 = (sublane 0, lane 0)
    seed_sel = (sub == 0) & (lanes == 0)
    x0 = jnp.sum(jnp.where(seed_sel, x_ref[0], 0.0))
    y0 = jnp.sum(jnp.where(seed_sel, y_ref[0], 0.0))
    z0 = jnp.sum(jnp.where(seed_sel, z_ref[0], 0.0))

    def body(j, carry):
        x1, y1, z1 = carry
        dx = x_ref[0] - x1
        dy = y_ref[0] - y1
        dz = z_ref[0] - z1
        d = dx * dx + dy * dy + dz * dz
        md = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = md
        best = jnp.max(md)
        # first-index tie-break, exactly as the production kernels
        nxt = jnp.min(jnp.where(md == best, fidx_ref[:], sentinel))
        o_ref[:] = jnp.where(out_flat == j, nxt, o_ref[:])
        # selected point's coordinates via one-hot masked sums — exact
        # (single nonzero summand), no SMEM/dynamic-slice round trip
        pick = fidx_ref[:] == nxt
        nx = jnp.sum(jnp.where(pick, x_ref[0], 0.0))
        ny = jnp.sum(jnp.where(pick, y_ref[0], 0.0))
        nz = jnp.sum(jnp.where(pick, z_ref[0], 0.0))
        return nx, ny, nz

    if npoint > 1:
        lax.fori_loop(1, npoint, body, (x0, y0, z0))


@functools.partial(jax.jit, static_argnums=(0, 2))
def fps_rowwise_noscalar(npoint: int, xyz: jnp.ndarray, interpret: bool = False):
    xyz = xyz.astype(jnp.float32)
    B, N, _ = xyz.shape
    S = -(-N // _LANES)
    S = -(-S // _SUBLANES) * _SUBLANES
    Np = S * _LANES
    So = -(-npoint // _LANES)
    npad = So * _LANES

    planes = jnp.transpose(xyz, (2, 0, 1))
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, Np - N)))
    planes = planes.reshape(3, B, S, _LANES)
    x, y, z = planes[0], planes[1], planes[2]

    bspec = pl.BlockSpec((1, S, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fps_rowwise_noscalar_kernel, npoint, N),
        grid=(B,),
        in_specs=[bspec, bspec, bspec],
        out_specs=pl.BlockSpec(
            (1, So, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, So, _LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((S, _LANES), jnp.float32),
            pltpu.VMEM((S, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(x, y, z)
    return lax.stop_gradient(out.reshape(B, npad)[:, :npoint])


def main():
    from votenet_tpu.ops.pallas.fps import (
        farthest_point_sample_pallas,
        farthest_point_sample_pallas_rowwise,
    )

    shapes = (
        [(1, 512, 64), (2, 384, 32)] if INTERPRET
        else [(1, 20480, 2048), (2, 20480, 2048), (8, 20480, 2048)]
    )
    rng = np.random.RandomState(0)
    for B, N, M in shapes:
        xyz = jnp.asarray(rng.uniform(-4, 4, (B, N, 3)), jnp.float32)
        a = jax.block_until_ready(
            fps_rowwise_noscalar(M, xyz, INTERPRET))
        b = jax.block_until_ready(
            farthest_point_sample_pallas_rowwise(M, xyz, INTERPRET))
        ok = bool(jnp.all(a == b))
        print(f"B={B} N={N} M={M}: bit-equal vs production rowwise = {ok}",
              flush=True)
        assert ok

        if not INTERPRET:
            def sync(o):
                np.asarray(o.ravel()[:1])

            def timeit(fn, iters=20):
                sync(fn()); sync(fn())
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn()
                sync(out)
                return (time.perf_counter() - t0) / iters

            t_old = timeit(lambda: farthest_point_sample_pallas_rowwise(M, xyz))
            t_new = timeit(lambda: fps_rowwise_noscalar(M, xyz))
            t_bat = timeit(lambda: farthest_point_sample_pallas(M, xyz))
            print(f"  rowwise(SMEM) {t_old*1e3:7.2f} ms | "
                  f"rowwise(noscalar) {t_new*1e3:7.2f} ms "
                  f"({t_old/t_new:5.3f}x) | batched {t_bat*1e3:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
