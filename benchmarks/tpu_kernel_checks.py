"""Compiled-Mosaic parity checks for the Pallas kernels, run ON TPU.

The pytest suite runs on CPU and exercises the kernels in interpret mode
only (tests/conftest.py); Mosaic's *compiled* lowering can disagree with
interpret mode (a sublane-folded FPS variant was removed in round 1 for
exactly that). This script re-runs the oracle parity checks against the
compiled kernels on real hardware — run it after any kernel change or
jax/libtpu upgrade:

  python benchmarks/tpu_kernel_checks.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import numpy as np


def main():
    import jax

    import oracles
    from votenet_tpu.ops.pallas.fps import (
        farthest_point_sample_pallas,
        farthest_point_sample_pallas_rowwise,
    )

    assert jax.default_backend() != "cpu", (
        "this check must run on TPU (the CPU/interpret path is covered by pytest)"
    )
    rng = np.random.RandomState(0)
    shapes = [
        (1, 64, 1), (2, 128, 32), (3, 300, 64), (8, 512, 128),
        (5, 1111, 97), (1, 20480, 2048), (8, 20480, 2048),
    ]
    for kernel, name in (
        (farthest_point_sample_pallas, "batched"),
        (farthest_point_sample_pallas_rowwise, "rowwise"),
    ):
        for B, N, m in shapes:
            xyz = rng.randn(B, N, 3).astype(np.float32)
            got = np.asarray(kernel(m, xyz))
            want = oracles.fps_oracle(m, xyz)
            np.testing.assert_array_equal(got, want)
            print(f"{name} compiled ok  B={B} N={N} m={m}", flush=True)

    # the row-wise kernel's large-N regime (beyond the batched kernel's VMEM
    # cap, up to ROWWISE_MAX_N — the dispatcher routes ANY batch here)
    for B, N, m in [(2, 163840, 64), (4, 163840, 32), (1, 262144, 32)]:
        xyz = rng.randn(B, N, 3).astype(np.float32)
        got = np.asarray(farthest_point_sample_pallas_rowwise(m, xyz))
        want = oracles.fps_oracle(m, xyz)
        np.testing.assert_array_equal(got, want)
        print(f"rowwise large-N compiled ok  B={B} N={N} m={m}", flush=True)

    # gradient-scatter exactness ON TPU: the "exact" mode must match an f64
    # host accumulation to f32 roundoff (ADVICE r2: DEFAULT-precision TPU
    # einsums bf16-truncate the update values — CPU tests cannot catch this)
    import jax.numpy as jnp

    from votenet_tpu.ops import dispatch
    from votenet_tpu.ops.grouping import scatter_add_mxu

    B, M, S, C, N = 4, 128, 16, 37, 256
    g = rng.randn(B, M, S, C).astype(np.float32)
    idx = rng.randint(0, N, (B, M, S)).astype(np.int32)
    want = np.zeros((B, N, C), np.float64)
    for b in range(B):
        np.add.at(want[b], idx[b].reshape(-1), g[b].reshape(-1, C).astype(np.float64))
    assert dispatch.scatter_precision() == "exact"
    got = np.asarray(jax.jit(
        lambda g, i: scatter_add_mxu(g, i, N)
    )(jnp.asarray(g), jnp.asarray(idx)))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 1e-5, f"exact scatter rel-err {err:.2e} on TPU"
    print(f"scatter exact-mode compiled ok  rel-err {err:.2e}", flush=True)

    # Pallas VMEM scatter, compiled: exact (3-pass) must match the f64 oracle
    # to f32 roundoff at every live narrowed shape; fast (1-pass) to bf16
    # rounding. Also exercises the chunk chooser's VMEM model on hardware.
    from votenet_tpu.ops.grouping import _pallas_scatter_chunk
    from votenet_tpu.ops.pallas.scatter import scatter_add_pallas

    for (Bv, Mv, Sv, Cv, Nv) in [
        (8, 1024, 64, 128, 2048),   # sa2 narrowed
        (8, 512, 64, 256, 1024),    # sa3 narrowed
        (8, 256, 64, 259, 1024),    # proposal (coord grad live)
        (2, 20, 5, 7, 40),          # unaligned smoke
    ]:
        g = rng.randn(Bv, Mv, Sv, Cv).astype(np.float32)
        idx = rng.randint(0, Nv, (Bv, Mv, Sv)).astype(np.int32)
        want = np.zeros((Bv, Nv, Cv), np.float64)
        for b in range(Bv):
            np.add.at(want[b], idx[b].reshape(-1), g[b].reshape(-1, Cv).astype(np.float64))
        kt = _pallas_scatter_chunk(Bv, Mv * Sv, Nv, Cv, 3)
        assert kt is not None, f"chunk chooser rejected N={Nv} C={Cv}"
        got = np.asarray(scatter_add_pallas(jnp.asarray(g), jnp.asarray(idx), Nv, passes=3, chunk=kt))
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert err < 1e-5, f"pallas exact rel-err {err:.2e} at N={Nv} C={Cv}"
        got1 = np.asarray(scatter_add_pallas(jnp.asarray(g), jnp.asarray(idx), Nv, passes=1, chunk=kt))
        err1 = np.max(np.abs(got1 - want)) / (np.max(np.abs(want)) + 1e-9)
        assert err1 < 3e-2, f"pallas fast rel-err {err1:.2e} at N={Nv} C={Cv}"
        print(f"pallas scatter compiled ok  N={Nv} C={Cv} kt={kt} "
              f"exact {err:.2e} fast {err1:.2e}", flush=True)
    # the sa1 shape must be rejected by the VMEM model (compiled OOM otherwise)
    assert _pallas_scatter_chunk(8, 2048 * 64, 20480, 3, 3) is None

    # ball query, exact mode, ON TPU: bit-identical indices AND counts vs
    # the exact-difference-form oracle at every live model shape, on
    # clustered clouds (the worst case for boundary density). This is what
    # "exact" promises — the DEFAULT-precision einsum bf16-rounds the
    # coordinate operands on TPU (cm-scale band, 35% sa1 idx flips), which
    # CPU tests cannot catch. See the precision note in ops/grouping.py.
    from votenet_tpu.ops.grouping import (
        query_ball_point_dense,
        query_ball_point_topk,
    )

    assert dispatch.bq_precision() == "exact"
    for (Bq, Nq, Mq, rq, nsq) in [
        (8, 20480, 2048, 0.2, 64),   # sa1
        (8, 2048, 1024, 0.4, 64),    # sa2
        (8, 1024, 512, 0.8, 64),     # sa3
        (8, 512, 256, 1.2, 64),      # sa4
        (8, 1024, 256, 0.3, 64),     # proposal
    ]:
        xyz1 = rng.uniform(-4, 4, (Bq, Nq, 3)).astype(np.float32)
        xyz1[:, : Nq // 4] *= 0.12  # dense cluster -> busy radius boundary
        xyz2 = xyz1[:, :Mq]
        gi, gc = jax.jit(
            lambda a, b: query_ball_point_dense(rq, nsq, a, b)
        )(jnp.asarray(xyz1), jnp.asarray(xyz2))
        wi, wc = jax.jit(
            lambda a, b: query_ball_point_topk(rq, nsq, a, b)
        )(jnp.asarray(xyz1), jnp.asarray(xyz2))
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
        np.testing.assert_array_equal(np.asarray(gc), np.asarray(wc))
        # the dispatcher routes to the Pallas VMEM kernel here; also pin the
        # XLA exact twin against it explicitly (three-way bit agreement)
        from votenet_tpu.ops.grouping import _query_ball_point_dense
        from votenet_tpu.ops.pallas.ballquery import query_ball_point_pallas

        pi, pc = query_ball_point_pallas(rq, nsq, jnp.asarray(xyz1), jnp.asarray(xyz2))
        ti, tc = _query_ball_point_dense(rq, nsq, "exact", jnp.asarray(xyz1), jnp.asarray(xyz2))
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(ti))
        np.testing.assert_array_equal(np.asarray(pc), np.asarray(tc))
        print(f"ball query exact-mode compiled ok (pallas+twin bit-equal)  "
              f"B={Bq} N={Nq} M={Mq} r={rq}", flush=True)
    print("ALL COMPILED KERNEL CHECKS PASSED")


if __name__ == "__main__":
    main()
