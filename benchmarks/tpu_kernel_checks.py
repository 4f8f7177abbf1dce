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
    print("ALL COMPILED KERNEL CHECKS PASSED")


if __name__ == "__main__":
    main()
