"""MXU one-hot scatter-add (the TPU group_point VJP) correctness tests.

The reference computes this gradient with atomicAdd (tf_grouping_g.cu:61-78,
non-deterministic float accumulation); scatter_add_mxu is the deterministic
TPU formulation: chunked one-hot f32 matmuls (see benchmarks/scatter_bench.py
for the measured ~2x win over XLA's native scatter lowering at model shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from votenet_tpu.ops.grouping import (
    _group_point_gather,
    _group_point_tpu,
    scatter_add_mxu,
)


class TestScatterAddMXU:
    @pytest.mark.parametrize(
        "B,M,S,C,N", [(2, 20, 5, 7, 40), (1, 30, 13, 130, 64), (3, 8, 64, 3, 200)]
    )
    def test_matches_numpy(self, rng, B, M, S, C, N):
        g = rng.randn(B, M, S, C).astype(np.float32)
        idx = rng.randint(0, N, (B, M, S)).astype(np.int32)
        got = np.asarray(scatter_add_mxu(jnp.asarray(g), jnp.asarray(idx), N))
        want = np.zeros((B, N, C), np.float32)
        for b in range(B):
            np.add.at(want[b], idx[b].reshape(-1), g[b].reshape(-1, C))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)

    def test_duplicate_indices_accumulate(self):
        g = jnp.ones((1, 5, 2, 4), jnp.float32)
        idx = jnp.zeros((1, 5, 2), jnp.int32)
        got = np.asarray(scatter_add_mxu(g, idx, 8))
        np.testing.assert_allclose(got[0, 0], 10.0)
        np.testing.assert_allclose(got[0, 1:], 0.0)

    def test_chunk_remainder_padding(self, rng):
        # K=M*S not divisible by chunk: padded updates must be no-ops
        g = rng.randn(2, 7, 9, 5).astype(np.float32)
        idx = rng.randint(0, 33, (2, 7, 9)).astype(np.int32)
        got = np.asarray(scatter_add_mxu(jnp.asarray(g), jnp.asarray(idx), 33, chunk=16))
        want = np.zeros((2, 33, 5), np.float32)
        for b in range(2):
            np.add.at(want[b], idx[b].reshape(-1), g[b].reshape(-1, 5))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


class TestGroupPointCustomVJP:
    def test_forward_matches_gather(self, rng):
        pts = jnp.asarray(rng.randn(2, 50, 6).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 50, (2, 10, 4)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(_group_point_tpu(50, pts, idx)),
            np.asarray(_group_point_gather(pts, idx)),
        )

    def test_grad_matches_autodiff_scatter(self, rng):
        pts = jnp.asarray(rng.randn(2, 50, 6).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 50, (2, 10, 4)).astype(np.int32))
        cot = jnp.asarray(rng.randn(2, 10, 4, 6).astype(np.float32))

        g_custom = jax.grad(lambda p: jnp.vdot(_group_point_tpu(50, p, idx), cot))(pts)
        g_auto = jax.grad(lambda p: jnp.vdot(_group_point_gather(p, idx), cot))(pts)
        np.testing.assert_allclose(
            np.asarray(g_custom), np.asarray(g_auto), rtol=1e-6, atol=1e-5
        )

    def test_grad_keeps_primal_dtype(self, rng):
        pts = jnp.asarray(rng.randn(1, 20, 4).astype(np.float32)).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, 20, (1, 5, 3)).astype(np.int32))
        g = jax.grad(lambda p: _group_point_tpu(20, p, idx).astype(jnp.float32).sum())(pts)
        assert g.dtype == jnp.bfloat16
