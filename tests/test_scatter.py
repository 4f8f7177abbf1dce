"""Pallas scatter-add kernel tests (interpret mode).

Note: on v5e the XLA scatter outperformed this kernel (68.9 vs 27.6 ms at
sa1-backward size), so the model's backward keeps XLA's scatter; the kernel
remains as a validated building block (see DESIGN.md perf notes).
"""

import numpy as np
import pytest

from votenet_tpu.ops.pallas.scatter import scatter_add_rows_pallas


class TestScatterAddPallas:
    @pytest.mark.parametrize("B,R,C,N", [(2, 100, 5, 40), (1, 300, 130, 64), (3, 64, 128, 32)])
    def test_matches_numpy(self, rng, B, R, C, N):
        g = rng.randn(B, R, C).astype(np.float32)
        idx = rng.randint(0, N, (B, R)).astype(np.int32)
        got = np.asarray(scatter_add_rows_pallas(g, idx, N, interpret=True))
        want = np.zeros((B, N, C), np.float32)
        for b in range(B):
            np.add.at(want[b], idx[b], g[b])
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_duplicate_indices_accumulate(self, rng):
        g = np.ones((1, 10, 4), np.float32)
        idx = np.zeros((1, 10), np.int32)  # all rows to slot 0
        got = np.asarray(scatter_add_rows_pallas(g, idx, 8, interpret=True))
        np.testing.assert_allclose(got[0, 0], 10.0)
        np.testing.assert_allclose(got[0, 1:], 0.0)
