"""Tests for the experimental small-batch sublane-folded FPS kernel.

Interpret-mode only: compiled fold=2 currently mismatches on hardware (a
Mosaic sublane-roll lowering discrepancy — ROADMAP item), so the fold path
is off by default and validated here in the interpreter.
"""

import numpy as np
import pytest

from votenet_tpu.ops.pallas.fps import farthest_point_sample_pallas
from tests import oracles


class TestFoldedFPS:
    @pytest.mark.parametrize("B,N,m", [(1, 300, 64), (2, 512, 128), (4, 250, 32)])
    def test_interpret_matches_oracle(self, rng, B, N, m):
        xyz = rng.randn(B, N, 3).astype(np.float32)
        got = np.asarray(
            farthest_point_sample_pallas(m, xyz, interpret=True, fold_small_batch=True)
        )
        want = oracles.fps_oracle(m, xyz)
        np.testing.assert_array_equal(got, want)

    def test_default_path_unfolded(self, rng):
        """Default (fold off) must agree with the folded result."""
        xyz = rng.randn(2, 200, 3).astype(np.float32)
        a = np.asarray(farthest_point_sample_pallas(32, xyz, interpret=True))
        b = np.asarray(
            farthest_point_sample_pallas(32, xyz, interpret=True, fold_small_batch=True)
        )
        np.testing.assert_array_equal(a, b)
