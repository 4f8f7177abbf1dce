"""Randomized stress tests of the op stack against the oracles.

Covers cases the targeted tests don't: empty query balls (query points not
in the dataset), long NMS suppression chains (heavily clustered boxes), and
many random shape/seed combinations.
"""

import numpy as np
import pytest

from votenet_tpu import ops
from tests import oracles


class TestBallQueryFuzz:
    @pytest.mark.parametrize("seed", range(4))
    def test_random_queries_with_empty_balls(self, seed):
        rng = np.random.RandomState(seed)
        N, M = rng.randint(100, 400), rng.randint(8, 48)
        radius = rng.uniform(0.1, 0.5)
        ns = int(rng.choice([4, 16, 64]))
        xyz1 = rng.randn(2, N, 3).astype(np.float32) * 2
        xyz2 = rng.randn(2, M, 3).astype(np.float32) * 2  # NOT from the dataset
        gi, gc = ops.query_ball_point(radius, ns, xyz1, xyz2)
        wi, wc = oracles.query_ball_oracle(radius, ns, xyz1, xyz2)
        np.testing.assert_array_equal(np.asarray(gc), wc)
        np.testing.assert_array_equal(np.asarray(gi), wi)
        assert (wc == 0).any() or N < 200  # the point of this test: empty balls occur

    def test_all_empty(self, rng):
        xyz1 = rng.randn(1, 64, 3).astype(np.float32)
        xyz2 = xyz1[:, :8] + 100.0  # far away: every ball empty
        gi, gc = ops.query_ball_point(0.2, 8, xyz1, xyz2)
        assert (np.asarray(gc) == 0).all()
        assert (np.asarray(gi) == 0).all()  # defined empty-ball index


class TestNMSFuzz:
    @pytest.mark.parametrize("seed", range(3))
    def test_clustered_boxes_long_chains(self, seed):
        """Boxes in tight clusters create suppression chains; the fixpoint
        iteration must still match the sequential greedy oracle."""
        rng = np.random.RandomState(seed)
        B, N = 2, 32
        centers = np.repeat(rng.uniform(-1, 1, (B, 4, 3)), 8, axis=1)
        centers += rng.uniform(-0.3, 0.3, (B, N, 3))  # jitter within cluster
        size = rng.uniform(0.8, 1.2, (B, N, 3))
        heading = rng.uniform(0, 2 * np.pi, (B, N))
        from votenet_tpu.data.geometry import box_corners_votenet

        corners = box_corners_votenet(size, heading, centers).astype(np.float32)
        scores = rng.rand(B, N).astype(np.float32)
        obj = rng.randn(B, N, 2).astype(np.float32)
        got = np.asarray(ops.nms3d(corners, scores, obj, 0.25))
        want = oracles.nms3d_oracle(corners, scores, obj, 0.25)
        np.testing.assert_array_equal(got, want)

    def test_tie_scores(self, rng):
        """Equal scores: the tie-break (lower index first) must match the
        stable-sort oracle."""
        corners = oracles.random_boxes(rng, (1, 12))
        corners[0, 6] = corners[0, 2]  # identical overlapping boxes
        scores = np.full((1, 12), 0.5, np.float32)  # all tied
        obj = np.zeros((1, 12, 2), np.float32)
        obj[..., 1] = 1.0  # all candidates
        got = np.asarray(ops.nms3d(corners, scores, obj, 0.25))
        want = oracles.nms3d_oracle(corners, scores, obj, 0.25)
        np.testing.assert_array_equal(got, want)


class TestFPSFuzz:
    @pytest.mark.parametrize("seed", range(3))
    def test_random_shapes(self, seed):
        rng = np.random.RandomState(100 + seed)
        B = int(rng.randint(1, 5))
        N = int(rng.randint(32, 300))
        m = int(rng.randint(1, min(N, 96)))
        xyz = rng.randn(B, N, 3).astype(np.float32)
        got = np.asarray(ops.farthest_point_sample(m, xyz))
        want = oracles.fps_oracle(m, xyz)
        np.testing.assert_array_equal(got, want)

    def test_duplicate_points(self, rng):
        """Duplicated coordinates: min-dist ties must break to lower index."""
        base = rng.randn(1, 20, 3).astype(np.float32)
        xyz = np.concatenate([base, base], axis=1)  # every point twice
        got = np.asarray(ops.farthest_point_sample(10, xyz))
        want = oracles.fps_oracle(10, xyz)
        np.testing.assert_array_equal(got, want)
