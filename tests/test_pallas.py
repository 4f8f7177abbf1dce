"""Pallas kernel tests (interpret mode on CPU) + IoU implementation
cross-validation."""

import numpy as np
import pytest

from tests import oracles


class TestPallasFPS:
    @pytest.mark.parametrize("B,N,m", [(2, 128, 32), (3, 300, 64), (8, 512, 128), (1, 64, 1)])
    def test_matches_oracle(self, rng, B, N, m):
        from votenet_tpu.ops.pallas.fps import farthest_point_sample_pallas

        xyz = rng.randn(B, N, 3).astype(np.float32)
        got = np.asarray(farthest_point_sample_pallas(m, xyz, interpret=True))
        want = oracles.fps_oracle(m, xyz)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize(
        "B,N,m", [(2, 128, 32), (3, 300, 64), (8, 512, 128), (1, 64, 1), (1, 2000, 300), (5, 1111, 97)]
    )
    def test_rowwise_matches_oracle(self, rng, B, N, m):
        """Row-wise fold (points over sublanes x lanes, grid over batch)."""
        from votenet_tpu.ops.pallas.fps import farthest_point_sample_pallas_rowwise

        xyz = rng.randn(B, N, 3).astype(np.float32)
        got = np.asarray(farthest_point_sample_pallas_rowwise(m, xyz, interpret=True))
        want = oracles.fps_oracle(m, xyz)
        np.testing.assert_array_equal(got, want)

    def test_matches_xla_twin(self, rng):
        from votenet_tpu.ops.pallas.fps import farthest_point_sample_pallas
        from votenet_tpu.ops.sampling import farthest_point_sample_xla

        xyz = rng.randn(4, 400, 3).astype(np.float32)
        a = np.asarray(farthest_point_sample_pallas(96, xyz, interpret=True))
        b = np.asarray(farthest_point_sample_xla(96, xyz))
        np.testing.assert_array_equal(a, b)


class TestIoUImplementations:
    def test_three_formulations_agree(self, rng):
        """rank-based vs angular-sort vs Sutherland–Hodgman must agree."""
        import jax.numpy as jnp

        from votenet_tpu.ops.iou3d import (
            convex_quad_intersection_area,
            convex_quad_intersection_area_sh,
            convex_quad_intersection_area_sort,
        )

        boxes1 = oracles.random_boxes(rng, (64,))
        boxes2 = oracles.random_boxes(rng, (64,))
        q1 = jnp.stack([boxes1[:, :4, 0], boxes1[:, :4, 2]], axis=-1)
        q2 = jnp.stack([boxes2[:, :4, 0], boxes2[:, :4, 2]], axis=-1)
        a = np.asarray(convex_quad_intersection_area(q1, q2))
        b = np.asarray(convex_quad_intersection_area_sort(q1, q2))
        c = np.asarray(convex_quad_intersection_area_sh(q1, q2))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)

    def test_contained_quad(self):
        import jax.numpy as jnp

        from votenet_tpu.ops.iou3d import convex_quad_intersection_area

        big = jnp.asarray([[-2, -2], [2, -2], [2, 2], [-2, 2]], jnp.float32)
        small = jnp.asarray([[-1, -1], [1, -1], [1, 1], [-1, 1]], jnp.float32)
        got = float(convex_quad_intersection_area(small, big))
        assert got == pytest.approx(4.0, rel=1e-5)
        got2 = float(convex_quad_intersection_area(big, small))
        assert got2 == pytest.approx(4.0, rel=1e-5)

    def test_disjoint(self):
        import jax.numpy as jnp

        from votenet_tpu.ops.iou3d import convex_quad_intersection_area

        a = jnp.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], jnp.float32)
        b = a + 5.0
        assert float(convex_quad_intersection_area(a, b)) == 0.0
