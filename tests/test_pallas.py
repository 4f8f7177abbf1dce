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
    def test_four_formulations_agree(self, rng):
        """rank vs angular-sort vs Sutherland–Hodgman vs edge-clip agree."""
        import jax.numpy as jnp

        from votenet_tpu.ops.iou3d import (
            convex_quad_intersection_area,
            convex_quad_intersection_area_edgeclip,
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
        d = np.asarray(convex_quad_intersection_area_edgeclip(q1, q2))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(a, d, rtol=1e-4, atol=1e-5)

    def test_edgeclip_containment_and_degenerate(self):
        import jax.numpy as jnp

        from votenet_tpu.ops.iou3d import convex_quad_intersection_area_edgeclip

        big = jnp.asarray([[-2, -2], [2, -2], [2, 2], [-2, 2]], jnp.float32)
        small = jnp.asarray([[-1, -1], [1, -1], [1, 1], [-1, 1]], jnp.float32)
        assert float(
            convex_quad_intersection_area_edgeclip(small, big)
        ) == pytest.approx(4.0, rel=1e-5)
        assert float(
            convex_quad_intersection_area_edgeclip(big, small)
        ) == pytest.approx(4.0, rel=1e-5)
        # zero-area (collinear) quad has no interior: clamp keeps inter at 0
        line = jnp.asarray([[0, 0], [1, 0], [2, 0], [3, 0]], jnp.float32)
        assert float(convex_quad_intersection_area_edgeclip(line, big)) == 0.0
        # disjoint
        assert float(convex_quad_intersection_area_edgeclip(big, big + 10.0)) == 0.0

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


class TestPallasBallQuery:
    """ops/pallas/ballquery.py vs the XLA oracle (interpret mode on CPU;
    the compiled-on-TPU bit-equality at live shapes runs in
    benchmarks/tpu_kernel_checks.py)."""

    def _clouds(self, rng, B, N, M):
        # clustered clouds: the adversarial case for selection semantics
        centers = rng.randn(B, 8, 3).astype(np.float32)
        pts = centers[:, rng.randint(0, 8, N)] + rng.randn(B, N, 3).astype(
            np.float32
        ) * 0.15
        q = pts[:, rng.choice(N, M, replace=False)]
        return pts, q

    @pytest.mark.parametrize(
        "B,N,M,S,r",
        [
            (2, 512, 128, 8, 0.3),
            (1, 300, 70, 16, 0.5),   # unaligned N/M (padding paths)
            (2, 1024, 256, 64, 0.2),
        ],
    )
    def test_matches_oracle(self, rng, B, N, M, S, r):
        import jax.numpy as jnp

        from votenet_tpu.ops.grouping import query_ball_point_topk
        from votenet_tpu.ops.pallas.ballquery import query_ball_point_pallas

        pts, q = self._clouds(rng, B, N, M)
        ia, ca = query_ball_point_pallas(
            r, S, jnp.asarray(pts), jnp.asarray(q), True
        )
        ib, cb = query_ball_point_topk(r, S, jnp.asarray(pts), jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))

    def test_empty_and_saturated_balls(self, rng):
        import jax.numpy as jnp

        from votenet_tpu.ops.grouping import query_ball_point_topk
        from votenet_tpu.ops.pallas.ballquery import query_ball_point_pallas

        # one dense blob + far-away queries: rows saturate AND rows are empty
        pts = rng.randn(1, 256, 3).astype(np.float32) * 0.05
        q = np.concatenate(
            [np.zeros((1, 4, 3), np.float32), np.full((1, 4, 3), 50.0, np.float32)],
            axis=1,
        )
        ia, ca = query_ball_point_pallas(
            0.5, 8, jnp.asarray(pts), jnp.asarray(q), True
        )
        ib, cb = query_ball_point_topk(0.5, 8, jnp.asarray(pts), jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
        assert np.asarray(ca)[0, :4].max() == 8  # saturated
        assert np.asarray(ca)[0, 4:].max() == 0  # empty -> index 0 rows
        assert np.asarray(ia)[0, 4:].max() == 0


class TestFusedSAMLPPool:
    """ops/pallas/samlp.py: the fused eval-path grouped-MLP + max-pool."""

    def _ref(self, h0, sh0, s0, layers):
        import jax
        import jax.numpy as jnp

        x = jax.nn.relu(h0 * s0 + sh0[:, :, None, :])
        for (W, s, t) in layers:
            x = jax.nn.relu((x @ W) * s + t)
        return jnp.max(x, axis=2)

    @pytest.mark.parametrize(
        "B,M,S,widths",
        [
            (2, 192, 64, [64, 64, 128]),   # sa1 widths, unaligned M
            (1, 256, 64, [128, 128, 256]),  # sa2+ widths
            (2, 64, 16, [16, 16, 32]),      # tiny-config widths
        ],
    )
    def test_matches_xla_chain(self, rng, B, M, S, widths):
        import jax.numpy as jnp

        from votenet_tpu.ops.pallas.samlp import fused_sa_mlp_pool

        h0 = jnp.asarray(rng.randn(B, M, S, widths[0]), jnp.float32)
        sh0 = jnp.asarray(rng.randn(B, M, widths[0]), jnp.float32)
        s0 = jnp.asarray(rng.rand(widths[0]) + 0.5, jnp.float32)
        layers = [
            (
                jnp.asarray(rng.randn(widths[i], widths[i + 1]) * 0.1, jnp.float32),
                jnp.asarray(rng.rand(widths[i + 1]) + 0.5, jnp.float32),
                jnp.asarray(rng.randn(widths[i + 1]) * 0.1, jnp.float32),
            )
            for i in range(len(widths) - 1)
        ]
        got = np.asarray(fused_sa_mlp_pool(h0, sh0, s0, layers, interpret=True))
        want = np.asarray(self._ref(h0, sh0, s0, layers))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_model_eval_fused_equals_xla(self, rng):
        """Full VoteNet eval forward: fused kernel vs XLA chain, and the
        kernel must actually be entered (routing assertion)."""
        import jax
        import jax.numpy as jnp

        from votenet_tpu.config import tiny_config
        from votenet_tpu.models.votenet import VoteNet
        from votenet_tpu.ops import dispatch
        from votenet_tpu.ops.pallas import samlp as samlp_mod

        cfg = tiny_config()
        model = VoteNet(cfg)
        pts = jnp.asarray(rng.uniform(-3, 3, (2, cfg.point_num, 3)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), pts, train=True)

        prev = dispatch.samlp_enabled()
        calls = []
        orig = samlp_mod.fused_sa_mlp_pool
        try:
            dispatch.set_samlp("off")
            out_xla = model.apply(vars_, pts, train=False, mutable=False)
            dispatch.set_samlp("on")

            def counting(*a, **k):
                calls.append(1)
                return orig(*a, **k)

            samlp_mod.fused_sa_mlp_pool = counting
            with dispatch.samlp_interpreted():
                out_fused = model.apply(vars_, pts, train=False, mutable=False)
        finally:
            samlp_mod.fused_sa_mlp_pool = orig
            dispatch.set_samlp("on" if prev else "off")

        assert len(calls) >= 4, f"fused kernel not routed (calls={len(calls)})"
        for a, b in zip(
            jax.tree_util.tree_leaves(out_xla), jax.tree_util.tree_leaves(out_fused)
        ):
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype.kind in "fc":
                np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
            else:
                np.testing.assert_array_equal(a, b)
