"""Tests for PointNet++ module variants the model doesn't use but the
reference API exposes (SURVEY §2: knn grouping, pooling modes, group_all,
multi-scale grouping)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from votenet_tpu.models.pointnet2 import (
    PointNetSAModule,
    PointNetSAModuleMSG,
    sample_and_group,
    sample_and_group_all,
)


@pytest.fixture(scope="module")
def cloud(rng=None):
    r = np.random.RandomState(0)
    xyz = jnp.asarray(r.randn(2, 128, 3), jnp.float32)
    feats = jnp.asarray(r.randn(2, 128, 16), jnp.float32)
    return xyz, feats


class TestSampleAndGroup:
    def test_knn_mode(self, cloud):
        xyz, feats = cloud
        new_xyz, new_points, idx, grouped = sample_and_group(
            16, 0.4, 8, xyz, feats, knn=True
        )
        assert idx.shape == (2, 16, 8)
        assert new_points.shape == (2, 16, 8, 3 + 16)
        # kNN neighbors sorted by distance: verify first neighbor is nearest
        d = jnp.linalg.norm(xyz[:, :, None] - new_xyz[:, None], axis=-1)  # (B,N,M)
        nearest = jnp.argmin(d, axis=1).astype(jnp.int32)  # (B, M)
        np.testing.assert_array_equal(np.asarray(idx[..., 0]), np.asarray(nearest))

    def test_no_xyz_concat(self, cloud):
        xyz, feats = cloud
        _, new_points, _, _ = sample_and_group(16, 0.4, 8, xyz, feats, use_xyz=False)
        assert new_points.shape[-1] == 16  # features only

    def test_points_none(self, cloud):
        xyz, _ = cloud
        _, new_points, _, grouped = sample_and_group(16, 0.4, 8, xyz, None)
        assert new_points.shape[-1] == 3
        np.testing.assert_array_equal(np.asarray(new_points), np.asarray(grouped))

    def test_group_all(self, cloud):
        xyz, feats = cloud
        new_xyz, new_points, idx, _ = sample_and_group_all(xyz, feats)
        assert new_xyz.shape == (2, 1, 3)
        np.testing.assert_allclose(np.asarray(new_xyz), 0.0)
        assert new_points.shape == (2, 1, 128, 19)


class TestPoolingVariants:
    @pytest.mark.parametrize("pooling", ["max", "avg", "weighted_avg", "max_and_avg"])
    def test_all_poolings_run(self, cloud, pooling):
        xyz, feats = cloud
        mod = PointNetSAModule(
            npoint=16, radius=0.4, nsample=8, mlp=(8, 8), pooling=pooling
        )
        v = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
        _, out, _ = mod.apply(v, xyz, feats, train=False)
        want_c = 16 if pooling == "max_and_avg" else 8
        assert out.shape == (2, 16, want_c)
        assert np.isfinite(np.asarray(out)).all()

    def test_group_all_module(self, cloud):
        xyz, feats = cloud
        mod = PointNetSAModule(
            npoint=0, radius=0.0, nsample=0, mlp=(8, 8), group_all=True
        )
        v = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
        new_xyz, out, _ = mod.apply(v, xyz, feats, train=False)
        assert new_xyz.shape == (2, 1, 3)
        assert out.shape == (2, 1, 8)


class TestMSG:
    def test_multi_scale_output_concat(self, cloud):
        xyz, feats = cloud
        mod = PointNetSAModuleMSG(
            npoint=16,
            radius_list=(0.2, 0.4),
            nsample_list=(4, 8),
            mlp_list=((8, 8), (8, 16)),
        )
        v = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
        new_xyz, out = mod.apply(v, xyz, feats, train=False)
        assert new_xyz.shape == (2, 16, 3)
        assert out.shape == (2, 16, 8 + 16)  # concat of per-scale widths
        assert np.isfinite(np.asarray(out)).all()


class TestCenteredDenseFusion:
    """The fused path (uncentered gather + CenteredDense) must match the
    explicit composition (center first, then Dense) with identical params:
    (g - pad(c)) @ W + b == g @ W - c @ W[:3] + b up to matmul rounding."""

    def test_fused_matches_explicit(self, cloud):
        from votenet_tpu import ops
        from votenet_tpu.models.pointnet2 import CenteredDense, MLPStack

        xyz, feats = cloud
        mod = PointNetSAModule(npoint=16, radius=0.4, nsample=8, mlp=(24, 32))
        variables = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
        new_xyz, fused_out, idx = mod.apply(variables, xyz, feats, train=False)

        # explicit composition with the same parameters
        new_xyz2, centered, idx2, _ = sample_and_group(
            16, 0.4, 8, xyz, feats, knn=False, use_xyz=True
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
        explicit = MLPStack((24, 32), name="mlp").apply(
            {"params": variables["params"]["mlp"],
             "batch_stats": variables["batch_stats"]["mlp"]},
            centered, train=False,
        )
        explicit = jnp.max(explicit, axis=2)
        np.testing.assert_allclose(
            np.asarray(fused_out), np.asarray(explicit), rtol=2e-2, atol=2e-3
        )

    def test_centered_dense_algebra(self):
        from votenet_tpu.models.pointnet2 import CenteredDense

        r = np.random.RandomState(1)
        g = jnp.asarray(r.randn(2, 4, 8, 19), jnp.float32)
        c = jnp.asarray(r.randn(2, 4, 3), jnp.float32)
        cd = CenteredDense(7)
        variables = cd.init(jax.random.PRNGKey(0), g, c)
        got = cd.apply(variables, g, c)
        W = variables["params"]["kernel"]
        b = variables["params"]["bias"]
        centered = g.at[..., :3].add(-c[:, :, None, :])
        want = centered @ W + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_param_tree_unchanged(self, cloud):
        # checkpoints from the explicit path must load into the fused path:
        # same param names and shapes at mlp/dense0
        xyz, feats = cloud
        mod = PointNetSAModule(npoint=16, radius=0.4, nsample=8, mlp=(24,))
        variables = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
        d0 = variables["params"]["mlp"]["dense0"]
        assert set(d0.keys()) == {"kernel", "bias"}
        assert d0["kernel"].shape == (19, 24)
        assert d0["bias"].shape == (24,)
