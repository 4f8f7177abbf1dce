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
