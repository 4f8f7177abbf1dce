"""Point-axis (SP) sharding: exact equality vs the single-device twins.

Runs on the virtual 8-device CPU mesh (conftest). Every sharded op must be
BIT-IDENTICAL to its dense twin — including tie cases (duplicate points,
equidistant neighbors) and the reference's fill/empty semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from votenet_tpu.ops.grouping import query_ball_point_dense, group_point
from votenet_tpu.ops.interpolate import three_nn_dense
from votenet_tpu.ops.sampling import farthest_point_sample_xla
from votenet_tpu.parallel.mesh import make_mesh
from votenet_tpu.parallel.point_sharded import (
    farthest_point_sample_sharded,
    group_point_sharded,
    point_sharding,
    query_ball_point_sharded,
    three_nn_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(jax.devices()[:8], axis_names=("points",))


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh(jax.devices()[:8], shape=(2, 4), axis_names=("data", "points"))


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _cloud(rng, B, N, cluster=True):
    x = rng.uniform(-4, 4, (B, N, 3)).astype(np.float32)
    if cluster:
        x[:, : N // 4] *= 0.12  # dense cluster: busy boundaries, full balls
    return jnp.asarray(x)


class TestQueryBallSharded:
    def test_matches_dense_exactly(self, mesh, rng):
        xyz1 = _cloud(rng, 2, 1024)
        xyz2 = xyz1[:, :128]
        want_i, want_c = query_ball_point_dense(0.5, 16, xyz1, xyz2)
        got_i, got_c = query_ball_point_sharded(0.5, 16, xyz1, xyz2, mesh)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))

    def test_duplicate_points_and_empty_balls(self, mesh, rng):
        # duplicates exercise the index-order tie rule across shard borders;
        # a far-away query exercises the empty-ball -> 0 rule
        xyz1 = np.tile(rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32), (1, 4, 1))
        xyz1 = jnp.asarray(xyz1)  # (1, 512): each point appears 4x
        q = jnp.concatenate(
            [xyz1[:, :32], jnp.full((1, 8, 3), 50.0, jnp.float32)], axis=1
        )
        want_i, want_c = query_ball_point_dense(0.3, 8, xyz1, q)
        got_i, got_c = query_ball_point_sharded(0.3, 8, xyz1, q, mesh)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
        assert np.all(np.asarray(got_i)[0, 32:] == 0)  # empty balls -> 0

    def test_input_already_sharded(self, mesh, rng):
        # device_put with the point sharding first — no resharding needed
        xyz1 = jax.device_put(_cloud(rng, 1, 2048), point_sharding(mesh))
        xyz2 = jax.device_put(
            jnp.asarray(np.asarray(xyz1)[:, :64]),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        )
        want = query_ball_point_dense(0.4, 8, jnp.asarray(np.asarray(xyz1)), xyz2)
        got = query_ball_point_sharded(0.4, 8, xyz1, xyz2, mesh)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))

    def test_indivisible_n_raises(self, mesh, rng):
        with pytest.raises(ValueError, match="divisible"):
            query_ball_point_sharded(0.4, 8, _cloud(rng, 1, 1001), _cloud(rng, 1, 16), mesh)


class TestThreeNNSharded:
    def test_matches_dense_exactly(self, mesh, rng):
        q = _cloud(rng, 2, 256, cluster=False)
        src = _cloud(rng, 2, 512)
        want_d, want_i = three_nn_dense(q, src)
        got_d, got_i = three_nn_sharded(q, src, mesh)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))

    def test_equidistant_ties_across_shards(self, mesh):
        # sources duplicated 8x -> every shard holds a copy of each point;
        # the dense rule picks the 3 LOWEST indices among the equal distances
        base = np.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]], np.float32)
        src = jnp.asarray(np.tile(base, (1, 8, 1)))  # (1, 32, 3)
        q = jnp.asarray(np.array([[[0.05, 0, 0]]], np.float32))
        want_d, want_i = three_nn_dense(q, src)
        got_d, got_i = three_nn_sharded(q, src, mesh)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want_d))


class TestGroupPointSharded:
    def test_matches_gather_exactly(self, mesh, rng):
        pts = jnp.asarray(rng.randn(2, 512, 7).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 512, (2, 32, 8)).astype(np.int32))
        want = group_point(pts, idx)
        got = group_point_sharded(pts, idx, mesh)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_gradient_matches(self, mesh, rng):
        pts = jnp.asarray(rng.randn(1, 256, 5).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 256, (1, 16, 4)).astype(np.int32))
        cot = jnp.asarray(rng.randn(1, 16, 4, 5).astype(np.float32))
        want = jax.grad(lambda p: jnp.sum(group_point(p, idx) * cot))(pts)
        got = jax.grad(
            lambda p: jnp.sum(group_point_sharded(p, idx, mesh) * cot)
        )(pts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


class TestFPSSharded:
    def test_matches_xla_twin_exactly(self, mesh, rng):
        xyz = _cloud(rng, 2, 512)
        want = farthest_point_sample_xla(64, xyz)
        got = farthest_point_sample_sharded(64, xyz, mesh)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_duplicate_points_tie_rule(self, mesh, rng):
        # duplicated cloud: max-mindist ties everywhere; the dense rule is
        # lowest global index, which crosses shard boundaries
        half = rng.uniform(-1, 1, (1, 256, 3)).astype(np.float32)
        xyz = jnp.asarray(np.concatenate([half, half], axis=1))  # (1, 512)
        want = farthest_point_sample_xla(32, xyz)
        got = farthest_point_sample_sharded(32, xyz, mesh)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_seed_is_global_zero(self, mesh, rng):
        got = np.asarray(farthest_point_sample_sharded(4, _cloud(rng, 3, 64), mesh))
        assert np.all(got[:, 0] == 0)


class TestGatherPointSharded:
    def test_matches_gather_point(self, mesh, rng):
        from votenet_tpu.ops.sampling import gather_point
        from votenet_tpu.parallel.point_sharded import gather_point_sharded

        pts = jnp.asarray(rng.randn(2, 512, 3).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 512, (2, 64)).astype(np.int32))
        want = gather_point(pts, idx)
        got = gather_point_sharded(pts, idx, mesh)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestSampleAndGroupSharded:
    def test_matches_single_device(self, mesh, rng):
        """The full SA grouping stage (FPS -> gather -> query -> group ->
        center-subtract) point-sharded, vs the model's own sample_and_group
        with the XLA twins (pallas is off on CPU anyway)."""
        from votenet_tpu.models.pointnet2 import sample_and_group
        from votenet_tpu.parallel.point_sharded import sample_and_group_sharded

        xyz = _cloud(rng, 2, 512)
        feats = jnp.sin(xyz * 3.0)
        want_xyz, want_pts, want_idx, want_gx = sample_and_group(
            64, 0.4, 8, xyz, feats
        )
        got_xyz, got_pts, got_idx, got_gx = sample_and_group_sharded(
            64, 0.4, 8, xyz, feats, mesh
        )
        np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
        np.testing.assert_array_equal(np.asarray(got_xyz), np.asarray(want_xyz))
        np.testing.assert_array_equal(np.asarray(got_pts), np.asarray(want_pts))
        np.testing.assert_array_equal(np.asarray(got_gx), np.asarray(want_gx))


class TestDpSpMesh:
    def test_ball_query_on_2d_mesh(self, mesh2d, rng):
        """dp x sp: batch over 'data', points over 'points' — one SA-layer
        grouping step end-to-end on the 2-D mesh."""
        xyz1 = _cloud(rng, 2, 1024)
        xyz2 = xyz1[:, :64]
        want_i, want_c = query_ball_point_dense(0.4, 16, xyz1, xyz2)
        got_i, got_c = query_ball_point_sharded(0.4, 16, xyz1, xyz2, mesh2d)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
        # and the grouped gather from the sharded table
        pts = jnp.concatenate([xyz1, jnp.sin(xyz1)], axis=-1)
        want_g = group_point(pts, want_i)
        got_g = group_point_sharded(pts, got_i, mesh2d)
        np.testing.assert_array_equal(np.asarray(got_g), np.asarray(want_g))


@pytest.mark.slow
class TestSPModel:
    """Full VoteNet with the SP backbone: PointNetSAModule.sp_mesh wires the
    point-sharded grouping stage into sa1 (the only layer whose input cloud
    qualifies under sp_min_points). Forward must be BIT-IDENTICAL to the
    single-device model (same params), and a dp x sp training step must run
    and match the single-device gradients."""

    @pytest.fixture(scope="class")
    def cfg(self):
        from votenet_tpu.config import tiny_config

        return tiny_config(batch_size=2)

    @pytest.fixture(scope="class")
    def variables(self, cfg):
        from votenet_tpu.models.votenet import VoteNet

        pts = jnp.zeros((1, cfg.point_num, 3), jnp.float32)
        return jax.jit(
            lambda r, p: VoteNet(cfg).init(r, p, train=False)
        )(jax.random.PRNGKey(0), pts)

    @pytest.mark.parametrize("train", [False, True])
    def test_forward_bitexact(self, cfg, variables, mesh, rng, train):
        from votenet_tpu.models.votenet import VoteNet

        pts = _cloud(rng, 2, cfg.point_num)
        base = VoteNet(cfg)
        sp = VoteNet(cfg, sp_mesh=mesh, sp_min_points=cfg.point_num)
        kw = dict(train=train, mutable=["batch_stats"] if train else False)
        want = base.apply(variables, pts, **kw)
        got = sp.apply(variables, pts, **kw)
        if train:
            (want, want_bs), (got, got_bs) = want, got
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)
                ),
                want_bs,
                got_bs,
            )
        for k in want:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(want[k]), err_msg=k
            )

    def test_dpsp_train_step_matches_single_device(self, cfg, mesh2d, rng):
        """One full training step on the 2x4 ('data', 'points') mesh: batch
        sharded over data, sa1's cloud over points. The contract is GRADIENT
        agreement (allclose — the dp batch-mean all-reduce reassociates the
        reduction) plus a loss-match on the executed sharded step. Post-
        optimizer params are NOT compared: at step 1 the Adam-style update is
        ~lr*sign(grad), so ulp-level gradient reassociation flips the sign of
        near-zero gradients — an unstable (and meaningless) contract."""
        from votenet_tpu.models.votenet import VoteNet
        from votenet_tpu.models.losses import votenet_loss
        from votenet_tpu.parallel.mesh import batch_sharding, replicated_sharding
        from votenet_tpu.train.loop import GT_KEYS, make_train_step
        from votenet_tpu.train.state import create_train_state

        from jax.sharding import NamedSharding, PartitionSpec as P

        state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=4)
        B, G = 4, cfg.max_gt_boxes
        batch = {
            "points": rng.randn(B, cfg.point_num, 3).astype(np.float32),
            "bboxes_xyz": rng.randn(B, G, 3).astype(np.float32),
            "bboxes_lwh": rng.uniform(0.5, 2, (B, G, 3)).astype(np.float32),
            "bboxes_roty": rng.uniform(0, 6.28, (B, G)).astype(np.float32),
            "semantic_labels": rng.randint(0, cfg.num_class, (B, G)).astype(np.int32),
            "heading_labels": rng.randint(0, cfg.num_heading_bin, (B, G)).astype(
                np.int32
            ),
            "heading_residuals": (rng.randn(B, G) * 0.1).astype(np.float32),
            "size_labels": rng.randint(0, cfg.num_size_cluster, (B, G)).astype(
                np.int32
            ),
            "size_residuals": (rng.randn(B, G, 3) * 0.1).astype(np.float32),
            "gt_count": np.full((B,), G, np.int32),
        }

        base_step = jax.jit(make_train_step(VoteNet(cfg), cfg))
        _, want_metrics = base_step(state, batch)

        sp_model = VoteNet(
            cfg,
            sp_mesh=mesh2d,
            sp_batch_axis="data",
            sp_min_points=cfg.point_num,
        )
        shardings = {k: batch_sharding(mesh2d) for k in batch}
        shardings["points"] = NamedSharding(mesh2d, P("data", "points"))
        sp_batch = {
            k: jax.device_put(v, shardings[k]) for k, v in batch.items()
        }
        sp_step = jax.jit(
            make_train_step(sp_model, cfg),
            in_shardings=(replicated_sharding(mesh2d), shardings),
            out_shardings=(
                replicated_sharding(mesh2d),
                replicated_sharding(mesh2d),
            ),
        )
        _, got_metrics = sp_step(state, sp_batch)

        np.testing.assert_allclose(
            float(got_metrics["total_cost"]),
            float(want_metrics["total_cost"]),
            rtol=1e-5,
        )

        # gradient agreement: the SP backward (group_point_sharded VJP,
        # local scatter per shard) vs the single-device backward
        gt = {k: batch[k] for k in GT_KEYS}

        def make_loss(model):
            def loss_fn(params):
                end_points, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["points"] if model.sp_mesh is None else sp_batch["points"],
                    train=True,
                    mutable=["batch_stats"],
                )
                return votenet_loss(end_points, gt, cfg, "reference").total

            return loss_fn

        want_g = jax.jit(jax.grad(make_loss(VoteNet(cfg))))(state.params)
        got_g = jax.jit(jax.grad(make_loss(sp_model)))(state.params)
        # Tolerance model: the dp batch-mean / BN reductions reassociate
        # across the split, and reassociation can flip near-tie max-pool
        # winners — rerouting a FEW gradient elements by O(value) while
        # everything else agrees to ~1e-6 (the known discrete mechanism from
        # the mixed-precision post-mortem). The flip count moved with the
        # environment's XLA version (0 when written; a handful after an
        # XLA:CPU update — reproduced identically on the unchanged round-4
        # tree, so it is environment drift, not a code regression). A real
        # SP-VJP bug (wrong merge/scatter) corrupts whole leaves, not
        # isolated elements — so assert: almost all elements tight, the few
        # rerouted ones bounded, never more than a handful per leaf.
        # Tolerance model (norm-wise per leaf): reassociation across the
        # dp/sp split can flip near-tie max-pool winners, rerouting a few
        # gradient elements — a small-norm perturbation; a broken SP
        # merge/scatter corrupts whole leaves (rel-L2 ~ O(1)). The floor
        # term covers BN-shadowed bias leaves whose gradients are
        # mathematically ~0 (norms ~1e-7 — BN removes the mean, so the
        # following bias gets no signal; observed noise ~1e-5 on norms
        # ~1e-5): bare relative error there is noise-over-noise, so leaves
        # with avg element below 1e-2 are held only to the absolute cap. (The flip count moved with the environment's
        # XLA version; reproduced identically on the unchanged round-4
        # tree — environment drift, not a code regression.)
        bad = []

        def check(path, a, b):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            floor = 1e-2 * np.sqrt(a.size)
            rel_l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), floor)
            if rel_l2 >= 2e-3 or np.abs(a - b).max() >= 5e-3:
                bad.append((jax.tree_util.keystr(path), a.shape,
                            float(np.linalg.norm(b)),
                            float(np.linalg.norm(a - b)),
                            float(np.abs(a - b).max())))

        jax.tree_util.tree_map_with_path(check, got_g, want_g)
        assert not bad, "\n".join(map(str, bad))

    def test_sp_rejects_knn_and_split_coords(self, cfg, mesh, rng):
        from votenet_tpu.models.pointnet2 import PointNetSAModule

        xyz = _cloud(rng, 1, 64)
        mod = PointNetSAModule(
            npoint=16, radius=0.4, nsample=8, mlp=(16,), knn=True, sp_mesh=mesh
        )
        with pytest.raises(ValueError, match="knn"):
            mod.init(jax.random.PRNGKey(0), xyz, None, False)
