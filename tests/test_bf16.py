"""Mixed-precision (bfloat16 MLP compute) mode tests."""

import jax
import jax.numpy as jnp
import numpy as np

from votenet_tpu.models.votenet import VoteNet
from tests.test_end2end import tiny_config

import pytest

pytestmark = pytest.mark.slow  # see pytest.ini; fast lane = -m 'not slow'


class TestBF16Mode:
    def test_forward_close_to_f32(self, rng):
        cfg32 = tiny_config()
        cfg16 = cfg32.replace(compute_dtype="bfloat16")
        pts = jnp.asarray(rng.randn(2, cfg32.point_num, 3), jnp.float32)

        m32, m16 = VoteNet(cfg32), VoteNet(cfg16)
        v32 = m32.init(jax.random.PRNGKey(0), pts, train=False)
        out32 = m32.apply(v32, pts, train=False)
        out16 = m16.apply(v32, pts, train=False)  # same params

        assert out16["proposals_output"].dtype == jnp.float32  # cast at head
        a = np.asarray(out32["proposals_output"])
        b = np.asarray(out16["proposals_output"])
        assert np.isfinite(b).all()
        # bf16 matmuls: loose agreement is expected, divergence is not
        denom = np.maximum(np.abs(a), 1.0)
        assert np.median(np.abs(a - b) / denom) < 0.05

    def test_params_stay_f32(self, rng):
        cfg16 = tiny_config().replace(compute_dtype="bfloat16")
        m = VoteNet(cfg16)
        pts = jnp.zeros((1, cfg16.point_num, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), pts, train=False)
        for leaf in jax.tree_util.tree_leaves(v["params"]):
            assert leaf.dtype == jnp.float32

    def test_train_step_runs_bf16(self, rng):
        from votenet_tpu.train.loop import make_train_step
        from votenet_tpu.train.state import create_train_state
        from votenet_tpu.data.synthetic import synthetic_scenes
        from votenet_tpu.data.dataflow import batch_scenes

        cfg = tiny_config().replace(compute_dtype="bfloat16", batch_size=2)
        state = create_train_state(jax.random.PRNGKey(0), cfg, 1)
        model = VoteNet(cfg)
        step = jax.jit(make_train_step(model, cfg))
        batch = next(iter(batch_scenes(
            iter(synthetic_scenes(0, cfg, 2)), cfg.batch_size, cfg.max_gt_boxes
        )))
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["total_cost"]))


class TestMixedPrecision:
    """Config.mixed_precision: f32 coordinates + bf16 feature path."""

    def test_params_identical_tree_to_f32(self, rng):
        # checkpoints must be interchangeable between modes: same param
        # names, shapes and dtypes (the split CenteredDense reuses the one
        # fused (3+Cf, w) kernel)
        cfg32 = tiny_config()
        cfgmx = cfg32.replace(mixed_precision=True)
        pts = jnp.zeros((1, cfg32.point_num, 3), jnp.float32)
        v32 = VoteNet(cfg32).init(jax.random.PRNGKey(0), pts, train=False)
        vmx = VoteNet(cfgmx).init(jax.random.PRNGKey(0), pts, train=False)
        p32 = jax.tree_util.tree_leaves_with_path(v32["params"])
        pmx = jax.tree_util.tree_leaves_with_path(vmx["params"])
        assert [(jax.tree_util.keystr(k), l.shape, l.dtype) for k, l in p32] == [
            (jax.tree_util.keystr(k), l.shape, l.dtype) for k, l in pmx
        ]

    def test_forward_close_to_f32_and_coords_exact_dtype(self, rng):
        cfg32 = tiny_config()
        cfgmx = cfg32.replace(mixed_precision=True)
        pts = jnp.asarray(rng.randn(2, cfg32.point_num, 3), jnp.float32)
        m32, mmx = VoteNet(cfg32), VoteNet(cfgmx)
        v = m32.init(jax.random.PRNGKey(0), pts, train=False)
        out32 = m32.apply(v, pts, train=False)
        outmx = mmx.apply(v, pts, train=False)  # same params
        # coordinate tensors stay f32 in mixed mode
        for k in ("seeds_xyz", "votes_xyz", "proposals_xyz"):
            assert outmx[k].dtype == jnp.float32, k
        # seeds/votes coordinates barely move (only bf16 FEATURE noise
        # upstream); head outputs agree loosely (bf16 matmuls)
        np.testing.assert_allclose(
            np.asarray(out32["seeds_xyz"]), np.asarray(outmx["seeds_xyz"]),
            atol=1e-6,
        )
        a = np.asarray(out32["proposals_output"])
        b = np.asarray(outmx["proposals_output"])
        assert np.isfinite(b).all()
        denom = np.maximum(np.abs(a), 1.0)
        assert np.median(np.abs(a - b) / denom) < 0.05

    def test_train_step_runs_and_params_stay_f32(self, rng):
        from votenet_tpu.data.dataflow import batch_scenes
        from votenet_tpu.data.synthetic import synthetic_scenes
        from votenet_tpu.train.loop import make_train_step
        from votenet_tpu.train.state import create_train_state

        cfg = tiny_config().replace(mixed_precision=True, batch_size=2)
        state = create_train_state(jax.random.PRNGKey(0), cfg, 1)
        model = VoteNet(cfg)
        step = jax.jit(make_train_step(model, cfg))
        batch = next(iter(batch_scenes(
            iter(synthetic_scenes(0, cfg, 2)), cfg.batch_size, cfg.max_gt_boxes
        )))
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["total_cost"]))
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32

    def test_inference_split_path_matches_train_split_path(self, rng):
        """Mixed mode has its own project-before-gather inference fold; the
        train/infer forward values must agree (same commute argument)."""
        cfg = tiny_config().replace(mixed_precision=True)
        pts = jnp.asarray(rng.randn(2, cfg.point_num, 3), jnp.float32)
        m = VoteNet(cfg)
        v = m.init(jax.random.PRNGKey(0), pts, train=False)
        out_inf = m.apply(v, pts, train=False)
        out_tr, _ = m.apply(
            v, pts, train=True, mutable=["batch_stats"]
        )
        # train mode uses batch stats in BN, so values differ; compare the
        # pre-BN-free tensors: FPS/queries are deterministic, so xyz chains
        # must be IDENTICAL
        np.testing.assert_array_equal(
            np.asarray(out_inf["seeds_xyz"]), np.asarray(out_tr["seeds_xyz"])
        )


class TestRemat:
    def test_remat_matches_baseline(self, rng):
        """remat changes memory, not values: outputs and grads must match."""
        import jax
        from votenet_tpu.train.loop import make_train_step
        from votenet_tpu.train.state import create_train_state
        from votenet_tpu.data.synthetic import synthetic_scenes
        from votenet_tpu.data.dataflow import batch_scenes

        cfg = tiny_config().replace(batch_size=2)
        cfg_r = cfg.replace(remat=True)
        batch = next(iter(batch_scenes(
            iter(synthetic_scenes(0, cfg, 2)), cfg.batch_size, cfg.max_gt_boxes
        )))
        state = create_train_state(jax.random.PRNGKey(0), cfg, 1)

        m = VoteNet(cfg)
        m_r = VoteNet(cfg_r)
        s1, met1 = jax.jit(make_train_step(m, cfg))(state, batch)
        s2, met2 = jax.jit(make_train_step(m_r, cfg_r))(state, batch)
        np.testing.assert_allclose(
            float(met1["total_cost"]), float(met2["total_cost"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
