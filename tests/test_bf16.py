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
