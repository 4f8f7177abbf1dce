"""Determinism tests.

The reference's gradient scatters used CUDA atomicAdd, making training
non-deterministic in float summation order (SURVEY §5 "race detection").
Here every scatter is an XLA segment-sum with a fixed reduction order, so
training is bitwise reproducible — asserted below.
"""

import jax
import numpy as np

from votenet_tpu.config import tiny_config
from votenet_tpu.data.dataflow import batch_scenes
from votenet_tpu.data.synthetic import synthetic_scenes
from votenet_tpu.models.votenet import VoteNet
from votenet_tpu.train.loop import make_train_step
from votenet_tpu.train.state import create_train_state

import pytest

pytestmark = pytest.mark.slow  # see pytest.ini; fast lane = -m 'not slow'


class TestDeterminism:
    def test_train_step_bitwise_reproducible(self):
        cfg = tiny_config(batch_size=2)
        batch = next(iter(batch_scenes(
            iter(synthetic_scenes(0, cfg, 2)), cfg.batch_size, cfg.max_gt_boxes
        )))
        model = VoteNet(cfg)
        step = jax.jit(make_train_step(model, cfg))

        def run():
            state = create_train_state(jax.random.PRNGKey(0), cfg, 1)
            for _ in range(3):
                state, metrics = step(state, batch)
            return state, metrics

        s1, m1 = run()
        s2, m2 = run()
        assert float(m1["total_cost"]) == float(m2["total_cost"])  # bitwise
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_inference_reproducible(self):
        cfg = tiny_config()
        model = VoteNet(cfg)
        pts = np.random.RandomState(0).randn(1, cfg.point_num, 3).astype(np.float32)
        v = model.init(jax.random.PRNGKey(0), pts, train=False)
        fwd = jax.jit(lambda p: model.apply(v, p, train=False)["proposals_output"])
        a, b = np.asarray(fwd(pts)), np.asarray(fwd(pts))
        np.testing.assert_array_equal(a, b)


class TestProfiling:
    def test_trace_context(self, tmp_path):
        from votenet_tpu.utils.profiling import trace, device_timeit
        import jax.numpy as jnp

        with trace(str(tmp_path / "prof")):
            _ = jnp.ones((8, 8)) * 2
        import os

        assert os.path.isdir(tmp_path / "prof")

        dt = device_timeit(lambda: jnp.ones((16,)).sum(), iters=3, warmup=1)
        assert dt >= 0
