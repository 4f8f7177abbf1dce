"""Tests for the high-level predictor API (tiny config)."""

import numpy as np
import pytest

from votenet_tpu.predictor import VoteNetPredictor
from tests.test_end2end import tiny_config


@pytest.fixture(scope="module")
def predictor():
    return VoteNetPredictor(config=tiny_config(), batch_size=2)


class TestPredictor:
    def test_detect_single_scene(self, predictor, rng):
        cfg = predictor.config
        dets = predictor.detect(rng.randn(cfg.point_num, 3).astype(np.float32))
        for classname, corners, score in dets:
            assert corners.shape == (8, 3)
            assert isinstance(classname, str)
            assert np.isfinite(score)

    def test_detect_batch_pads_and_unpads(self, predictor, rng):
        cfg = predictor.config
        scenes = [rng.randn(cfg.point_num, 3).astype(np.float32) for _ in range(3)]
        results = predictor.detect_batch(scenes)
        assert len(results) == 3  # not 4 (padding removed)

    def test_deterministic(self, predictor, rng):
        cfg = predictor.config
        pts = rng.randn(cfg.point_num, 3).astype(np.float32)
        a = predictor.detect(pts)
        b = predictor.detect(pts)
        assert len(a) == len(b)
        for (ca, ba, sa), (cb, bb, sb) in zip(a, b):
            assert ca == cb and sa == sb
            np.testing.assert_array_equal(ba, bb)

    def test_checkpoint_restore(self, tmp_path, rng):
        from votenet_tpu.train.state import create_train_state
        from votenet_tpu.utils import checkpoint as ckpt
        import jax

        cfg = tiny_config()
        state = create_train_state(jax.random.PRNGKey(3), cfg, 1)
        log_dir = str(tmp_path / "run")
        ckpt.save_checkpoint(log_dir, state, step=5)
        p = VoteNetPredictor(config=cfg, log_dir=log_dir, batch_size=1)
        assert p.restored_step == 5
