"""End-to-end integration: train on synthetic scenes, evaluate mAP.

The reference's only end-to-end signal is real-data training with the
periodic Evaluator (SURVEY §4 point 5); this is the synthetic, CI-runnable
equivalent: overfit a tiny VoteNet on a handful of synthetic scenes and
check the whole loop (data -> train -> predict -> NMS -> AP) functions and
improves.
"""

import jax
import numpy as np
import pytest

from votenet_tpu.config import Config
from votenet_tpu.data.dataflow import batch_scenes
from votenet_tpu.data.synthetic import synthetic_gt_all, synthetic_scenes
from votenet_tpu.eval.evaluator import Evaluator, make_predict_fn
from votenet_tpu.models.votenet import VoteNet
from votenet_tpu.train.loop import Trainer, make_train_step
from votenet_tpu.train.state import create_train_state

pytestmark = pytest.mark.slow  # see pytest.ini; fast lane = -m 'not slow'


def tiny_config():
    from votenet_tpu.config import tiny_config as _tiny

    return _tiny(batch_size=4)


class TestEndToEnd:
    def test_train_and_evaluate(self, tmp_path):
        cfg = tiny_config()
        scenes = synthetic_scenes(0, cfg, 8)
        gt_all = synthetic_gt_all(scenes)
        model = VoteNet(cfg)
        state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=2)
        step = jax.jit(make_train_step(model, cfg), donate_argnums=0)

        batches = list(batch_scenes(iter(scenes), cfg.batch_size, cfg.max_gt_boxes))
        first_loss = last_loss = None
        for epoch in range(15):
            for batch in batches:
                state, metrics = step(state, batch)
                if first_loss is None:
                    first_loss = float(metrics["total_cost"])
                last_loss = float(metrics["total_cost"])
        assert np.isfinite(last_loss)
        assert last_loss < first_loss * 0.9, (first_loss, last_loss)

        predict = make_predict_fn(
            model, {"params": state.params, "batch_stats": state.batch_stats}, cfg
        )
        ev = Evaluator(cfg, gt_all, batch_size=cfg.batch_size)
        result = ev.evaluate(
            predict, [(int(s["data_idx"]), s["points"]) for s in scenes]
        )
        assert 0.0 <= result["mAP"] <= 1.0
        assert set(result["ap"]) <= set(
            ["bed", "table", "sofa", "chair", "toilet", "desk", "dresser",
             "night_stand", "bookshelf", "bathtub"]
        )

    def test_trainer_fit_with_checkpointing(self, tmp_path):
        cfg = tiny_config().replace(max_epoch=2, eval_every_k_epochs=10)
        scenes = synthetic_scenes(1, cfg, 4)
        model = VoteNet(cfg)
        state = create_train_state(jax.random.PRNGKey(0), cfg, steps_per_epoch=1)
        log_dir = str(tmp_path / "run")
        trainer = Trainer(model, cfg, state, log_dir=log_dir)
        trainer.fit(
            lambda: batch_scenes(iter(scenes), cfg.batch_size, cfg.max_gt_boxes),
            max_epoch=2,
        )
        from votenet_tpu.utils import checkpoint as ckpt

        assert ckpt.latest_checkpoint_step(log_dir) == 2
        # resume continues from epoch 2
        state2 = create_train_state(jax.random.PRNGKey(1), cfg, steps_per_epoch=1)
        trainer2 = Trainer(model, cfg, state2, log_dir=log_dir)
        assert trainer2.resume() == 2
        import os

        assert os.path.exists(os.path.join(log_dir, "stat.json"))
