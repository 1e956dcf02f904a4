"""Host control-flow semantics: early stopping, plateau LR, checkpoints."""

import numpy as np

from m2mixer_tpu.training.callbacks import (
    CheckpointManager,
    EarlyStopping,
    ReduceLROnPlateau,
)


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = EarlyStopping(patience=3)
        assert not es.update({"val_loss": 1.0})
        assert not es.update({"val_loss": 0.9})  # improves, wait resets
        assert not es.update({"val_loss": 0.95})
        assert not es.update({"val_loss": 0.95})
        assert es.update({"val_loss": 0.95})  # 3rd bad epoch -> stop
        assert es.should_stop

    def test_equal_value_counts_as_no_improvement(self):
        # Lightning min_delta=0: strictly-less required
        es = EarlyStopping(patience=1)
        es.update({"val_loss": 1.0})
        assert es.update({"val_loss": 1.0})

    def test_max_mode(self):
        es = EarlyStopping(monitor="val_acc", patience=1, mode="max")
        es.update({"val_acc": 0.5})
        assert not es.update({"val_acc": 0.6})
        assert es.update({"val_acc": 0.55})


class TestReduceLROnPlateau:
    def test_torch_semantics(self):
        # factor 0.1, rel threshold 1e-4, patience 2: reduce on the 3rd
        # consecutive non-improving epoch
        sched = ReduceLROnPlateau(1e-2, patience=2)
        assert sched.update(1.0) == 1e-2
        assert sched.update(1.0) == 1e-2  # bad 1
        assert sched.update(1.0) == 1e-2  # bad 2
        assert abs(sched.update(1.0) - 1e-3) < 1e-12  # bad 3 -> reduce
        # improvement resets the counter
        assert abs(sched.update(0.5) - 1e-3) < 1e-12
        assert abs(sched.update(0.49) - 1e-3) < 1e-12  # rel improvement

    def test_rel_threshold(self):
        sched = ReduceLROnPlateau(1e-2, patience=0)
        sched.update(1.0)
        # 0.99995 is NOT better than 1.0*(1-1e-4) -> counts as bad -> reduce
        assert abs(sched.update(0.99995) - 1e-3) < 1e-12


class TestCheckpointManager:
    def test_topk_and_last_retention(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), monitor="val_loss", mode="min",
                                top_k=2, save_last=True)
        state = {"params": {"w": np.zeros(2)}, "opt_state": None,
                 "epoch": np.int32(0), "global_step": np.int64(0)}
        vals = [1.0, 0.5, 0.8, 0.4, 0.9]
        import os

        for epoch, v in enumerate(vals):
            mgr.save(epoch, state, {"val_loss": v})
        kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("epoch_"))
        # top-2 by val_loss = epochs 3 (0.4), 1 (0.5); last = epoch 4
        assert set(kept) == {"epoch_1", "epoch_3", "epoch_4"}
        assert mgr.best_path().endswith("epoch_3")
        assert mgr.last_path().endswith("epoch_4")

    def test_max_mode_best(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), monitor="val_f1", mode="max",
                                top_k=1, save_last=False)
        state = {"params": {"w": np.zeros(2)}, "opt_state": None,
                 "epoch": np.int32(0), "global_step": np.int64(0)}
        for epoch, v in enumerate([0.3, 0.7, 0.5]):
            mgr.save(epoch, state, {"val_f1": v})
        assert mgr.best_path().endswith("epoch_1")


def test_watch_gradients_logs_grad_norm(tmp_path):
    """train.watch_gradients (wandb.watch analog, reference run.py:53)
    surfaces an epoch-mean global gradient norm in the metrics."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.datasets import get_data_module
    from m2mixer_tpu.models import get_model
    from m2mixer_tpu.training import Trainer

    cfg = loads(f"""
train:
  tensorboard_path: {tmp_path}/logs
  epochs: 1
  watch_gradients: true
  optimizer: {{lr: 1e-3}}
  seed: 0
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [32, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier, input_shape: [16, 8, 16]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
""")
    import numpy as np

    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="watch", full_cfg=cfg)
    trainer.fit(task, dm)
    assert "train_grad_norm" in trainer.callback_metrics
    assert np.isfinite(trainer.callback_metrics["train_grad_norm"])
    assert trainer.callback_metrics["train_grad_norm"] > 0
