"""End-to-end smoke: the flagship model trains on synthetic AV-MNIST data
(the integration test the reference never had — SURVEY.md §4)."""

import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  optimizer:
    lr: 1e-3
    betas: [0.9, 0.999]
    eps: 1e-8
    weight_decay: 0.0
    scheduler_patience: 2
  seed: 42
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [64, 32, 32]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.1
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 16], hidden_dims: [64, 32]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
"""


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = loads(CFG.format(tmp=tmp))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="e2e", full_cfg=cfg)
    trainer.fit(task, dm)
    return trainer, task, dm


def test_fit_produces_metrics(fitted):
    trainer, task, dm = fitted
    cm = trainer.callback_metrics
    assert "train_loss" in cm and np.isfinite(cm["train_loss"])
    assert "val_loss" in cm and np.isfinite(cm["val_loss"])
    assert "val_acc" in cm and 0.0 <= cm["val_acc"] <= 1.0
    assert "val_f1m" in cm
    # per-branch losses logged (parity: train_loss_image/audio/fusion)
    for k in ("train_loss_image", "train_loss_audio", "train_loss_fusion",
              "val_loss_fusion"):
        assert k in cm, k


def test_loss_sane(fitted):
    trainer, _, _ = fitted
    # fixed weighting scales the combined loss x3 -> random-init CE ~ 3*ln(10) ~ 6.9
    assert trainer.callback_metrics["train_loss"] < 3.5 * np.log(10)


def test_checkpoints_written_and_best_restores(fitted):
    trainer, task, dm = fitted
    best = trainer.checkpoints.best_path()
    assert best is not None
    logs = trainer.test(task, dm, ckpt="best")
    assert "test_acc" in logs
    import os

    assert os.path.exists(os.path.join(trainer.ckpt_dir, "test_preds.npz"))
    data = np.load(os.path.join(trainer.ckpt_dir, "test_preds.npz"))
    # reference dump keys (`models/avmnist.py:395-397`)
    for k in ("preds", "preds_image", "preds_audio", "labels",
              "image_logits", "audio_logits", "logits"):
        assert k in data
    assert data["preds"].shape[0] == 32


def test_deterministic_given_seed(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.train.epochs = 1
    results = []
    for _ in range(2):
        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        trainer = Trainer(cfg.train, name="det", full_cfg=cfg)
        trainer.fit(task, dm)
        results.append(trainer.callback_metrics["val_loss"])
    assert results[0] == results[1]
