"""Learning-dynamics test: the full multi-head recipe must actually learn a
plantable signal to high accuracy — loss decrease alone is too weak."""

import numpy as np

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.parallel import MeshConfig
from m2mixer_tpu.training import Trainer

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 20
  epochs: 15
  optimizer: {{lr: 3e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0,
               scheduler_patience: 5}}
  seed: 0
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 32, synthetic: true,
            synthetic_learnable: true, synthetic_sizes: [256, 64, 64],
            shuffle_train: true}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 32]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 32, patch_size: 14,
             image_size: [28, 28], token_dim: 16, channel_dim: 64, num_mixers: 2}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 32, patch_size: 56,
             image_size: [112, 112], token_dim: 16, channel_dim: 64, num_mixers: 2}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 32, token_dim: 16, channel_dim: 64, num_mixers: 1}}
"""


def test_multihead_recipe_learns(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="converge", full_cfg=cfg,
                      mesh_config=MeshConfig(data=1, model=1))
    trainer.fit(task, dm)
    logs = trainer.test(task, dm, ckpt="best")
    # a planted position-coded signal must be learned near-perfectly
    assert trainer.callback_metrics["train_acc"] > 0.95, trainer.callback_metrics
    assert logs["test_acc"] > 0.9, logs
